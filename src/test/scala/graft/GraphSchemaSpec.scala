package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.GraphSchema
import graft.sinks.GraphSchema.{EdgeSpec, NodeSpec}

/** Cypher DDL generation for the graph sink's schema bootstrap, checked
  * against the reference's constraint set shape (neo4j_schema.py:65-140).
  */
class GraphSchemaSpec extends AnyFunSuite {

  test("node DDL: uniqueness constraint plus secondary indexes") {
    val ddl = GraphSchema.nodeDdl(NodeSpec("User", Seq("fid"), Seq("username", "updated_at")))
    assert(ddl == Seq(
      "CREATE CONSTRAINT user_fid_unique IF NOT EXISTS FOR (n:User) REQUIRE n.fid IS UNIQUE",
      "CREATE INDEX user_username_index IF NOT EXISTS FOR (n:User) ON (n.username)",
      "CREATE INDEX user_updated_at_index IF NOT EXISTS FOR (n:User) ON (n.updated_at)"))
  }

  test("composite keys use the parenthesized REQUIRE form") {
    val ddl = GraphSchema.nodeDdl(GraphSchema.ImportTracking)
    assert(ddl == Seq(
      "CREATE CONSTRAINT importtracking_table_name_file_name_unique IF NOT EXISTS " +
        "FOR (n:ImportTracking) REQUIRE (n.table_name, n.file_name) IS UNIQUE"))
  }

  test("relationship indexes use the undirected ()-[r:TYPE]-() form") {
    val ddl = GraphSchema.edgeDdl(EdgeSpec("FOLLOWS", Seq("timestamp")))
    assert(ddl == Seq(
      "CREATE INDEX follows_timestamp_index IF NOT EXISTS FOR ()-[r:FOLLOWS]-() ON (r.timestamp)"))
  }

  test("default bootstrap covers the reference's full constraint set, tracking first") {
    val ddl = GraphSchema.bootstrapDdl(GraphSchema.DefaultNodes, GraphSchema.DefaultEdges)
    // every statement idempotent
    assert(ddl.forall(_.contains("IF NOT EXISTS")))
    // the reference's set: tracking constraint, User/Address uniqueness +
    // 2 indexes each, FOLLOWS/VERIFIED_ADDRESS 2 rel indexes each
    assert(ddl.size == 1 + (1 + 2) + (1 + 2) + 2 + 2)
    assert(ddl.head.contains("ImportTracking"))
    assert(ddl.count(_.startsWith("CREATE CONSTRAINT")) == 3)
    assert(ddl.count(_.startsWith("CREATE INDEX")) == 8)
    assert(ddl.exists(_.contains("REQUIRE n.address IS UNIQUE")))
    assert(ddl.exists(_.contains("()-[r:VERIFIED_ADDRESS]-() ON (r.verification_timestamp)")))
  }

  test("unsafe identifiers are rejected, not interpolated") {
    intercept[IllegalArgumentException] {
      GraphSchema.nodeDdl(NodeSpec("User`) DETACH DELETE", Seq("fid")))
    }
    intercept[IllegalArgumentException] {
      GraphSchema.edgeDdl(EdgeSpec("FOLLOWS", Seq("ts) ON (r.x")))
    }
  }
}
