package graft.sinks

/** Graph-sink schema bootstrap (reference `database/neo4j_schema.py`).
  *
  * Before the first MERGE lands, the reference creates uniqueness
  * constraints and property indexes so MERGE-by-key is an index lookup
  * instead of a label scan (`neo4j_schema.py:65-140`): a uniqueness
  * constraint per node label's key, secondary property indexes for the
  * common query patterns, and relationship property indexes. All DDL is
  * `IF NOT EXISTS` so bootstrap is idempotent — the reference additionally
  * swallows "equivalent constraint already exists" errors; with
  * `IF NOT EXISTS` the statement itself is the no-op.
  *
  * This object only GENERATES the Cypher (no Neo4j driver exists in this
  * container); the statements are unit-tested against the reference's
  * constraint set shape the same way `JdbcUpsertSink.upsertSql` is.
  */
object GraphSchema {

  /** One node label: unique key (possibly composite) + secondary indexes. */
  final case class NodeSpec(
      label: String,
      keyProps: Seq[String],
      indexProps: Seq[String] = Nil) {
    require(keyProps.nonEmpty, s"node label $label needs at least one key property")
  }

  /** One relationship type: property indexes (edges have no uniqueness DDL
    * in Neo4j — MERGE on (src)-[r:TYPE]->(dst) dedups structurally).
    */
  final case class EdgeSpec(relType: String, indexProps: Seq[String] = Nil)

  // valid UNQUOTED Cypher identifier: ASCII letter/underscore head, then
  // ASCII alphanumerics — `isLetterOrDigit` alone admits digit-leading and
  // non-ASCII names that fail at the database instead of at generation time
  private val IdentRe = "^[A-Za-z_][A-Za-z0-9_]*$".r

  private def ident(s: String): String = {
    require(IdentRe.matches(s), s"unsafe graph identifier: $s")
    s
  }

  // constraint/index names go through the same gate as labels/properties
  private def nameOf(parts: Seq[String]): String =
    ident(parts.map(_.toLowerCase).mkString("_"))

  /** Uniqueness constraint + secondary indexes for one node label. */
  def nodeDdl(n: NodeSpec): Seq[String] = {
    val label = ident(n.label)
    val keyRef =
      if (n.keyProps.size == 1) s"n.${ident(n.keyProps.head)}"
      else n.keyProps.map(p => s"n.${ident(p)}").mkString("(", ", ", ")")
    val constraint =
      s"CREATE CONSTRAINT ${nameOf(n.label +: n.keyProps :+ "unique")} IF NOT EXISTS " +
        s"FOR (n:$label) REQUIRE $keyRef IS UNIQUE"
    val indexes = n.indexProps.map { p =>
      s"CREATE INDEX ${nameOf(Seq(n.label, p, "index"))} IF NOT EXISTS " +
        s"FOR (n:$label) ON (n.${ident(p)})"
    }
    constraint +: indexes
  }

  /** Relationship property indexes for one edge type. */
  def edgeDdl(e: EdgeSpec): Seq[String] = {
    val t = ident(e.relType)
    e.indexProps.map { p =>
      s"CREATE INDEX ${nameOf(Seq(e.relType, p, "index"))} IF NOT EXISTS " +
        s"FOR ()-[r:$t]-() ON (r.${ident(p)})"
    }
  }

  /** The full bootstrap script: import-tracking first (the reference always
    * creates it — `neo4j_schema.py:63-70`), then nodes, then relationships.
    */
  def bootstrapDdl(nodes: Seq[NodeSpec], edges: Seq[EdgeSpec]): Seq[String] =
    nodeDdl(ImportTracking) ++ nodes.flatMap(nodeDdl) ++ edges.flatMap(edgeDdl)

  /** Import-progress tracking node — composite uniqueness, the reference's
    * `(t.table_name, t.file_name) IS UNIQUE` (`neo4j_schema.py:66`).
    */
  val ImportTracking: NodeSpec =
    NodeSpec("ImportTracking", Seq("table_name", "file_name"))

  /** The default graph model GraphOps' merge-ready frames land into —
    * the reference's User/Address nodes and FOLLOWS edges
    * (`neo4j_schema.py:82-140`), keyed and indexed the same way.
    */
  val DefaultNodes: Seq[NodeSpec] = Seq(
    NodeSpec("User", Seq("fid"), Seq("username", "updated_at")),
    NodeSpec("Address", Seq("address"), Seq("chain", "updated_at")))

  val DefaultEdges: Seq[EdgeSpec] = Seq(
    EdgeSpec("FOLLOWS", Seq("timestamp", "updated_at")),
    EdgeSpec("VERIFIED_ADDRESS", Seq("verification_timestamp", "updated_at")))
}
