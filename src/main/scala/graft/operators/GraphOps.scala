package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph re-shaping operators.
  *
  * The reference's Neo4j backend turns rows into node/edge MERGE operations
  * (transformers/follows.py, transformers/verifications.py,
  * database/neo4j_queries.py): MERGE dedups nodes by key and edges by
  * (src, dst, type), last property write wins. In Spark the property graph
  * is just two DataFrames (nodes, edges); MERGE is latest-wins dedup — one
  * shuffle each — and the graph queries the reference's schemas serve
  * (follow_counts) are degree aggregations.
  */
object GraphOps {

  /** MERGE semantics for an edge set: dedup by (src, dst), keep the latest
    * properties and an occurrence count (single shuffle, partial agg).
    */
  def mergeEdges(edges: DataFrame, src: String, dst: String, ord: String): DataFrame =
    edges
      .groupBy(col(src), col(dst))
      .agg(
        max(col(ord)).as(s"last_$ord"),
        count(lit(1)).as("n_events"))

  /** Reciprocal (mutual) edges: unordered pairs {a, b} with both a→b and
    * b→a present — the "mutual follows" query the reference's FOLLOWS graph
    * serves. Distinct edges first (MERGE semantics), then a self-join keyed
    * on the canonical (lo, hi) orientation: one shuffle each side, no
    * direction-flipped duplicate output rows.
    */
  def mutualEdges(edges: DataFrame, src: String, dst: String): DataFrame = {
    val e = edges
      .select(col(src).cast("long").as("s"), col(dst).cast("long").as("d"))
      .where(col("s") =!= col("d")).distinct()
    val fwd = e.where(col("s") < col("d")).select(col("s").as("a"), col("d").as("b"))
    val rev = e.where(col("s") > col("d")).select(col("d").as("a"), col("s").as("b"))
    fwd.join(rev, Seq("a", "b")).select(col("a"), col("b"))
  }

  /** Degree table for a bipartite edge set: out-degree per src node and
    * in-degree per dst node, unioned with a role tag — the Spark analog of
    * the reference's `follow_counts` table (schema/015).
    * Uses distinct-edge counting, mirroring MERGE-then-count.
    */
  def degrees(edges: DataFrame, src: String, dst: String): DataFrame = {
    val out = edges
      .groupBy(col(src).cast("long").as("node_id"))
      .agg(count_distinct(col(dst)).as("degree"))
      .withColumn("role", lit("src"))
    val in = edges
      .groupBy(col(dst).cast("long").as("node_id"))
      .agg(count_distinct(col(src)).as("degree"))
      .withColumn("role", lit("dst"))
    out.unionByName(in).select(col("role"), col("node_id"), col("degree"))
  }
}
