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

  /** MERGE semantics for a node set (reference transformers/users.py:12,
    * database/neo4j_queries.py:8-37: `MERGE (n:Label {key}) SET props`):
    * dedup by (label, key), last property write wins, plus an update count.
    * Same grouped-argmax shape as MergeOps.latestByKey — ONE shuffle with
    * map-side partial aggregation, no window sort — so a 100 TB node stream
    * reduces to |distinct nodes| rows before the exchange.
    * `ord` must end in a unique tie-breaker for determinism.
    */
  def mergeNodes(nodes: DataFrame, label: String, key: String, ord: Seq[String]): DataFrame = {
    val keys = Seq(label, key)
    val ordCols = ord.filterNot(keys.contains)
    val props = nodes.columns.toSeq.filterNot(keys.contains)
    val packed = struct((ordCols ++ props.filterNot(ordCols.contains)).map(col): _*)
    nodes
      .groupBy(col(label), col(key))
      .agg(max(packed).as("_latest"), count(lit(1)).as("n_updates"))
      .select(col(label) +: col(key) +: props.map(c => col(s"_latest.$c").as(c)) :+ col("n_updates"): _*)
  }

  /** Friend-of-follow recommendations — the canonical 2-hop query a FOLLOWS
    * graph serves: for each user, candidate accounts their followees follow,
    * minus themselves and accounts they already follow, ranked by how many
    * followees follow the candidate; top `k` per user.
    *
    * Plan shape at scale: the 2-hop fan-out is ONE self-join of the deduped
    * edge set shuffled on the middle vertex (dedup FIRST — fan-out over raw
    * multi-edges would square the duplication), the already-followed
    * exclusion is a shuffle-free-side anti join on (user, candidate), and
    * the per-user top-k goes through the `row_number <= k` WindowGroupLimit
    * rewrite (≤k rows per user cross the final exchange). Skewed celebrity
    * middle vertices are AQE's skew-join case; the degree cap a production
    * deployment would add (drop middles with degree > D) composes as one
    * pre-filter on [[degrees]].
    */
  def suggestFollows(edges: DataFrame, src: String, dst: String, k: Int): DataFrame = {
    // deduped edges feed three consumers (both self-join sides + the
    // anti-join exclusion): materialize once (the q51 rule)
    val e = edges
      .select(col(src).as("_s"), col(dst).as("_d"))
      .where(col("_d").isNotNull && col("_s") =!= col("_d"))
      .distinct()
      .localCheckpoint(true)
    val fof = e.select(col("_s").as("u"), col("_d").as("mid"))
      .join(e.select(col("_s").as("mid"), col("_d").as("cand")), "mid")
      .where(col("cand") =!= col("u"))
    val sugg = fof
      .join(e.select(col("_s").as("u"), col("_d").as("cand")), Seq("u", "cand"), "left_anti")
      .groupBy(col("u"), col("cand"))
      .agg(count(lit(1)).as("n_common"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("u")).orderBy(col("n_common").desc, col("cand").asc)
    sugg.withColumn("_rnk", row_number().over(w))
      .where(col("_rnk") <= k)
      .select(col("u"), col("cand"), col("n_common"), col("_rnk").cast("long").as("rnk"))
  }

  /** Reciprocal (mutual) edges: unordered pairs {a, b} with both a→b and
    * b→a present — the "mutual follows" query the reference's FOLLOWS graph
    * serves. Distinct edges first (MERGE semantics), then a self-join keyed
    * on the canonical (lo, hi) orientation: one shuffle each side, no
    * direction-flipped duplicate output rows.
    */
  /** Exact triangle census over the undirected simple graph: edge, wedge
    * and triangle counts in one pass structure.
    *
    * Orientation is THE scale lever: directing every edge from its
    * lower-(degree, id) endpoint to the higher bounds each node's out-list
    * by O(√|E|) (the arboricity argument), so the wedge self-join's
    * fan-out stays bounded no matter how skewed the hubs are — without it
    * a 10⁷-follower node contributes 10¹⁴ wedges and the job dies; with
    * it, at most arboricity² per node. Every triangle is counted exactly
    * once (its (deg, id)-minimum vertex owns both oriented edges), so the
    * closing join needs no de-dup pass.
    */
  def triangleCount(edges: DataFrame, src: String, dst: String): DataFrame = {
    // und feeds FOUR consumers (degrees, orientation, the closing join,
    // the edge count) and oriented feeds its own self-join: materialize
    // each ONCE (r8 — the plan audit found 28 parquet scans and zero
    // exchange reuse in the unmaterialized DAG: Catalyst re-evaluates the
    // scan+distinct per consumer, which at 100 TB is re-reading the edge
    // table four times)
    val und = edges
      .select(col(src).cast("long").as("s"), col(dst).cast("long").as("d"))
      .where(col("s") =!= col("d"))
      .select(least(col("s"), col("d")).as("u"), greatest(col("s"), col("d")).as("v"))
      .distinct()
      .localCheckpoint(true)
    val deg = und.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("dg"))
    val oriented = und
      .join(deg.select(col("n").as("u"), col("dg").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("dg").as("dv")), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("f"), col("v").as("t")))
          .otherwise(struct(col("v").as("f"), col("u").as("t"))).as("o"))
      .select(col("o.f").as("x"), col("o.t").as("y"))
      .localCheckpoint(true)
    val wedges = oriented
      .join(oriented.select(col("x"), col("y").as("z")), "x")
      .where(col("y") < col("z"))
    val triangles = wedges
      .join(und, col("y") === col("u") && col("z") === col("v"))
    und.agg(count(lit(1)).as("n_edges"))
      .crossJoin(wedges.agg(count(lit(1)).as("n_wedges")))
      .crossJoin(triangles.agg(count(lit(1)).as("n_triangles")))
  }

  /** Fixed-iteration PageRank in EXACT scaled-integer arithmetic:
    * rank'(v) = base + ⌊85·Σ_{u→v} ⌊rank(u)/outdeg(u)⌋ / 100⌋ with
    * base = ⌊⌊scale·15/100⌋/N⌋ — every operation is integer multiply /
    * floor-divide / sum, so the result is bit-identical across engines,
    * partitionings and retries (a double-weighted PageRank is none of
    * those: its per-node sums depend on reduction order). Dangling mass
    * is dropped (ranks need not sum to `scale`), the standard simplest
    * variant.
    *
    * Loop shape (round-8 restructure): the out-degree joins into the edge
    * set ONCE before the loop — per iteration only ranks ⋈ (es, ed,
    * outdeg) remains, then one grouped integer sum (map-side partials) and
    * the dangling-node left join. The edge set passes through an ADVISORY
    * `repartition(es)` (no explicit count — AQE sizes the width to data
    * VOLUME) before its checkpoint: the loop's parallelism is then
    * independent of the input layout (a one-row-group parquet file scans
    * as a single task, and without the exchange every iteration inherits
    * that single partition — the r7 bench regression), while small graphs
    * coalesce instead of paying a fixed 32-way overhead per round.
    */
  def pageRank(
      edges: DataFrame,
      src: String,
      dst: String,
      iters: Int = 5,
      scale: Long = 1000000000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    // checkpointDir selects RELIABLE checkpoints (survive executor loss
    // mid-loop — the 100 TB deployment contract; see IterCkpt)
    val ic = IterCkpt(edges, checkpointDir)
    val e = ic(edges
      .select(col(src).cast("long").as("es"), col(dst).cast("long").as("ed"))
      .where(col("es") =!= col("ed")).distinct())
    val nodes = ic(e.select(col("es").as("node"))
      .union(e.select(col("ed"))).distinct())
    val n = nodes.count()
    val base = (scale * 15L / 100L) / n
    // the degree aggregation runs ONCE here; the loop never touches it
    val outdeg = e.groupBy(col("es")).agg(count(lit(1)).as("outdeg"))
    val e2 = ic(e.join(outdeg, "es").repartition(col("es")))
    ic.release(e)
    // Iteration materialization (r18): a FIXED iteration count needs no
    // per-iteration lineage cut — the unrolled 5-iteration plan is linear
    // in `iters` (join + agg per round), and composing it into ONE
    // execution lets ReuseExchange ship the edge set's exchange ONCE
    // (the per-iteration localCheckpoint made every round a separate job
    // that re-shuffled the checkpointed e2 blocks: 5 edge shuffles + 5
    // job barriers for 5 iterations — isolated same-session A/B at
    // sf0.1: 2.08 s → 1.77 s min-of-3; at cluster scale the edge
    // exchange is the whole bill). RELIABLE mode keeps the per-iteration
    // checkpoint: its
    // contract is surviving executor loss mid-loop, which a single long
    // lineage forfeits. Results are identical either way — every step is
    // exact integer arithmetic with no data-dependent control flow.
    val perIterCkpt = checkpointDir.isDefined
    var ranks = nodes.withColumn("rank", lit(scale / n))
    for (_ <- 1 to iters) {
      val sums = ranks.join(e2, col("node") === col("es"))
        .select(col("ed"), expr("rank div outdeg").as("c"))
        .groupBy(col("ed").as("node")).agg(sum(col("c")).as("cs"))
      val next = nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("(85 * coalesce(cs, CAST(0 AS BIGINT))) div 100")).as("rank"))
      ranks = if (perIterCkpt) ic(next) else next
    }
    ranks.select(col("node").as("node_id"), col("rank").as("rank_scaled"))
  }

  def mutualEdges(edges: DataFrame, src: String, dst: String): DataFrame = {
    // two consumers, but they filter DISJOINT halves (s<d vs s>d): a
    // materialization would write the whole set only to read it once per
    // half — the double evaluation costs the same and keeps the kernel
    // scan visible to pushdown (unlike q51's four-consumer DAG, where
    // the checkpoint is a clear win)
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
    // ONE scan of the edge table (the union-of-two-groupBys form reads the
    // fact twice — at 100 TB the second scan is the whole bill): dedup the
    // edge pairs once, then both degree directions are plain counts over the
    // unique pairs. Shuffle profile: exchange 1 carries map-side-deduped
    // pairs (what either count_distinct branch alone would ship), exchange 2
    // only per-(role,node) partial counts.
    val pairs = edges
      .select(col(src).cast("long").as("a"), col(dst).cast("long").as("b"))
      .distinct()
    pairs
      .select(explode(array(
        struct(lit("src").as("role"), col("a").as("node_id")),
        struct(lit("dst").as("role"), col("b").as("node_id")))).as("e"))
      .select(col("e.role").as("role"), col("e.node_id").as("node_id"))
      .groupBy(col("role"), col("node_id"))
      .agg(count(lit(1)).as("degree"))
  }

  /** Multi-source BFS depths along edge direction: the distance layer a
    * feed/recommendation surface ranks by ("how many hops from the seed
    * accounts"). Frontier expansion — each iteration is one join + one
    * distinct + one anti-join, all keyed on the node id, and only the
    * FRONTIER (nodes first reached this round) drives the next join, so
    * per-iteration work is proportional to the layer, not the graph.
    * Iterations = reached diameter, bounded by `maxDepth`; lineage cut per
    * round (the d06 rule). Depths are exact integers and BFS layering is a
    * pure function of the edge SET — partition- and retry-independent, so
    * the output hash-matches a recursive-CTE min-depth oracle.
    */
  def bfsDepths(
      edges: DataFrame,
      src: String,
      dst: String,
      seeds: DataFrame,
      maxDepth: Int = 6,
      checkpointDir: Option[String] = None): DataFrame = {
    // the edge set passes through an advisory repartition(es) (the
    // pageRank rule): loop parallelism independent of the input layout,
    // AQE sizes the width to the graph's actual volume. checkpointDir
    // selects RELIABLE checkpoints (survive executor loss — IterCkpt).
    val ic = IterCkpt(edges, checkpointDir)
    val e = ic(edges
      .select(col(src).cast("long").as("es"), col(dst).cast("long").as("ed"))
      .where(col("es") =!= col("ed")).distinct()
      .repartition(col("es")))
    var depths = ic(seeds.select(col(seeds.columns.head).cast("long").as("node"))
      .distinct().withColumn("depth", lit(0L)))
    var frontier = depths
    var d = 1
    var done = false
    while (d <= maxDepth && !done) {
      val next = ic(frontier.join(e, col("node") === col("es"))
        .select(col("ed").as("node")).distinct()
        .join(depths, Seq("node"), "left_anti")
        .withColumn("depth", lit(d.toLong)))
      if (next.isEmpty) done = true
      else {
        val grown = ic(depths.union(next))
        // once `next` and `grown` are eagerly materialized, BOTH superseded
        // frames are dead: the old cumulative depths AND the frontier that
        // drove this round's join. (Round 1's frontier IS the initial depths
        // frame — the second release is a no-op on an already-dropped RDD.)
        ic.release(depths)
        if (frontier ne depths) ic.release(frontier)
        depths = grown
        frontier = next
      }
      d += 1
    }
    depths.select(col("node").as("node_id"), col("depth"))
  }
}
