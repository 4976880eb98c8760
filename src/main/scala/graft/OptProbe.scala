package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{BandLsh, Dedup}

/** R18 optimization instrument: decompose the heavy operators' wall time
  * into their pipeline stages (guide §1 — measure first, isolate with the
  * noop sink). Each stage is timed as min over `passes` noop-sink runs at
  * `SPARK_GRAFT_SF_DIR`, after one untimed warmup, in one JVM — the same
  * methodology as Bench, restricted to sub-plans.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.OptProbe d07"
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.prep(spark)
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "3").toInt

    def time(name: String)(mk: => DataFrame): Unit = {
      // construction is INSIDE the timed region (Bench's methodology):
      // eager-checkpoint operators (pageRank, connectedComponents) do
      // their work while the plan is being built
      mk.write.format("noop").mode("overwrite").save() // warmup (codegen/JIT)
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-40s min=${ts.min}%.3f med=${ts.sorted.apply(ts.length / 2)}%.3f")
    }

    val which = if (args.isEmpty) "d07" else args(0)
    which match {
      case "d07" =>
        val emb = Tables.embeddings(spark, sfDir)
        // stage 1: signature scan alone (no barrier)
        time("sigs") {
          emb.select(col("vec_id").as("id"),
            graft.operators.Similarity.hyperplaneSig(col("embedding"), 64, 64).as("sig"))
        }
        // stage 2: banded (sig + barrier + explode)
        time("banded(barrier)") {
          BandLsh.banded(emb, "vec_id", "embedding", "id", "_sig", 64, 2, 32, barrier = true)
        }
        // stage 3: candidate pairs (band self-join + first-band filter)
        time("candidates") {
          Dedup.hyperplaneCandidates(emb, "vec_id", "embedding", 64, 2, 32)
        }
        // stage 4: full d07 (candidates + exact cosine re-rank)
        time("full d07") {
          Dedup.embeddingNearDupBucketed(emb, "vec_id", "embedding", minCosine = 0.35, dim = 64)
        }
        // stage 5: d06 = d07 + connected components
        time("full d06") {
          val pairs = Dedup.embeddingNearDupBucketed(emb, "vec_id", "embedding", minCosine = 0.35, dim = 64)
          Dedup.connectedComponents(pairs, "a", "b")
        }
      case "q52" =>
        time("q52 pagerank") {
          SparkEntry.queries("q52_pagerank")(spark, sfDir)
        }
      case "sum128" =>
        val base = spark.range(0, 10000000).select(
          (col("id") % 32).as("g"), (col("id") * 3 - 5000000L).as("x"))
          .localCheckpoint(true)
        time("sum(long)") { base.groupBy(col("g")).agg(sum(col("x"))) }
        time("sum(decimal38)") { base.groupBy(col("g")).agg(sum(col("x").cast("decimal(38,0)"))) }
        time("sum128") {
          base.groupBy(col("g")).agg(
            org.apache.spark.sql.graft.ColumnBridge.column(
              graft.expressions.Sum128(
                org.apache.spark.sql.graft.ColumnBridge.expression(col("x")))
                .toAggregateExpression()))
        }
      case "sum128b" =>
        // q74-shaped child: double round + cast arithmetic per row
        val base = spark.range(0, 10000000).select(
          (col("id") % 32).as("g"),
          (col("id") % 1000).cast("double").divide(7.0).as("p"),
          (col("id") % 97).cast("double").divide(100.0).as("d"))
          .localCheckpoint(true)
        val term = (round(col("p") * 100).cast("long")) * (lit(100L) - round(col("d") * 100).cast("long"))
        time("sum(decimal38) q74-term") { base.groupBy(col("g")).agg(sum(term.cast("decimal(38,0)"))) }
        time("sum128 q74-term") {
          base.groupBy(col("g")).agg(
            org.apache.spark.sql.graft.ColumnBridge.column(
              graft.expressions.Sum128(
                org.apache.spark.sql.graft.ColumnBridge.expression(term.cast("long")))
                .toAggregateExpression()))
        }
      case "sum128ab" =>
        // INTERLEAVED single-JVM A/B on the real q74 shape (brandVolume
        // wide): Sum128 vs sum(cast decimal(38,0)), alternating time()
        // blocks so a climate window can't poison one variant's every
        // sample. Child term and join are identical; only the aggregate
        // buffer differs.
        val li = Tables.lineitem(spark, sfDir)
        val p = Tables.part(spark, sfDir)
        def c2l(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")
        val disc = c2l(col("l_extendedprice")) * (lit(100L) - c2l(col("l_discount")))
        def q74(wideSum: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
          li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
            .groupBy(col("p_brand"))
            .agg(wideSum(c2l(col("l_quantity"))).as("sq"),
              wideSum(disc).as("rev"), count(lit(1)).as("n"))
        def s128(c: org.apache.spark.sql.Column) =
          org.apache.spark.sql.graft.ColumnBridge.column(
            graft.expressions.Sum128(
              org.apache.spark.sql.graft.ColumnBridge.expression(c.cast("long")))
              .toAggregateExpression())
        def sdec(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,0)"))
        for (r <- 1 to 3) {
          time(s"q74-shape decimal38 (round $r)") { q74(sdec) }
          time(s"q74-shape sum128   (round $r)") { q74(s128) }
        }
        // post-execution codegen-span check: count WholeStageCodegen
        // markers in the FINAL adaptive plan of each variant
        // .collect() executes THIS df's QueryExecution (a noop write runs
        // a separate copy and leaves df.queryExecution un-finalized), so
        // the adaptive final plan's *(n) codegen spans are inspectable
        for ((nm, df) <- Seq("decimal38" -> q74(sdec), "sum128" -> q74(s128))) {
          df.collect()
          val s = df.queryExecution.executedPlan.toString
          val spans = "\\*\\(\\d+\\)".r.findAllIn(s).toSet.size
          println(s"[probe] q74-shape $nm codegen spans=$spans")
          if (args.length > 1 && args(1) == "plan") println(s)
        }
      case "sum128c" =>
        // separate plan-construction cost from execution: build each
        // variant's DataFrame ONCE, then alternate executions pass by pass.
        // SPARK_GRAFT_TWOLEVEL=0 disables the generated two-level fast
        // hash map (the attribution knob for the sum128 A/B).
        sys.env.get("SPARK_GRAFT_TWOLEVEL").foreach { v =>
          spark.conf.set("spark.sql.codegen.aggregate.map.twolevel.enabled",
            (v != "0").toString)
          println(s"[probe] twolevel fast map enabled=${v != "0"}")
        }
        val li = Tables.lineitem(spark, sfDir)
        val p = Tables.part(spark, sfDir)
        def c2l(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")
        val disc = c2l(col("l_extendedprice")) * (lit(100L) - c2l(col("l_discount")))
        def q74(wideSum: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
          li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
            .groupBy(col("p_brand"))
            .agg(wideSum(c2l(col("l_quantity"))).as("sq"),
              wideSum(disc).as("rev"), count(lit(1)).as("n"))
        def s128(c: org.apache.spark.sql.Column) =
          org.apache.spark.sql.graft.ColumnBridge.column(
            graft.expressions.Sum128(
              org.apache.spark.sql.graft.ColumnBridge.expression(c.cast("long")))
              .toAggregateExpression())
        def sdec(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,0)"))
        val dfDec = q74(sdec)
        val dfS = q74(s128)
        dfDec.write.format("noop").mode("overwrite").save() // warmups
        dfS.write.format("noop").mode("overwrite").save()
        for (r <- 1 to 6) {
          for ((nm, df) <- Seq("decimal38" -> dfDec, "sum128  " -> dfS)) {
            val t0 = System.nanoTime()
            df.write.format("noop").mode("overwrite").save()
            println(f"[probe] exec-only $nm pass$r ${(System.nanoTime() - t0) / 1e9}%.3f")
          }
        }
      case "sum128d" =>
        // isolate the stage: aggregate straight off the parquet scan (no
        // join) — does the gap follow the scan+agg stage or the join?
        val li = Tables.lineitem(spark, sfDir)
        def c2l(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")
        val disc = c2l(col("l_extendedprice")) * (lit(100L) - c2l(col("l_discount")))
        def aggOnly(wideSum: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
          li.groupBy(col("l_returnflag"))
            .agg(wideSum(c2l(col("l_quantity"))).as("sq"),
              wideSum(disc).as("rev"), count(lit(1)).as("n"))
        def s128(c: org.apache.spark.sql.Column) =
          org.apache.spark.sql.graft.ColumnBridge.column(
            graft.expressions.Sum128(
              org.apache.spark.sql.graft.ColumnBridge.expression(c.cast("long")))
              .toAggregateExpression())
        def sdec(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,0)"))
        val dfDec = aggOnly(sdec)
        val dfS = aggOnly(s128)
        dfDec.write.format("noop").mode("overwrite").save()
        dfS.write.format("noop").mode("overwrite").save()
        for (r <- 1 to 6) {
          for ((nm, df) <- Seq("decimal38" -> dfDec, "sum128  " -> dfS)) {
            val t0 = System.nanoTime()
            df.write.format("noop").mode("overwrite").save()
            println(f"[probe] scanagg $nm pass$r ${(System.nanoTime() - t0) / 1e9}%.3f")
          }
        }
      case "sum128e" =>
        // the fix candidate: PRE-PROJECT the money term so the aggregate
        // child is a bare long attribute — Sum128's multi-slot update
        // re-expands its child per slot and per codegen path, so an
        // expensive child (the round()/BigDecimal chain) is what actually
        // regressed; with an attribute child the re-reads are free.
        val li = Tables.lineitem(spark, sfDir)
        def c2l(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")
        val disc = c2l(col("l_extendedprice")) * (lit(100L) - c2l(col("l_discount")))
        def s128(c: org.apache.spark.sql.Column) =
          org.apache.spark.sql.graft.ColumnBridge.column(
            graft.expressions.Sum128(
              org.apache.spark.sql.graft.ColumnBridge.expression(c.cast("long")))
              .toAggregateExpression())
        def sdec(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,0)"))
        def preproj(wideSum: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
          li.select(col("l_returnflag"), c2l(col("l_quantity")).as("_t1"), disc.as("_t2"))
            .groupBy(col("l_returnflag"))
            .agg(wideSum(col("_t1")).as("sq"), wideSum(col("_t2")).as("rev"),
              count(lit(1)).as("n"))
        val dfDec = preproj(sdec)
        val dfS = preproj(s128)
        dfDec.write.format("noop").mode("overwrite").save()
        dfS.write.format("noop").mode("overwrite").save()
        for (r <- 1 to 6) {
          for ((nm, df) <- Seq("decimal38" -> dfDec, "sum128  " -> dfS)) {
            val t0 = System.nanoTime()
            df.write.format("noop").mode("overwrite").save()
            println(f"[probe] preproj $nm pass$r ${(System.nanoTime() - t0) / 1e9}%.3f")
          }
        }
      case "mround" =>
        // single-JVM interleaved A/B: the q12 money-scan shape with the
        // builtin round(x*100).cast(long) vs the guarded MoneyRound kernel
        val li = Tables.lineitem(spark, sfDir)
        def shape(c2v: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
          li.where(to_date(col("l_shipdate")) <= lit("1998-09-02"))
            .groupBy(col("l_returnflag"), col("l_linestatus"))
            .agg(sum(c2v(col("l_quantity"))).as("sq"),
              sum(c2v(col("l_extendedprice"))).as("sp"),
              sum(c2v(col("l_extendedprice")) * (lit(100L) - c2v(col("l_discount")))).as("sd"),
              count(lit(1)).as("n"))
        val dfOld = shape(c => round(c * lit(100)).cast("long"))
        val dfNew = shape(c => graft.expressions.MoneyRound.scaledLong(c, 100))
        dfOld.write.format("noop").mode("overwrite").save()
        dfNew.write.format("noop").mode("overwrite").save()
        for (r <- 1 to 6) {
          for ((nm, df) <- Seq("builtin-round" -> dfOld, "moneyround   " -> dfNew)) {
            val t0 = System.nanoTime()
            df.write.format("noop").mode("overwrite").save()
            println(f"[probe] q12-shape $nm pass$r ${(System.nanoTime() - t0) / 1e9}%.3f")
          }
        }
      case "cgq74" =>
        // generated-method sizes of the real q74 partial-agg stage, AQE
        // off so debugCodegen sees the compiled subtrees directly
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val li = Tables.lineitem(spark, sfDir)
        val p = Tables.part(spark, sfDir)
        def c2l(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")
        val disc = c2l(col("l_extendedprice")) * (lit(100L) - c2l(col("l_discount")))
        def q74(wideSum: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
          li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
            .groupBy(col("p_brand"))
            .agg(wideSum(c2l(col("l_quantity"))).as("sq"),
              wideSum(disc).as("rev"), count(lit(1)).as("n"))
        def s128(c: org.apache.spark.sql.Column) =
          org.apache.spark.sql.graft.ColumnBridge.column(
            graft.expressions.Sum128(
              org.apache.spark.sql.graft.ColumnBridge.expression(c.cast("long")))
              .toAggregateExpression())
        def sdec(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,0)"))
        println("=== q74 sum128 ===")
        org.apache.spark.sql.execution.debug.DebugQuery(q74(s128)).debugCodegen()
        println("=== q74 decimal ===")
        org.apache.spark.sql.execution.debug.DebugQuery(q74(sdec)).debugCodegen()
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      case "cgmini" =>
        val base = spark.range(0, 1000).select((col("id") % 8).as("g"), col("id").as("x"))
        val s128 = base.groupBy(col("g")).agg(
          org.apache.spark.sql.graft.ColumnBridge.column(
            graft.expressions.Sum128(
              org.apache.spark.sql.graft.ColumnBridge.expression(col("x")))
              .toAggregateExpression()))
        s128.write.format("noop").mode("overwrite").save()
        println("=== sum128 mini ===")
        org.apache.spark.sql.execution.debug.DebugQuery(s128).debugCodegen()
        val sdec = base.groupBy(col("g")).agg(sum(col("x").cast("decimal(38,0)")))
        sdec.write.format("noop").mode("overwrite").save()
        println("=== decimal mini ===")
        org.apache.spark.sql.execution.debug.DebugQuery(sdec).debugCodegen()
      case "cc" =>
        // paired vs sequential connected components, interleaved in one
        // JVM: (a) the bench corpus (d07 pairs — shallow near-dup
        // cliques), (b) a deep chain (worst-case diameter: pointer
        // jumping needs O(log n) rounds, where halving the barriers
        // actually compounds). Both variants see the SAME checkpointed
        // pair input.
        val emb = Tables.embeddings(spark, sfDir)
        val d07pairs = Dedup.embeddingNearDupBucketed(
          emb, "vec_id", "embedding", minCosine = 0.35, dim = 64)
          .localCheckpoint(true)
        for (r <- 1 to 3) {
          time(s"cc d07pairs seq    (round $r)") {
            Dedup.connectedComponentsSeq(d07pairs, "a", "b")
          }
          time(s"cc d07pairs paired (round $r)") {
            Dedup.connectedComponents(d07pairs, "a", "b")
          }
        }
      case "ccchain" =>
        // deep-diameter corpus alone (arg 2 = chain length, default 50k):
        // pointer jumping needs ~log2(n) materialized rounds here, the
        // regime where halving the barriers compounds. maxIter raised so
        // the loop actually converges rather than hitting the cut.
        val chainN = if (args.length > 1) args(1).toLong else 50000L
        val chain = spark.range(0, chainN - 1)
          .select(col("id").as("a"), (col("id") + 1L).as("b"))
          .localCheckpoint(true)
        for (r <- 1 to 2) {
          time(s"cc chain($chainN) seq    (round $r)") {
            Dedup.connectedComponentsSeq(chain, "a", "b", maxIter = 64)
          }
          time(s"cc chain($chainN) paired (round $r)") {
            Dedup.connectedComponents(chain, "a", "b", maxIter = 64)
          }
        }
      case "ccplan" =>
        // executed plan of ONE propagation round's materialized job (the
        // per-iteration exchange count the static d06 dump can't show):
        // rebuild the first hop's plan sans checkpoint and collect() it
        val emb = Tables.embeddings(spark, sfDir)
        val pairs = Dedup.embeddingNearDupBucketed(
          emb, "vec_id", "embedding", minCosine = 0.35, dim = 64)
        val p = pairs.select(col("a").cast("long").as("u"), col("b").cast("long").as("v"))
          .localCheckpoint(true)
        val sym = p
          .union(p.select(col("v").as("u"), col("u").as("v")))
          .union(p.select(col("u"), col("u").as("v")))
          .union(p.select(col("v").as("u"), col("v")))
          .distinct()
          .repartition(col("v"))
          .localCheckpoint(true)
        val labels = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
          .select(col("u").as("node"), col("mn").as("label"))
          .localCheckpoint(true)
        val propagated = sym
          .join(labels.withColumnRenamed("node", "v").withColumnRenamed("label", "vlab"), Seq("v"))
          .groupBy(col("u").as("node"))
          .agg(min(col("vlab")).as("label"),
            max(when(col("v") === col("u"), col("vlab"))).as("prev"))
          .localCheckpoint(false)
        val next = propagated
          .join(propagated.select(col("node").as("label"), col("label").as("ll")),
            Seq("label"), "left")
          .select(col("node"), coalesce(col("ll"), col("label")).as("label"),
            (coalesce(col("ll"), col("label")) =!= col("prev")).as("changed"))
        next.collect()
        println(next.queryExecution.executedPlan.toString)
      case "cospre" =>
        // interleaved single-JVM A/B: the SemDeDup prune's cell-local
        // left-semi with the fused cosineFF kernel (3 accumulators/pair)
        // vs precomputed norms + dot (1 loop/pair). One synthetic cell
        // layout over the real embeddings, eps = 2.0 = keep-dominated
        // (every vector probes its whole cell — the 100 TB curation
        // regime BENCH_D15_SPLIT measured at 700 s prune walls).
        // replicate the real vectors so the pair volume is compute-bound,
        // not job-overhead-bound (rep=32, cells=8 → 64k vectors, 8k/cell,
        // ~256M probe pairs — the keep-dominated cell-local shape)
        val rep = if (args.length > 2) args(2).toInt else 32
        val emb0 = Tables.embeddings(spark, sfDir)
        val emb = emb0.crossJoin(spark.range(0, rep).select(col("id").as("_r")))
          .select((col("vec_id") * rep + col("_r")).as("vec_id"), col("embedding"))
        val cells = if (args.length > 1) args(1).toInt else 8
        val eps = 2.0
        val assignOld = emb.select(col("vec_id"), col("embedding").as("v"),
            pmod(col("vec_id"), lit(cells)).as("cell"))
          .repartition(32)
          .localCheckpoint(true)
        val assignNew = emb.select(col("vec_id"), col("embedding").as("v"),
            pmod(col("vec_id"), lit(cells)).as("cell"),
            graft.operators.Similarity.norm(col("embedding")).as("vn"))
          .repartition(32)
          .localCheckpoint(true)
        val peersOld = assignOld.select(col("cell").as("pcell"),
          col("vec_id").as("peer_id"), col("v").as("pv"))
        val peersNew = assignNew.select(col("cell").as("pcell"),
          col("vec_id").as("peer_id"), col("v").as("pv"), col("vn").as("pn"))
        val dfOld = assignOld.join(peersOld,
          col("cell") === col("pcell") && col("peer_id") < col("vec_id") &&
            graft.expressions.VectorExprs.cosineFF(col("v"), col("pv")) >= eps,
          "left_semi")
        val dfNew = assignNew.join(peersNew,
          col("cell") === col("pcell") && col("peer_id") < col("vec_id") &&
            graft.operators.Similarity.cosinePre(col("v"), col("pv"),
              col("vn"), col("pn")) >= eps,
          "left_semi")
        dfOld.write.format("noop").mode("overwrite").save()
        dfNew.write.format("noop").mode("overwrite").save()
        for (r <- 1 to 6) {
          for ((nm, df) <- Seq("cosineFF " -> dfOld, "cosinePre" -> dfNew)) {
            val t0 = System.nanoTime()
            df.write.format("noop").mode("overwrite").save()
            println(f"[probe] prune($cells cells) $nm pass$r ${(System.nanoTime() - t0) / 1e9}%.3f")
          }
        }
      case "q61" =>
        // dedup-first (3 exchanges: pair-distinct + countDistinct's two)
        // vs direct countDistinct (2 exchanges; the grouped partial agg
        // dedups (brand, size, suppkey) map-side, which is a SMALLER key
        // set than the (partkey, suppkey) pair distinct shuffles)
        val li = Tables.lineitem(spark, sfDir)
        val excl = Tables.supplier(spark, sfDir)
          .where(col("s_acctbal") < 0).select(col("s_suppkey"))
        val pdim = Tables.part(spark, sfDir)
          .select(col("p_partkey"), col("p_brand"), col("p_size"))
        val dfOld = li.select(col("l_partkey"), col("l_suppkey")).distinct()
          .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(broadcast(pdim), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_size").cast("long").as("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        val dfNew = li.select(col("l_partkey"), col("l_suppkey"))
          .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(broadcast(pdim), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_size").cast("long").as("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        dfOld.write.format("noop").mode("overwrite").save()
        dfNew.write.format("noop").mode("overwrite").save()
        for (r <- 1 to 6) {
          for ((nm, df) <- Seq("dedup-first" -> dfOld, "direct     " -> dfNew)) {
            val t0 = System.nanoTime()
            df.write.format("noop").mode("overwrite").save()
            println(f"[probe] q61 $nm pass$r ${(System.nanoTime() - t0) / 1e9}%.3f")
          }
        }
      case "t14" =>
        // VERDICT r18 item 3: measure the skinny-rank trade's crossover.
        // old = pre-r18 mixtureSample (rank the FULL frame: document text
        // rides the range exchange + the per-row external-Row encoder
        // hop); new = r18 form (rank the (source, id) projection, join
        // the keep set back — text never leaves the parquet reader for
        // t14's downstream agg). Interleaved, same JVM, any SF via
        // SPARK_GRAFT_SF_DIR.
        val docs = Tables.documents(spark, sfDir)
        val wt = (expr("substring(source, 4)").cast("long") % 4) * 10 + 10
        def t14agg(df: DataFrame) = df.groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("sum_chars_kept"))
        val dOld = docs.withColumn("_wt", wt.cast("long"))
        val stats = dOld.groupBy(col("source"), col("_wt"))
          .agg(count(lit(1)).as("_cnt"))
          .select(col("source").as("_src"), col("_wt").as("_w2"),
            expr("(_cnt * 10000) div _wt").as("_ratio"))
        val lam = stats.agg(min(col("_ratio")).as("_lam"))
        val keeps = stats.crossJoin(broadcast(lam))
          .select(col("_src"), expr("(_lam * _w2) div 10000").as("_keep"))
        val oldKept = graft.operators.Binning.rankInClass(dOld, "source", "doc_id", "doc_id")
          .join(broadcast(keeps), col("source") === col("_src"))
          .where(col("rn") <= col("_keep"))
          .drop("_src", "_keep", "rn", "_wt")
        val dfOld = t14agg(oldKept)
        val dfNew = t14agg(graft.operators.Sampling.mixtureSample(docs, "source", wt, "doc_id"))
        dfOld.write.format("noop").mode("overwrite").save()
        dfNew.write.format("noop").mode("overwrite").save()
        for (r <- 1 to 6) {
          for ((nm, df) <- Seq("full-rank  " -> dfOld, "skinny-rank" -> dfNew)) {
            val t0 = System.nanoTime()
            df.write.format("noop").mode("overwrite").save()
            println(f"[probe] t14 $nm pass$r ${(System.nanoTime() - t0) / 1e9}%.3f")
          }
        }
      case "t11" =>
        // decompose t11's scan chain: which kernel owns the per-byte bill?
        import graft.functions.TextFns
        val docs = Tables.documents(spark, sfDir)
        time("scan text only") { docs.select(col("doc_id"), col("text")) }
        time("+ normalize (5 regex passes)") {
          docs.select(col("doc_id"), TextFns.normalize(col("text")).as("n"))
        }
        time("+ tokens size") {
          docs.select(col("doc_id"),
            size(TextFns.tokens(TextFns.normalize(col("text")))).as("nt"))
        }
        time("+ sha2 over norm_text") {
          docs.select(col("doc_id"), sha2(TextFns.normalize(col("text")), 256).as("h"),
            size(TextFns.tokens(TextFns.normalize(col("text")))).as("nt"))
        }
        time("full t11") { SparkEntry.queries("t11_curation")(spark, sfDir) }
      case "t12" =>
        import graft.functions.TextFns
        val docs = Tables.documents(spark, sfDir)
        time("tokens size scan") {
          docs.select(col("doc_id"), col("source"),
            size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
        }
        time("+ packSequences (2-pass prefix sum)") {
          graft.operators.Sampling.packSequences(
            docs.select(col("doc_id"), col("source"),
              size(TextFns.tokens(col("text"))).cast("long").as("n_tokens")),
            "source", "doc_id", "n_tokens", budget = 512L)
        }
        time("full t12") { SparkEntry.queries("t12_sequence_pack")(spark, sfDir) }
      case "rank" =>
        // decompose t14's rankInClass: how much is the range-partition
        // sort alone vs the mapPartitions external-Row running-rank hop?
        val docs = Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("source"), col("text"))
        val p = spark.sessionState.conf.numShufflePartitions
        time("ranged sort only") {
          docs.repartitionByRange(p, col("source").asc, col("doc_id").asc, col("doc_id").asc)
            .sortWithinPartitions(col("source").asc, col("doc_id").asc, col("doc_id").asc)
        }
        time("rankInClass (sort + mapPartitions + offsets)") {
          graft.operators.Binning.rankInClass(docs, "source", "doc_id", "doc_id")
        }
      case "round" =>
        val base = spark.range(0, 20000000).select(
          (col("id") % 100000).cast("double").divide(7.0).as("x"))
          .localCheckpoint(true)
        time("round(x*100) [BigDecimal]") {
          base.agg(sum(round(col("x") * 100).cast("long")))
        }
        time("floor(x*100+0.5) [double]") {
          base.agg(sum(floor(col("x") * 100 + lit(0.5d)).cast("long")))
        }
      case "codegen" =>
        // print the executed plan with codegen spans + generated-code sizes
        val df = SparkEntry.queries(args(1))(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        println(df.queryExecution.executedPlan.toString)
        org.apache.spark.sql.execution.debug.DebugQuery(df).debugCodegen()
      case "one" =>
        // time any single declared query: OptProbe one <name>
        val n = args(1)
        time(n) { SparkEntry.queries(n)(spark, sfDir) }
      case other => sys.error(s"unknown probe: $other")
    }
    spark.stop()
  }
}
