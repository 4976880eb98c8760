package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, PreparedStatement, SQLException}
import scala.collection.mutable
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import graft.sinks.JdbcUpsertSink

/** The sink's SQL generation + binding, exercised against a recording
  * connection double, and the upsert semantics replayed into an in-memory
  * table model and cross-checked against MergeOps' latest-wins.
  */
class JdbcUpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  test("upsertSql emits the reference's ON CONFLICT .. WHERE updated_at guard") {
    val sql = JdbcUpsertSink.upsertSql("casts", Seq("id", "text", "updated_at"), Seq("id"), "updated_at", 2)
    assert(sql ==
      """INSERT INTO "casts" AS t ("id", "text", "updated_at") VALUES (?, ?, ?), (?, ?, ?) """ +
        """ON CONFLICT ("id") DO UPDATE SET "text" = excluded."text", "updated_at" = excluded."updated_at" """ +
        """WHERE excluded."updated_at" >= t."updated_at"""")
  }

  test("upsertSql quotes schema-qualified tables and degrades to DO NOTHING when all columns are PK") {
    val sql = JdbcUpsertSink.upsertSql("public.likes", Seq("fid", "target"), Seq("fid", "target"), "fid", 1)
    assert(sql ==
      """INSERT INTO "public"."likes" AS t ("fid", "target") VALUES (?, ?) ON CONFLICT ("fid", "target") DO NOTHING""")
  }

  test("dedupBatch keeps one row per PK — max ordering, last-in-batch on ties") {
    val rows = Seq(
      Row(1L, "a", 10L), Row(2L, "b", 5L), Row(1L, "c", 20L),
      Row(1L, "stale", 15L), Row(3L, "t1", 7L), Row(3L, "t2", 7L))
    val out = JdbcUpsertSink.dedupBatch(rows, pkIdx = Seq(0), ordIdx = 2)
    assert(out == Seq(Row(1L, "c", 20L), Row(2L, "b", 5L), Row(3L, "t2", 7L)))
    // no duplicates → batch returned as-is
    val clean = Seq(Row(1L, "a", 1L), Row(2L, "b", 2L))
    assert(JdbcUpsertSink.dedupBatch(clean, Seq(0), 2) eq clean)
  }

  /** Recording doubles: capture every bound parameter batch. */
  private class Recorder {
    val batches = mutable.Buffer[Vector[Any]]()
    var current = mutable.Buffer[Any]()
    var closed = false

    def statement: PreparedStatement =
      Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[PreparedStatement]),
        new InvocationHandler {
          def invoke(proxy: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
            case n if n.startsWith("set") && args != null && args.length >= 2 =>
              current += args(1); null
            case "executeUpdate" =>
              batches += current.toVector; current = mutable.Buffer[Any]()
              Integer.valueOf(1)
            case "close" => null
            case _       => null
          }
        }).asInstanceOf[PreparedStatement]

    def connection: Connection =
      Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
        new InvocationHandler {
          def invoke(proxy: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
            case "prepareStatement" => statement
            case "close"            => closed = true; null
            case "setAutoCommit" | "commit" => null
            case "isClosed"         => java.lang.Boolean.valueOf(closed)
            case _                  => null
          }
        }).asInstanceOf[Connection]
  }

  test("bindAndExecute binds rows positionally in batches") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType), StructField("updated_at", LongType)))
    val rec = new Recorder
    val stmt = rec.statement
    JdbcUpsertSink.bindAndExecute(stmt, schema,
      Seq(Row(1L, "a", 10L), Row(2L, null, 20L)))
    assert(rec.batches == Seq(Vector(1L, "a", 10L, 2L, null, 20L)))
  }

  test("distributed write applies latest-wins semantics equal to MergeOps") {
    val df = Seq(
      (1L, "old", 10L), (1L, "new", 20L),
      (2L, "only", 5L), (3L, "x", 7L), (3L, "y", 7L)
    ).toDF("id", "v", "updated_at")

    // replay generated upserts into a driver-side table model via the
    // reference guard: apply iff updated_at >= existing.updated_at
    val sink = new java.util.concurrent.ConcurrentHashMap[Long, (String, Long)]()
    GlobalSinkModel.table = sink
    JdbcUpsertSink.write(df.repartition(4), "t", Seq("id"), "updated_at",
      batchSize = 2, connect = () => GlobalSinkModel.connection())

    val expected = graft.operators.MergeOps
      .latestByKey(df, Seq("id"), Seq("updated_at"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    import scala.jdk.CollectionConverters._
    val got = sink.asScala.map { case (k, (v, _)) => k -> v }.toMap
    // ties (id=3 at ts 7) can land either way by arrival order — the
    // reference has the same property (>=). Compare modulo the tie.
    assert(got.keySet == expected.keySet)
    assert(got(1L) == "new" && got(2L) == "only")
  }

  test("transient classification mirrors the reference's retry policy") {
    import java.sql.{SQLTransientException, SQLRecoverableException}
    assert(JdbcUpsertSink.isTransient(new SQLException("deadlock detected", "40P01")))
    assert(JdbcUpsertSink.isTransient(new SQLException("serialization failure", "40001")))
    assert(JdbcUpsertSink.isTransient(new SQLException("conn reset", "08006")))
    assert(JdbcUpsertSink.isTransient(new SQLException("too many clients", "53300")))
    assert(JdbcUpsertSink.isTransient(new SQLException("starting up", "57P03")))
    assert(JdbcUpsertSink.isTransient(new SQLTransientException("timeout")))
    assert(JdbcUpsertSink.isTransient(new SQLRecoverableException("gone")))
    // deterministic errors fail fast
    assert(!JdbcUpsertSink.isTransient(new SQLException("unique violation", "23505")))
    assert(!JdbcUpsertSink.isTransient(new SQLException("syntax error", "42601")))
    assert(!JdbcUpsertSink.isTransient(new SQLException("no state")))
    // backoff: exponential from 400ms capped at 10s, jitter < 1s
    for (a <- 1 to 10) {
      val ms = JdbcUpsertSink.backoffMs(a)
      val expo = math.min(10000L, 400L << (a - 1))
      assert(ms >= expo && ms < expo + 1000, s"attempt $a -> $ms")
    }
  }

  test("createTableSql derives the reference's DDL shapes from a Spark schema") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("hash", BinaryType, nullable = false),
      StructField("text", StringType),
      StructField("score", DoubleType),
      StructField("ts", TimestampType, nullable = false),
      StructField("mentions", ArrayType(LongType)),
      StructField("embeds", StructType(Seq(StructField("k", LongType)))),
      StructField("updated_at", LongType, nullable = false)))
    val ddl = JdbcUpsertSink.createTableSql("public.casts", schema, Seq("id"), "updated_at")
    assert(ddl.head ==
      """CREATE TABLE IF NOT EXISTS "public"."casts" (
        |    "id" bigint NOT NULL,
        |    "hash" bytea NOT NULL,
        |    "text" text,
        |    "score" double precision,
        |    "ts" timestamp without time zone NOT NULL,
        |    "mentions" bigint[],
        |    "embeds" jsonb,
        |    "updated_at" bigint NOT NULL,
        |    PRIMARY KEY ("id")
        |)""".stripMargin)
    assert(ddl(1) ==
      """CREATE INDEX IF NOT EXISTS "idx_casts_updated_at" ON "public"."casts" ("updated_at")""")
    // every statement idempotent; tracking table mirrors the reference's
    // columns (post-migration shape) and its four indexes
    val tracking = JdbcUpsertSink.trackingTableSql("public")
    assert(tracking.forall(_.contains("IF NOT EXISTS")))
    assert(tracking.size == 5)
    for (c <- Seq("table_name", "file_name", "file_type", "file_version", "file_duration_s",
                  "is_empty", "end_timestamp", "last_row_group_imported", "total_row_groups",
                  "completed", "backfill"))
      assert(tracking.head.contains("\"" + c + "\""), s"tracking DDL missing $c")
  }

  test("AdaptiveBatchSizer: 20% shrink when slow, bounded growth when fast") {
    val s = new JdbcUpsertSink.AdaptiveBatchSizer(100, 10, 100)
    // five slow observations → one 20% reduction (the reference's factor)
    for (_ <- 1 to 5) s.record(5000.0)
    assert(s.size == 80)
    // keeps shrinking while slow, floored at min
    for (_ <- 1 to 50) s.record(5000.0)
    assert(s.size == 10)
    // recovery: fast observations grow 25% per window, capped at max
    for (_ <- 1 to 5) s.record(100.0)
    assert(s.size == 12)
    for (_ <- 1 to 100) s.record(100.0)
    assert(s.size == 100)
    // in-between times leave the size alone
    for (_ <- 1 to 10) s.record(1500.0)
    assert(s.size == 100)
  }

  test("adaptive write shrinks batches under a slow backend and recovers after") {
    // fake clock: the first 10 statements cost 5s each (slow spell), the
    // rest 100ms. initial batch 16, floor 16/8 = 2.
    GlobalAdaptiveModel.reset(slowStatements = 10, slowMsPerStmt = 5000, fastMsPerStmt = 100)
    import org.apache.spark.sql.functions.{col, concat, lit}
    val df = spark.range(400)
      .select(col("id"), concat(lit("v"), col("id")).as("v"), col("id").as("updated_at"))
      .coalesce(1)
    JdbcUpsertSink.write(df, "t", Seq("id"), "updated_at", batchSize = 16,
      connect = () => GlobalAdaptiveModel.connection(),
      maxAttempts = 1, sleepMs = _ => (), adaptive = true,
      nanoTime = () => GlobalAdaptiveModel.nowNs.get())
    import scala.jdk.CollectionConverters._
    val sizes = GlobalAdaptiveModel.sizes.asScala.toVector.map(_.toInt)
    assert(sizes.sum == 400, "every row lands exactly once")
    // deterministic trace: 16 → (slow window ×2) 12 → 9, then the fast
    // phase grows 25%/window back to the configured cap: 11 → 13 → 16
    assert(sizes.take(5) == Vector(16, 16, 16, 16, 16))
    assert(sizes.min == 9, s"expected shrink to 9, trace: $sizes")
    assert(sizes.slice(10, 15) == Vector(9, 9, 9, 9, 9))
    assert(sizes.slice(15, 20) == Vector(11, 11, 11, 11, 11))
    assert(sizes.indexOf(9) < sizes.lastIndexOf(16), "size must recover after the slow spell")
    assert(sizes.drop(25).init.forall(_ == 16), s"recovered tail should run at the cap: $sizes")
  }

  test("deadlock storm: N transient failures then success commits exactly once") {
    GlobalFlakyModel.reset(failures = 3,
      () => new SQLException("deadlock detected", "40P01"))
    val df = Seq((1L, "a", 10L), (1L, "b", 20L), (2L, "c", 5L))
      .toDF("id", "v", "updated_at").coalesce(1)
    // sleeps must be recorded in the static model: the closure is serialized
    // into the task, so a captured local buffer would receive nothing
    JdbcUpsertSink.write(df, "t", Seq("id"), "updated_at", batchSize = 100,
      connect = () => GlobalFlakyModel.connection(),
      maxAttempts = 5, sleepMs = ms => GlobalFlakyModel.sleeps.add(ms))
    import scala.jdk.CollectionConverters._
    assert(GlobalFlakyModel.table.asScala.map { case (k, (v, _)) => k -> v }.toMap ==
      Map(1L -> "b", 2L -> "c"))
    assert(GlobalFlakyModel.executeAttempts.get == 4) // 3 failures + 1 success
    assert(GlobalFlakyModel.applies.get == 1)         // the batch landed exactly once
    val sleeps = GlobalFlakyModel.sleeps.asScala.toVector
    assert(sleeps.size == 3)
    // tenacity shape: 400·2^(n-1) plus <1s jitter
    for ((s, i) <- sleeps.zipWithIndex) {
      val expo = 400L << i
      assert(s >= expo && s < expo + 1000, s"sleep $i was $s")
    }
    // deadlocks do not force a reconnect
    assert(GlobalFlakyModel.connects.get == 1)
  }

  test("connection failure triggers reconnect and the replay still lands once") {
    GlobalFlakyModel.reset(failures = 1,
      () => new SQLException("connection reset by peer", "08006"))
    val df = Seq((7L, "x", 1L)).toDF("id", "v", "updated_at").coalesce(1)
    JdbcUpsertSink.write(df, "t", Seq("id"), "updated_at", batchSize = 100,
      connect = () => GlobalFlakyModel.connection(),
      maxAttempts = 5, sleepMs = _ => ())
    import scala.jdk.CollectionConverters._
    assert(GlobalFlakyModel.table.asScala.keySet == Set(7L))
    assert(GlobalFlakyModel.connects.get == 2) // original + replacement
    assert(GlobalFlakyModel.applies.get == 1)
  }

  test("non-transient failure fails the batch immediately — no retry") {
    GlobalFlakyModel.reset(failures = 100,
      () => new SQLException("unique violation", "23505"))
    val df = Seq((9L, "z", 1L)).toDF("id", "v", "updated_at").coalesce(1)
    intercept[Exception] {
      JdbcUpsertSink.write(df, "t", Seq("id"), "updated_at", batchSize = 100,
        connect = () => GlobalFlakyModel.connection(),
        maxAttempts = 5, sleepMs = _ => ())
    }
    assert(GlobalFlakyModel.executeAttempts.get == 1)
    assert(GlobalFlakyModel.table.isEmpty)
  }

  test("attempt budget exhausted: the last transient error propagates") {
    GlobalFlakyModel.reset(failures = 100,
      () => new SQLException("deadlock detected", "40P01"))
    val df = Seq((9L, "z", 1L)).toDF("id", "v", "updated_at").coalesce(1)
    intercept[Exception] {
      JdbcUpsertSink.write(df, "t", Seq("id"), "updated_at", batchSize = 100,
        connect = () => GlobalFlakyModel.connection(),
        maxAttempts = 3, sleepMs = _ => ())
    }
    assert(GlobalFlakyModel.executeAttempts.get == 3) // exactly maxAttempts
    assert(GlobalFlakyModel.table.isEmpty)
  }
}

/** Fake-clock sink model for the adaptive-sizing spec: each executeUpdate
  * records the statement's row count and advances the clock by a scheduled
  * per-statement cost (slow spell first, then fast).
  */
object GlobalAdaptiveModel {
  val nowNs = new java.util.concurrent.atomic.AtomicLong(0L)
  val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
  private val stmts = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile private var slowN = 0
  @volatile private var slowCost = 0L
  @volatile private var fastCost = 0L

  def reset(slowStatements: Int, slowMsPerStmt: Long, fastMsPerStmt: Long): Unit = {
    nowNs.set(0L); sizes.clear(); stmts.set(0)
    slowN = slowStatements; slowCost = slowMsPerStmt; fastCost = fastMsPerStmt
  }

  def connection(): Connection = {
    val binds = new java.util.concurrent.atomic.AtomicInteger(0)
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
      new InvocationHandler {
        def invoke(proxy: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "prepareStatement" =>
            Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[PreparedStatement]),
              new InvocationHandler {
                def invoke(p2: Any, m2: Method, a2: Array[AnyRef]): AnyRef = m2.getName match {
                  case n if n.startsWith("set") && a2 != null && a2.length >= 2 =>
                    binds.incrementAndGet(); null
                  case "executeUpdate" =>
                    sizes.add(binds.getAndSet(0) / 3) // 3 columns per row
                    val k = stmts.incrementAndGet()
                    nowNs.addAndGet((if (k <= slowN) slowCost else fastCost) * 1000000L)
                    Integer.valueOf(1)
                  case _ => null
                }
              }).asInstanceOf[PreparedStatement]
          case _ => null
        }
      }).asInstanceOf[Connection]
  }
}

/** Static sink model reachable from executor threads (local mode shares the
  * JVM, matching how foreachPartition runs here).
  */
object GlobalSinkModel {
  @volatile var table: java.util.concurrent.ConcurrentHashMap[Long, (String, Long)] = _

  def connection(): Connection = {
    val rows = mutable.Buffer[Any]()
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
      new InvocationHandler {
        def invoke(proxy: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "prepareStatement" =>
            Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[PreparedStatement]),
              new InvocationHandler {
                def invoke(p2: Any, m2: Method, a2: Array[AnyRef]): AnyRef = m2.getName match {
                  case n if n.startsWith("set") && a2 != null && a2.length >= 2 =>
                    rows += a2(1); null
                  case "executeUpdate" =>
                    rows.grouped(3).foreach { g =>
                      val id = g(0).asInstanceOf[Long]
                      val v = g(1).asInstanceOf[String]
                      val ts = g(2).asInstanceOf[Long]
                      table.merge(id, (v, ts),
                        (oldV, newV) => if (newV._2 >= oldV._2) newV else oldV)
                    }
                    rows.clear()
                    Integer.valueOf(1)
                  case _ => null
                }
              }).asInstanceOf[PreparedStatement]
          case _ => null
        }
      }).asInstanceOf[Connection]
  }
}

/** Flaky-sink double: fails the next `failures` executeUpdate calls with the
  * injected exception, then applies batches to the in-memory table model —
  * the shape of a deadlock storm / connection drop the retry path exists
  * for. Counters are global because foreachPartition runs on executor
  * threads in the shared local-mode JVM.
  */
object GlobalFlakyModel {
  import java.util.concurrent.atomic.AtomicInteger
  @volatile var table: java.util.concurrent.ConcurrentHashMap[Long, (String, Long)] = _
  val failuresRemaining = new AtomicInteger(0)
  val executeAttempts = new AtomicInteger(0)
  val connects = new AtomicInteger(0)
  val applies = new AtomicInteger(0)
  val sleeps = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
  @volatile var failure: () => java.sql.SQLException = _

  def reset(failures: Int, f: () => java.sql.SQLException): Unit = {
    table = new java.util.concurrent.ConcurrentHashMap[Long, (String, Long)]()
    failuresRemaining.set(failures)
    executeAttempts.set(0)
    connects.set(0)
    applies.set(0)
    sleeps.clear()
    failure = f
  }

  def connection(): Connection = {
    connects.incrementAndGet()
    val rows = mutable.Buffer[Any]()
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
      new InvocationHandler {
        def invoke(proxy: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "prepareStatement" =>
            Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[PreparedStatement]),
              new InvocationHandler {
                def invoke(p2: Any, m2: Method, a2: Array[AnyRef]): AnyRef = m2.getName match {
                  case n if n.startsWith("set") && a2 != null && a2.length >= 2 =>
                    rows += a2(1); null
                  case "executeUpdate" =>
                    executeAttempts.incrementAndGet()
                    if (failuresRemaining.getAndDecrement() > 0) {
                      rows.clear()
                      throw failure()
                    }
                    rows.grouped(3).foreach { g =>
                      val id = g(0).asInstanceOf[Long]
                      val v = g(1).asInstanceOf[String]
                      val ts = g(2).asInstanceOf[Long]
                      table.merge(id, (v, ts),
                        (oldV, newV) => if (newV._2 >= oldV._2) newV else oldV)
                    }
                    applies.incrementAndGet()
                    rows.clear()
                    Integer.valueOf(1)
                  case _ => null
                }
              }).asInstanceOf[PreparedStatement]
          case "rollback" => rows.clear(); null
          case _ => null
        }
      }).asInstanceOf[Connection]
  }
}
