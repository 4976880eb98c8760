package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.{OpsLog, ProgressTracker, ShuttingDownException}

/** Structured log + progress surface (sinks/OpsLog.scala — reference
  * logger.py / progress.py semantics).
  */
class OpsLogSpec extends AnyFunSuite {

  test("json line: pinned key order, ISO timestamp, upper-cased level, escaped extras") {
    val line = OpsLog.jsonLine(1704672000000L, "info", "app", "imported file",
      Seq("table" -> "casts", "path" -> "a\"b\nc"))
    assert(line ==
      """{"timestamp": "2024-01-08T00:00:00Z", "level": "INFO", "name": "app", """ +
        """"message": "imported file", "table": "casts", "path": "a\"b\nc"}""")
    // strict JSON: parseable, keys ordered
    assert(line.startsWith("""{"timestamp""""))
  }

  test("json line: extras shadowing base fields are dropped, not corrupting") {
    val line = OpsLog.jsonLine(0L, "warn", "app", "msg",
      Seq("level" -> "hax", "rows" -> "5"))
    assert(!line.contains("hax"))
    assert(line.contains(""""level": "WARN""""))
    assert(line.contains(""""rows": "5""""))
  }

  test("rich line: extras appended only when present") {
    assert(OpsLog.richLine("app", "synced") == "app - synced")
    assert(OpsLog.richLine("app", "synced", Seq("table" -> "casts", "rows" -> "10")) ==
      "app - synced | {table: casts, rows: 10}")
  }

  test("progress: advance, growable totals, render format") {
    var now = 0L
    val p = new ProgressTracker(clock = () => now)
    p.addTask("casts-full", 100L)
    now = 10000L // 10s in
    p.advance("casts-full", 40L)
    assert(p.completed("casts-full") == 40L && p.total("casts-full") == 100L)
    // 40 steps in 10s = 4.0/s; 60 remaining -> 15s eta
    assert(p.render("casts-full") == "casts-full 40/100 (40%) 4.0 steps/s eta 00:15")
    // incremental discovery grows the total mid-flight (progress.py more_steps)
    p.moreSteps("casts-full", 100L)
    assert(p.total("casts-full") == 200L)
    assert(p.render("casts-full").startsWith("casts-full 40/200 (20%)"))
  }

  test("progress: shutdown is observed at advance granularity") {
    var stop = false
    val p = new ProgressTracker(shouldStop = () => stop)
    p.addTask("t", 10L)
    p.advance("t")
    stop = true
    intercept[ShuttingDownException] { p.advance("t") }
    // the interrupted step did NOT count — a resume replays from the boundary
    assert(p.completed("t") == 1L)
  }

  test("progress: concurrent advance from per-table pools is lossless") {
    val p = new ProgressTracker()
    p.addTask("t", 10000L)
    val threads = (1 to 8).map { _ =>
      new Thread(() => (1 to 1000).foreach(_ => p.advance("t")))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(p.completed("t") == 8000L)
  }
}
