package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.OpsMetrics
import graft.sources.{ExportFile, LoadPlan}

/** Statsd line-protocol emission for the reference's freshness gauges
  * (db.py:404-407, db.py:918-927).
  */
class OpsMetricsSpec extends AnyFunSuite {

  private val full = ExportFile("/x/s-events-0-1000.parquet", "s", "events", 0L, 1000L, isEmpty = false)
  private val inc = ExportFile("/x/s-events-1000-2000.parquet", "s", "events", 1000L, 2000L, isEmpty = false)
  private val empty = ExportFile("/x/s-events-2000-3000.empty", "s", "events", 2000L, 3000L, isEmpty = true)

  test("gauge/counter render the dogstatsd line protocol with sorted tags") {
    assert(OpsMetrics.gauge("parquet_file_age_s", 42.0, Map("parquet_table" -> "casts")) ==
      "parquet_file_age_s:42|g|#parquet_table:casts")
    assert(OpsMetrics.gauge("x", 1.5) == "x:1.5|g")
    assert(OpsMetrics.counter("num_parquet_rows_imported", 12345,
      Map("schema" -> "s", "parquet_table" -> "t")) ==
      "num_parquet_rows_imported:12345|c|#parquet_table:t,schema:s")
    // protocol separators in tag values are sanitized, not emitted
    assert(OpsMetrics.gauge("x", 1.0, Map("k" -> "a|b,c:d")) == "x:1|g|#k:a_b_c_d")
    intercept[IllegalArgumentException](OpsMetrics.gauge("bad name", 1.0))
  }

  test("importGauges: file age from window end, row age from newest row") {
    val lines = OpsMetrics.importGauges(inc, nowS = 2500.0, rowsImported = 10, lastRowTsS = Some(1800.0))
    assert(lines == Seq(
      "parquet_file_age_s:500|g|#parquet_table:events,schema:s",
      "parquet_row_age_s:700|g|#parquet_table:events,schema:s",
      "num_parquet_rows_imported:10|c|#parquet_table:events,schema:s"))
  }

  test("empty window: row age falls back to file age, no row counter") {
    // the reference's empty branch (db.py:404-407)
    val lines = OpsMetrics.importGauges(empty, nowS = 3100.0, rowsImported = 0, lastRowTsS = None)
    assert(lines == Seq(
      "parquet_file_age_s:100|g|#parquet_table:events,schema:s",
      "parquet_row_age_s:100|g|#parquet_table:events,schema:s"))
  }

  test("planGauges: per-file ages plus table staleness at the plan's asOf") {
    val lines = OpsMetrics.planGauges(LoadPlan(full, Seq(inc, empty)), nowS = 3600.0)
    assert(lines.size == 4)
    assert(lines.last == "parquet_table_staleness_s:600|g|#parquet_table:events,schema:s")
    assert(lines.head.startsWith("parquet_file_age_s:2600|g"))
  }
}
