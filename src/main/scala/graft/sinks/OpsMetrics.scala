package graft.sinks

import graft.sources.{ExportFile, LoadPlan}

/** Ops metrics surface (reference `db.py:404-407`, `db.py:918-927`).
  *
  * The reference emits dogstatsd gauges per imported file —
  * `parquet_file_age_s` (now − the file window's end) and
  * `parquet_row_age_s` (now − the last imported row's `updated_at`; an
  * empty window reuses the file age) — plus a `num_parquet_rows_imported`
  * counter, all tagged with the table name. Freshness gauges are what an
  * operator actually alerts on: they say "how far behind live is this
  * table", which row counts can't.
  *
  * Here the emitter is a pure FORMATTER to the statsd line protocol
  * (`metric:value|type|#k:v,...` — one UDP datagram per line; no statsd
  * socket exists in this container, and the protocol is plain text, so the
  * lines ARE the contract). Values come from driver-side scalars the load
  * path already has — an [[ExportFile]]'s window bounds, a row count, a
  * max(updated_at) aggregate — never from a per-row plan, so emitting
  * metrics costs one O(#tables) loop on the driver, nothing distributed.
  */
object OpsMetrics {

  /** `name:value|g|#tags` — dogstatsd gauge line. */
  def gauge(name: String, value: Double, tags: Map[String, String] = Map.empty): String =
    render(name, fmt(value), "g", tags)

  /** `name:value|c|#tags` — dogstatsd counter line. */
  def counter(name: String, value: Long, tags: Map[String, String] = Map.empty): String =
    render(name, value.toString, "c", tags)

  private def fmt(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString else v.toString

  private def render(name: String, value: String, kind: String, tags: Map[String, String]): String = {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_' || c == '.'),
      s"unsafe metric name: $name")
    val tagStr =
      if (tags.isEmpty) ""
      else tags.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${clean(k)}:${clean(v)}" }
        .mkString("|#", ",", "")
    s"$name:$value|$kind$tagStr"
  }

  /** Tag keys/values must not carry protocol separators. */
  private def clean(s: String): String =
    s.map(c => if (c == '|' || c == ',' || c == ':' || c == '\n') '_' else c)

  /** The reference's per-file freshness emission (`db.py:918-927`): file
    * age from the window end, row age from the newest imported row (file
    * age when the window was empty), and the imported-row counter.
    *
    * @param lastRowTsS newest imported `updated_at` in epoch seconds, None
    *                   for an `.empty` window
    */
  def importGauges(
      file: ExportFile,
      nowS: Double,
      rowsImported: Long,
      lastRowTsS: Option[Double]): Seq[String] = {
    val tags = Map("parquet_table" -> file.tableName, "schema" -> file.schemaName)
    val fileAge = nowS - file.endTs
    val rowAge = lastRowTsS.map(nowS - _).getOrElse(fileAge)
    Seq(
      gauge("parquet_file_age_s", fileAge, tags),
      gauge("parquet_row_age_s", rowAge, tags)) ++
      (if (rowsImported > 0) Seq(counter("num_parquet_rows_imported", rowsImported, tags)) else Nil)
  }

  /** Freshness of a whole load plan: one file-age gauge per chained file
    * plus a table-level staleness gauge at the plan's `asOf` — the number
    * an alert watches while the incremental loop runs.
    */
  def planGauges(plan: LoadPlan, nowS: Double): Seq[String] = {
    // the window tag makes each file its own series — without it every
    // per-file gauge shares one series and a dogstatsd flush keeps only
    // the last value, hiding the oldest (alert-relevant) file
    val perFile = (plan.full +: plan.incrementals).map { f =>
      gauge("parquet_file_age_s", nowS - f.endTs,
        Map("parquet_table" -> f.tableName, "schema" -> f.schemaName,
          "window" -> s"${f.startTs}-${f.endTs}"))
    }
    perFile :+ gauge("parquet_table_staleness_s", nowS - plan.asOf,
      Map("parquet_table" -> plan.full.tableName, "schema" -> plan.full.schemaName))
  }
}
