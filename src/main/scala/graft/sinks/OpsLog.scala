package graft.sinks

/** Raised from a progress advance when shutdown was requested — the
  * reference's ShuttingDown contract (progress.py:24-26): long import
  * loops observe shutdown at progress-update granularity, so a stop
  * lands on a step boundary (RowGroupResume then resumes cleanly).
  */
final class ShuttingDownException(message: String) extends RuntimeException(message)

/** Structured log + progress surface — the reference's ops shell
  * (logger.py:1-115, progress.py:1-43) re-expressed for a cluster driver.
  *
  * The reference renders rich interactive progress bars and python-json
  * log lines on a single-node TTY. A Spark driver has no TTY and its
  * "progress bar" consumers are log aggregators and metric sinks, so the
  * re-expression keeps the SEMANTICS and drops the terminal plumbing:
  *
  *  - [[OpsLog.jsonLine]] — the structured JSON log record (logger.py's
  *    CustomJsonFormatter: timestamp + upper-cased level + logger name +
  *    message base fields, then the record's EXTRA key/values; extras
  *    shadowing a base field are skipped, mirroring RESERVED_ATTRS).
  *  - [[OpsLog.richLine]] — the rich-handler text form: `name - message`
  *    with ` | {k: v, ...}` appended when extras exist
  *    (logger.py:66-82).
  *  - [[ProgressTracker]] — progress.py's ProgressCallback semantics:
  *    named tasks with a step total that can GROW as new incremental
  *    files appear (`more_steps`), thread-safe advance from per-table
  *    pools, shutdown observed at advance granularity, rendered as
  *    completed/total/rate/ETA lines (what a bar shows, as text) —
  *    driver-side scalars only, nothing distributed.
  */
object OpsLog {

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Base fields extras may not shadow (the RESERVED_ATTRS intent). */
  private val Reserved = Set("timestamp", "level", "name", "message")

  /** One strict-JSON log line: pinned key order (timestamp, level, name,
    * message, then extras in given order), ISO-8601 UTC timestamp,
    * upper-cased level. Extras whose key shadows a base field are
    * dropped rather than corrupting the record.
    */
  def jsonLine(
      epochMs: Long,
      level: String,
      name: String,
      message: String,
      extra: Seq[(String, String)] = Nil): String = {
    val ts = java.time.Instant.ofEpochMilli(epochMs).toString
    val base = Seq(
      "timestamp" -> ts,
      "level" -> level.toUpperCase(java.util.Locale.ROOT),
      "name" -> name,
      "message" -> message)
    (base ++ extra.filterNot(kv => Reserved(kv._1)))
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{", ", ", "}")
  }

  /** The rich-handler text form: `name - message | {k: v, ...}` (extras
    * appended only when present — logger.py:76-81).
    */
  def richLine(name: String, message: String, extra: Seq[(String, String)] = Nil): String = {
    val kept = extra.filterNot(kv => Reserved(kv._1))
    if (kept.isEmpty) s"$name - $message"
    else kept.map { case (k, v) => s"$k: $v" }.mkString(s"$name - $message | {", ", ", "}")
  }
}

/** Thread-safe named-task progress registry (reference progress.py
  * ProgressCallback): `advance` is what row-group import loops call per
  * step, `moreSteps` is the incremental-poll loop discovering new files
  * (the total grows mid-flight), and `render` is the bar's information
  * as a log-aggregator-friendly line. `shouldStop` is observed on every
  * advance — the reference raises ShuttingDown from inside the progress
  * callback so imports stop on step boundaries.
  */
final class ProgressTracker(
    shouldStop: () => Boolean = () => false,
    clock: () => Long = () => System.currentTimeMillis()) {

  private final case class St(total: Long, done: Long, startMs: Long)
  private val tasks = scala.collection.mutable.LinkedHashMap.empty[String, St]

  def addTask(name: String, totalSteps: Long): Unit = synchronized {
    require(!tasks.contains(name), s"task '$name' already registered")
    tasks(name) = St(totalSteps, 0L, clock())
  }

  /** Advance `n` steps; throws [[ShuttingDownException]] when shutdown was
    * requested (observed here, like the reference's callback, so a stop
    * always lands between steps).
    */
  def advance(name: String, n: Long = 1L): Unit = {
    if (shouldStop())
      throw new ShuttingDownException(s"Shutting down during progress update of '$name'")
    synchronized {
      val st = tasks.getOrElse(name, sys.error(s"unknown task '$name'"))
      tasks(name) = st.copy(done = st.done + n)
    }
  }

  /** Grow the task's total (new incremental files discovered mid-import —
    * progress.py:28-43).
    */
  def moreSteps(name: String, more: Long): Unit = synchronized {
    val st = tasks.getOrElse(name, sys.error(s"unknown task '$name'"))
    tasks(name) = st.copy(total = st.total + more)
  }

  def completed(name: String): Long = synchronized(tasks(name).done)
  def total(name: String): Long = synchronized(tasks(name).total)

  /** One line of what a progress bar displays: steps, percent (integer,
    * floor), rate and ETA from the monotonic task clock. Pure function of
    * the tracked counters + clock, so the format is spec-pinned.
    */
  def render(name: String): String = synchronized {
    val st = tasks.getOrElse(name, sys.error(s"unknown task '$name'"))
    val pct = if (st.total <= 0) 0L else st.done * 100L / st.total
    val elapsedS = math.max(1L, (clock() - st.startMs) / 1000L)
    val rate = st.done.toDouble / elapsedS
    val eta =
      if (rate <= 0.0 || st.done >= st.total) "00:00"
      else {
        val s = math.ceil((st.total - st.done) / rate).toLong
        f"${s / 60}%02d:${s % 60}%02d"
      }
    f"$name ${st.done}/${st.total} ($pct%d%%) $rate%.1f steps/s eta $eta"
  }

  def renderAll: Seq[String] = synchronized(tasks.keys.toSeq).map(render)
}
