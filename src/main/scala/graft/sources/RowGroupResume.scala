package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import scala.jdk.CollectionConverters._

/** Row-group-granular resume of an interrupted full import
  * (reference `check_for_past_full_import`, db.py:211-258: a partial full
  * restarts at `last_row_group_imported + 1`, not at byte 0).
  *
  * The reference walks a full export row-group-by-row-group because it is a
  * single-threaded row loop; Spark imports a full in one distributed job.
  * What survives translation is the *transactional chunking*: the import
  * advances in row-group-aligned batches, each batch is committed to the
  * sink before progress is recorded, and a crash resumes at the first
  * unrecorded batch — a 100 GB full that dies at 90% re-imports one batch,
  * not the file.
  *
  *  - Row-group boundaries come from the parquet footer, read driver-side
  *    (metadata only — the same names/metadata-only planning ExportCatalog
  *    does at the file level).
  *  - A batch is addressed as a `_metadata.row_index` range; the boundary
  *    rows come from the footer's per-group row counts, so batch membership
  *    is exact regardless of how Spark splits the file across tasks.
  *  - Progress is a marker file per completed batch (`rg-<lastGroup>`) —
  *    atomic create, no read-modify-write, safe under concurrent observers.
  *    Markers are recorded AFTER the sink commits, so the crash window
  *    re-imports the in-flight batch; the sink's latest-wins upsert makes
  *    that replay idempotent, exactly the reference's semantics.
  *
  * Scale note: on resume the scan still *opens* the file and discards
  * already-imported rows via the row-index predicate (Spark's parquet
  * reader has no row-group skip for metadata predicates). That cost is paid
  * once, after a crash, and is a pure scan — no shuffle. The common case —
  * a multi-file 100 TB full — resumes at file granularity first
  * (ExportCatalog), and this path only re-reads the one interrupted file.
  */
object RowGroupResume {

  /** One parquet row group: ordinal, row count, and the file-wide index of
    * its first row (cumulative sum of prior groups' counts).
    */
  final case class RowGroup(index: Int, rows: Long, firstRowIndex: Long)

  /** Read row-group boundaries from the parquet footer — driver-side, no
    * data pages touched.
    */
  def rowGroups(conf: Configuration, file: String): Seq[RowGroup] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
    try {
      var firstRow = 0L
      reader.getFooter.getBlocks.asScala.toSeq.zipWithIndex.map { case (b, i) =>
        val g = RowGroup(i, b.getRowCount, firstRow)
        firstRow += b.getRowCount
        g
      }
    } finally reader.close()
  }

  /** Tracking markers live under `trackingDir/<base name>-<path hash>/rg-<N>`.
    * The path hash disambiguates files that share a base name under
    * different directories (export layouts repeat names across date dirs) —
    * keying on the base name alone would let one file's markers silently
    * skip another's row groups. The hash is computed over the
    * fs-QUALIFIED path, so different spellings of the same file (relative,
    * absolute, with/without scheme) resolve to the same marker dir.
    */
  private def markerDir(fs: FileSystem, trackingDir: String, file: String): Path = {
    val qualified = fs.makeQualified(new Path(file)).toString
    val crc = new java.util.zip.CRC32
    crc.update(qualified.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val base = qualified.substring(qualified.lastIndexOf('/') + 1)
    new Path(trackingDir, f"$base-${crc.getValue}%08x")
  }

  /** Highest contiguously-recorded completed row group, or -1. Markers are
    * written in order, so the max is the resume point; a gap (possible only
    * from manual tampering) is clamped to the contiguous prefix to stay
    * safe — better to re-import a batch than to skip one.
    */
  def lastImported(fs: FileSystem, trackingDir: String, file: String): Int = {
    val dir = markerDir(fs, trackingDir, file)
    if (!fs.exists(dir)) return -1
    // strict rg-<digits> match: stray files in the marker dir (editor
    // temps, copy-tool leftovers like "rg-tmp") must be ignored, not
    // throw and permanently wedge resume for this file
    val done = fs.listStatus(dir).iterator
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("rg-") => s.substring(3) }
      .flatMap(_.toIntOption)
      .toSet
    var last = -1
    while (done.contains(last + 1)) last += 1
    last
  }

  def recordProgress(fs: FileSystem, trackingDir: String, file: String, lastGroup: Int): Unit = {
    val dir = markerDir(fs, trackingDir, file)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    // no-overwrite create gives true create-once semantics; an existing
    // marker (crash-replay of an already-recorded batch) is fine as-is —
    // markers are empty, so there is nothing to overwrite. Exact exception
    // type varies by FileSystem impl, so gate the swallow on existence.
    val p = new Path(dir, s"rg-$lastGroup")
    try fs.create(p, false).close()
    catch { case e: java.io.IOException => if (!fs.exists(p)) throw e }
  }

  /** The rows of row groups [from..to] as a DataFrame — a row-index range
    * over one parquet scan of `file`.
    */
  def groupRange(spark: SparkSession, file: String, groups: Seq[RowGroup], from: Int, to: Int): DataFrame = {
    val startRow = groups(from).firstRowIndex
    val endRow = groups(to).firstRowIndex + groups(to).rows
    spark.read.parquet(file)
      .withColumn("_rg_row", col("_metadata.row_index"))
      .where(col("_rg_row") >= startRow && col("_rg_row") < endRow)
      .drop("_rg_row")
  }

  /** Import `file` into `sink` in row-group-aligned batches of
    * `groupsPerBatch`, resuming after the last recorded batch. Returns the
    * number of batches actually imported this invocation.
    *
    * `shouldStop` is the reference's graceful-shutdown check
    * (`SHUTDOWN_EVENT` polled between steps, `db.py:54-56`
    * sleep_or_raise_shutdown): consulted between batches, so a stop lands
    * on a batch boundary — progress markers are already on disk and a
    * later invocation resumes exactly where this one stopped. Mid-batch
    * retry sleeps can abort the same way by throwing from the sink's
    * injectable `sleepMs`.
    */
  def importFull(
      spark: SparkSession,
      file: String,
      trackingDir: String,
      groupsPerBatch: Int,
      sink: DataFrame => Unit,
      shouldStop: () => Boolean = () => false): Int = {
    require(groupsPerBatch > 0)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(trackingDir).getFileSystem(conf)
    val groups = rowGroups(conf, file)
    val start = lastImported(fs, trackingDir, file) + 1
    var imported = 0
    val it = groups.drop(start).grouped(groupsPerBatch)
    while (it.hasNext && !shouldStop()) {
      val batch = it.next()
      sink(groupRange(spark, file, groups, batch.head.index, batch.last.index))
      // progress lands only after the sink committed: the crash window
      // replays the in-flight batch (idempotent under the upsert guard)
      batch.foreach(g => recordProgress(fs, trackingDir, file, g.index))
      imported += 1
    }
    imported
  }

  /** `(resume point, total groups)` — the reference's
    * `(last_row_group_imported, total_row_groups)` tracking row; a full is
    * "actually completed" when they meet (db.py:246-250).
    */
  def progress(spark: SparkSession, trackingDir: String, file: String): (Int, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(trackingDir).getFileSystem(conf)
    (lastImported(fs, trackingDir, file), rowGroups(conf, file).size)
  }
}
