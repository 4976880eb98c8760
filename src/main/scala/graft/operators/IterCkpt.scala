package graft.operators

import org.apache.spark.sql.DataFrame

/** Checkpoint policy for iterative DataFrame loops (connectedComponents,
  * pageRank, bfsDepths) — one definition of the local-vs-reliable choice
  * so every fixpoint operator offers the same cluster-prod contract.
  *
  * Iterative plans MUST cut lineage each pass: persist() caches data but
  * the logical plan still nests — by iteration n the plan TREE (and every
  * explain/UI string Spark renders of it) grows exponentially and the
  * driver burns minutes stringifying plans before running 100ms jobs.
  * `localCheckpoint(eager)` materializes AND truncates the plan to a leaf,
  * but pins blocks to the executors that computed them — lose ONE executor
  * mid-loop at 100 TB and the whole job dies. Passing a `checkpointDir`
  * selects RELIABLE checkpoints against a real (HDFS/object-store)
  * directory instead: survives executor loss at the cost of a
  * distributed-FS write per iteration (checkpoint files are reclaimed by
  * Spark's ContextCleaner with
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true`, else at app
  * end). Same loop either way.
  */
private[graft] final class IterCkpt(useReliable: Boolean) {

  def apply(df: DataFrame, eager: Boolean = true): DataFrame =
    if (useReliable) {
      // Dataset.checkpoint writes the checkpoint files in a SECOND job that
      // re-runs the full lineage; cache first so that job reads the cached
      // blocks instead of re-evaluating an expensive upstream (always eager
      // here — the lazy variant is a local-mode-only saving)
      val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ck = cached.checkpoint(true)
      cached.unpersist(false)
      ck
    } else df.localCheckpoint(eager)

  /** Release a frame this loop will never read again. Reliable checkpoints
    * hold no block-manager blocks; only local ones need the explicit drop —
    * without it, storage grows O(iterations × frame size) until RDD GC.
    */
  def release(df: DataFrame): Unit =
    if (!useReliable) org.apache.spark.sql.graft.ColumnBridge.unpersistLocalCheckpoint(df)
}

private[graft] object IterCkpt {
  /** `checkpointDir = None` → local checkpoints (test/bench default);
    * `Some(dir)` → reliable checkpoints rooted there (set only if the
    * application hasn't configured a checkpoint dir already —
    * setCheckpointDir appends a UUID subdir, so the stored value never
    * equals the argument).
    */
  def apply(df: DataFrame, checkpointDir: Option[String]): IterCkpt = {
    checkpointDir.foreach { d =>
      val sc = df.sparkSession.sparkContext
      if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(d)
    }
    new IterCkpt(checkpointDir.isDefined)
  }
}
