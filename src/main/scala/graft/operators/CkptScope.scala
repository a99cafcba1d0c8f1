package graft

import org.apache.spark.sql.DataFrame

/** Lifetime tracking for `localCheckpoint` blocks.
  *
  * The incremental-ingest operators ([[Dedup.ccIncremental]],
  * [[Dedup.batchIngestEdges]], [[Dedup.splitStableAssign]], …)
  * checkpoint several batch-bounded intermediates per call. In a one-shot
  * batch query those blocks die with the session — fine. Under a
  * STREAMING driver the same operators run once per micro-batch, and
  * `Dataset.unpersist` is a no-op for localCheckpoint plans (the blocks
  * belong to the wrapped RDD, not the CacheManager), so without explicit
  * frees a long-running stream accumulates checkpoint blocks unboundedly.
  *
  * A `CkptScope` is the deliberate-free convention
  * ([[org.apache.spark.sql.graft.CheckpointUtils]]) packaged per unit of
  * work: operators route every `localCheckpoint` through `scope.ckpt`,
  * and the caller frees the whole scope once the batch's durable output
  * is materialized. The default [[CkptScope.session]] scope tracks
  * nothing — batch callers keep today's behavior and cost.
  *
  * NOT safe to free early: a localCheckpoint TRUNCATES lineage, so any
  * lazy frame still referencing a freed checkpoint fails rather than
  * recomputes. Free only after every downstream consumer has
  * materialized (written to parquet / collected / checkpointed itself).
  */
final class CkptScope private[graft] (tracking: Boolean) {
  private val acquired = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** localCheckpoint `df` (eager, as always) and track the handle. */
  def ckpt(df: DataFrame): DataFrame = track(df.localCheckpoint())

  /** Track an ALREADY-checkpointed frame (must be the raw checkpoint
    * handle — a projection over it can't reach the blocks). */
  def track(ck: DataFrame): DataFrame = {
    if (tracking) synchronized { acquired += ck }
    ck
  }

  /** Free every tracked checkpoint's blocks. Callers must have
    * materialized all downstream results first (see class doc). */
  def freeAll(): Unit = synchronized {
    acquired.foreach(org.apache.spark.sql.graft.CheckpointUtils.unpersistCheckpoint)
    acquired.clear()
  }
}

object CkptScope {
  /** Non-tracking scope: checkpoints live until the session ends (the
    * one-shot batch-query default — nothing to free mid-flight). */
  val session: CkptScope = new CkptScope(false)

  /** Fresh tracking scope for one unit of work (one micro-batch). */
  def apply(): CkptScope = new CkptScope(true)
}
