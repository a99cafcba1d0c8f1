package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Block management for localCheckpoint-ed DataFrames.
  *
  * `Dataset.unpersist` goes through the CacheManager, which has no entry
  * for a checkpointed plan — so it is a NO-OP for localCheckpoint results.
  * The blocks belong to the internal RDD wrapped by the plan's
  * [[LogicalRDD]] leaf (private[sql], hence this package). Iterative
  * algorithms that supersede checkpoints every round use this to free the
  * previous round's blocks deterministically instead of waiting for the
  * ContextCleaner to notice the dropped reference after a driver GC.
  */
object CheckpointUtils {
  /** Unpersist the checkpointed RDD under `df`, if its plan is one. */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    }
}
