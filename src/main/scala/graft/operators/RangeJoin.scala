package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed range (interval) join — another operator Spark only plans
  * as a theta join (BroadcastNestedLoop / cartesian + filter), which dies
  * at scale.
  *
  * Technique: time-bucket both sides. A left row's window
  * [ts, ts+window) covers a bounded number of buckets (explode to one row
  * per covered bucket); a right row lives in exactly ONE bucket — so the
  * candidate set comes from an equi-join on the bucket id and each
  * (left, right) pair meets at most once (no dedup pass needed). The
  * exact range predicate filters candidates. Shuffle volume is
  * |left|·(window/bucket + 1) + |right| rows keyed by bucket — linear,
  * versus the quadratic pair enumeration of the naive plan. Bucket size
  * trades replication (small buckets) against candidate slop (big
  * buckets); window-sized buckets mean ≤2 replicas per left row.
  */
object RangeJoin {
  /** For each left row, count right rows with `rightTs` in
    * [leftTs, leftTs + windowSec). Left rows with no matches keep count 0.
    * Timestamps compare at microsecond precision.
    *
    * Preconditions: `leftId` must be row-unique (rows sharing an id merge
    * into one count), and left rows with NULL `leftTs` have no window —
    * they are excluded from the output, not emitted with count 0. */
  def countInWindow(left: DataFrame, leftId: Column, leftTs: Column,
                    right: DataFrame, rightTs: Column,
                    windowSec: Long, bucketSec: Long): DataFrame = {
    require(windowSec > 0 && bucketSec > 0, "window and bucket must be positive")
    val winUs = windowSec * 1000000L
    val bktUs = bucketSec * 1000000L
    val l = left.select(leftId.as("__lid"), unix_micros(leftTs).as("__lus"))
      .withColumn("__bkt", explode(sequence(
        floor(col("__lus") / bktUs).cast("long"),
        floor((col("__lus") + winUs - 1) / bktUs).cast("long"))))
    val r = right.select(unix_micros(rightTs).as("__rus"))
      .withColumn("__bkt", floor(col("__rus") / bktUs).cast("long"))
    l.join(r,
        l("__bkt") === r("__bkt") &&
          col("__rus") >= col("__lus") && col("__rus") < col("__lus") + winUs,
        "left")
      .groupBy(col("__lid"))
      .agg(count(col("__rus")).as("n_in_window"))
  }
}
