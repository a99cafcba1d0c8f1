package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-interval overlap self-join — the temporal sibling of
  * [[Spatial.gridJoinCount]]'s containment join: within each key, find
  * every pair of rows whose [start, end] day intervals overlap
  * (concurrent shipments, overlapping sessions, double-booked
  * resources).
  *
  * Scale shape: the naive spelling is a per-key theta self-join
  * (`a.s <= b.e AND b.s <= a.e`) — quadratic per key and, worse, a
  * BroadcastNestedLoopJoin if the key is omitted. This operator grids
  * the day axis: each interval explodes to the `bucketDays`-wide cells
  * it covers (narrow, ≤ span/bucket + 1 rows per interval), candidates
  * meet by (key, cell) EQUI-join, and the exact overlap predicate runs
  * only on co-located candidates. Each overlapping pair is emitted
  * EXACTLY once with no dedup pass: the pair is claimed by the cell
  * containing max(s_a, s_b) — the later start lies inside both
  * intervals whenever they overlap, so exactly one shared cell wins
  * (the q204 spatial trick, transplanted to one dimension).
  *
  * Integer day domain (caller converts timestamps via epoch-day
  * division); `id` must be a unique orderable long — `id_a < id_b`
  * both orients the pair and drops self-matches. Inverted (e < s) and
  * NULL rows drop up front. Buckets index with floor(s/w) on
  * non-negative epoch days (documented domain: post-1970 dates).
  */
object IntervalJoin {

  /** All overlapping pairs per key: (k, id_a, id_b, overlap_days),
    * overlap_days = min(e)−max(s)+1 (closed intervals). */
  def overlapPairs(df: DataFrame, key: Column, id: Column,
                   start: Column, end: Column, bucketDays: Int): DataFrame = {
    require(bucketDays >= 1, "bucketDays must be >= 1")
    val w = lit(bucketDays.toLong)
    val base = df.select(key.as("k"), id.cast("long").as("id"),
        start.cast("long").as("s"), end.cast("long").as("e"))
      .where(col("k").isNotNull && col("id").isNotNull &&
        col("s").isNotNull && col("e").isNotNull && col("e") >= col("s"))
    def exploded(suffix: String): DataFrame =
      base.select(col("k"),
          explode(sequence(floor(col("s") / w).cast("long"),
            floor(col("e") / w).cast("long"))).as("bk"),
          col("id").as(s"id$suffix"), col("s").as(s"s$suffix"),
          col("e").as(s"e$suffix"))
    exploded("_a").join(exploded("_b"), Seq("k", "bk"))
      .where(col("id_a") < col("id_b") &&
        col("s_a") <= col("e_b") && col("s_b") <= col("e_a") &&
        col("bk") === floor(greatest(col("s_a"), col("s_b")) / w).cast("long"))
      .select(col("k"), col("id_a"), col("id_b"),
        (least(col("e_a"), col("e_b")) -
          greatest(col("s_a"), col("s_b")) + lit(1L)).as("overlap_days"))
  }

  /** Per-key overlap report over [[overlapPairs]]: pair count and total
    * overlapping days — the aggregate a capacity/concurrency audit
    * reads. Keys with no overlapping pair don't appear (stated; LEFT
    * join the key dimension to densify if needed). */
  def overlapReport(df: DataFrame, key: Column, id: Column,
                    start: Column, end: Column, bucketDays: Int): DataFrame =
    overlapPairs(df, key, id, start, end, bucketDays)
      .groupBy("k")
      .agg(count(lit(1)).as("n_pairs"), sum("overlap_days").as("overlap_days"))
}
