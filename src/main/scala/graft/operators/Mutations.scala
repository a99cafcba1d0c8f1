package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch mutation semantics over immutable storage — the MERGE/upsert
  * story for a parquet-staged lake without a table format. Complements
  * [[Sessionize.scdIntervals]] (SCD-2 history): this is SCD-1, latest
  * version wins, no history kept.
  */
object Mutations {
  /** Key-wise upsert (SCD-1 MERGE): every key present in `changes`
    * replaces its base row; keys only in `base` survive unchanged; keys
    * only in `changes` are inserts. Both inputs must be key-unique (the
    * caller dedups first — e.g. [[Dedup.latestSnapshot]] for a CDC feed).
    *
    * Scale shape: one left-anti join on the key (both sides shuffle on
    * the same key — at 100 TB the base side's shuffle can be avoided
    * entirely by bucketing the base on the key, [[Staging.stageBucketed]])
    * + a union. No window, no full-table rewrite logic here: writers pair
    * this with partition-overwrite so only partitions containing changed
    * keys rewrite. */
  def upsert(base: DataFrame, changes: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    base.join(changes.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(changes)
  }

  /** Anti-delete: remove every base row whose key appears in `tombstones`.
    * The deletion half of a CDC apply — same single-anti-join shape. */
  def applyDeletes(base: DataFrame, tombstones: DataFrame,
                   keys: Seq[String]): DataFrame =
    base.join(tombstones.select(keys.map(col): _*), keys, "left_anti")

  /** Incremental aggregate-state maintenance: merge a materialized
    * ADDITIVE aggregate state (counts / integer sums keyed by `keys`)
    * with a freshly aggregated delta — the pattern that turns "recompute
    * the daily rollup over the whole corpus" into "aggregate today's
    * partition and fold it in". Correct exactly when every measure is
    * additive (sum/count — avg and distinct must be carried as
    * sum+count / sketches); the merged state is bit-identical to a full
    * recompute because integer partial sums re-associate freely.
    *
    * Scale shape: union + one keyed hash-aggregate — the state side is
    * key-cardinality (small), the delta side is one partition's worth;
    * neither re-reads history. At 100 TB pair it with partition-overwrite
    * of only the touched state keys. */
  def mergeAggState(state: DataFrame, delta: DataFrame, keys: Seq[String],
                    sums: Seq[String]): DataFrame = {
    require(keys.nonEmpty && sums.nonEmpty, "need key and sum columns")
    val exprs = sums.map(c => sum(col(c)).as(c))
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(exprs.head, exprs.tail: _*)
  }
}
