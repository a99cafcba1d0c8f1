package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew remedies for shuffle keys with hot values.
  *
  * AQE's skew-join handling (on by default) splits oversized sort-merge
  * partitions at runtime and is the first line of defense. Explicit
  * salting remains the tool when AQE can't help: broadcast-ineligible
  * dimension joins with a few catastrophic keys, deterministic layout
  * requirements, or pre-shuffle aggregation of a hot key.
  */
object Skew {
  /** Salted equi-join: scatter the probe side's hot keys across `salts`
    * sub-keys and replicate the (small) build side once per salt. The
    * hot key's rows land on `salts` reducers instead of one; the build
    * side grows `salts`×, so keep it the smaller input. Inner-join
    * equivalence with the unsalted join is pinned by the unit suite. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // deterministic-within-run scatter; any well-spread per-row value works
    val saltedBig = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation over a salted key: partial agg on (key, salt),
    * final agg on key. Spark's hash aggregate already does map-side
    * partial aggregation, which makes this unnecessary for plain
    * `groupBy(key)` — it exists for aggregations where the partial state
    * itself is heavy per key (e.g. collect-style or sketch merges), so a
    * hot key's state is built on `salts` tasks before one final merge. */
  def saltedTwoPhase(df: DataFrame, key: Column, value: Column, salts: Int,
                     partial: Column => Column, merge: Column => Column): DataFrame = {
    require(salts > 0, "salts must be positive")
    df.select(key.as("__k"), value.as("__v"))
      .withColumn("__salt", pmod(hash(monotonically_increasing_id()), lit(salts)))
      .groupBy(col("__k"), col("__salt")).agg(partial(col("__v")).as("__p"))
      .groupBy(col("__k")).agg(merge(col("__p")).as("__m"))
      .select(col("__k"), col("__m"))
  }
}
