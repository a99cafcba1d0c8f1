package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and dataset splitting.
  *
  * Training pipelines need samples and train/val/test splits that are
  * REPRODUCIBLE (same rows on every run, every engine, any partitioning)
  * and STABLE under data growth (a row's assignment never depends on what
  * other rows exist). `rand()`-based sampling gives neither; hashing a key
  * column gives both: keep a row iff `hash(key) mod D < frac·D`. The hash
  * is the same md5-prefix used by [[Dedup.hash60]], so every operator here
  * is expressible in the DuckDB oracle verbatim.
  *
  * Scale shape: pure narrow predicates/projections — no shuffle, no state;
  * sampling 100 TB costs one scan.
  */
object Sampling {
  private val Denom = 1000000L

  /** Per-mille-precision deterministic sample: keep iff
    * hash(key ∥ salt) mod 1e6 < frac·1e6. `salt` decorrelates different
    * samples over the same keys. */
  def hashSample(df: DataFrame, key: Column, frac: Double, salt: String = ""): DataFrame = {
    require(frac >= 0 && frac <= 1, s"frac must be in [0,1], got $frac")
    df.where(pmod(Dedup.hash60(concat(key.cast("string"), lit(salt))), lit(Denom))
      < (frac * Denom).toLong)
  }

  /** Deterministic fixed-size per-group sample: the `n` rows of each group
    * whose key hashes smallest (hash order = an arbitrary-but-reproducible
    * shuffle; key tie-break keeps it total). Groups smaller than `n` keep
    * all rows. Null-keyed rows are dropped — consistent with
    * [[hashSample]], and it keeps the ordering engine-independent (Spark
    * sorts nulls first, SQL engines default to nulls last). One shuffle
    * keyed by the group — the standard "sample k docs per source/language/
    * domain" pattern for corpus balancing. */
  def stratifiedFixed(df: DataFrame, group: Column, key: Column, n: Int,
                      salt: String = ""): DataFrame = {
    require(n > 0, "n must be positive")
    import org.apache.spark.sql.expressions.Window
    val h = pmod(Dedup.hash60(concat(key.cast("string"), lit(salt))), lit(Denom))
    val w = Window.partitionBy(group).orderBy(h, key)
    df.where(key.isNotNull)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .drop("__rn")
  }

  /** Train/val/test assignment from cumulative fraction bands of the same
    * hash — every key lands in exactly one split, independent of all other
    * rows. `fracs` are (name, fraction) and must sum to 1; the last band
    * is the catch-all, so rounding in the cut points can never drop a
    * row. */
  def splitAssign(key: Column, fracs: Seq[(String, Double)], salt: String = ""): Column = {
    require(fracs.nonEmpty && math.abs(fracs.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val h = pmod(Dedup.hash60(concat(key.cast("string"), lit(salt))), lit(Denom))
    val cuts = fracs.scanLeft(0L) { case (acc, (_, f)) => acc + (f * Denom).toLong }.tail
    // last band is catch-all so rounding in the cut points can't drop rows
    fracs.init.zip(cuts.init).foldRight(lit(fracs.last._1): Column) {
      case (((name, _), cut), other) => when(h < cut, lit(name)).otherwise(other)
    }
  }

  /** Deterministic global shuffle + sharding — the training-order writer.
    * Training wants examples in a reproducible pseudo-random order, split
    * into fixed shard files; `ORDER BY rand()` is neither reproducible nor
    * scalable (one global sort). Instead: shard = hash(key ∥ salt) mod n
    * (stable under growth, like every assignment here), position = rank of
    * a SECOND, decorrelated hash within the shard. One shuffle keyed by
    * shard; the within-shard sort is per-shard local, so parallelism = shard
    * count and no global sort ever happens. Writers consume (shard,
    * position) as (file, offset). */
  def shuffleShards(df: DataFrame, key: Column, nShards: Int,
                    salt: String = ""): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    import org.apache.spark.sql.expressions.Window
    val shard = pmod(Dedup.hash60(concat(key.cast("string"), lit(salt))), lit(nShards))
    // "$pos" prefix decorrelates the position hash from the shard hash
    val posH = pmod(Dedup.hash60(concat(lit("$pos"), key.cast("string"), lit(salt))),
      lit(Denom))
    val w = Window.partitionBy(col("__shard")).orderBy(posH, key)
    df.withColumn("__shard", shard)
      .withColumn("position", row_number().over(w).cast("long"))
      .withColumnRenamed("__shard", "shard")
  }
}
