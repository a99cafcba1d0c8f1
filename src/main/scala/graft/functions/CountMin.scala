package graft

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch: mergeable point-frequency estimation — the third
  * leg of the sketch toolkit next to KMV (distinct counts,
  * [[Sketches]]) and Misra-Gries (top-k membership, [[HeavyHitters]]).
  * CMS answers "how often did THIS key occur" in O(depth·width) space
  * with one-sided error (estimate ≥ truth, overshoot ≤ εN w.h.p. for
  * width = e/ε) — at 100 TB the full key-frequency map is
  * terabyte-sized, the sketch is 512 KB and merges associatively across
  * any partition/executor/day-file tree, so partial aggregation
  * collapses each map task to one sketch before any shuffle.
  *
  * Hashing: row d uses Spark's own XXH64 — the JVM side calls the same
  * `XXH64.hashLong(d, hashLong(key, 42))` chain that the built-in
  * `xxhash64(key, d)` EXPRESSION evaluates, so the in-plan estimate
  * lookup ([[estimates]]) and the sketch builder index identical
  * cells with zero custom hash code on the SQL side (and no wrapping
  * SQL arithmetic — ANSI mode is on in the driver sessions; XXH64
  * wraps internally where ANSI can't see it). Pinned by a unit test.
  */
object CountMin {
  val Depth = 4
  val Width = 16384

  import org.apache.spark.sql.catalyst.expressions.XXH64

  /** Cell index of `key` in hash row `d` — JVM twin of
    * `pmod(xxhash64(key, d), Width)`. */
  def cell(key: Long, d: Int): Int =
    java.lang.Math.floorMod(
      XXH64.hashLong(d.toLong, XXH64.hashLong(key, 42L)), Width.toLong).toInt

  /** Product wrapper so the UDAF output lands as a real
    * struct<counts: array<bigint>> (a kryo output encoder would give an
    * opaque binary column that `element_at` can't index). */
  case class CmsResult(counts: Array[Long])

  /** Mergeable CMS aggregator over long keys. The buffer is the flat
    * depth×width count matrix; reduce is Depth increments, merge is
    * element-wise add — both associative+commutative, so Spark's
    * partial-aggregation path (map-side combine) applies. */
  class Agg extends Aggregator[Long, Array[Long], CmsResult]
      with Serializable {
    override def zero: Array[Long] = new Array[Long](Depth * Width)
    override def reduce(b: Array[Long], x: Long): Array[Long] = {
      var d = 0
      while (d < Depth) { b(d * Width + cell(x, d)) += 1L; d += 1 }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): CmsResult = CmsResult(r)
    override def bufferEncoder: Encoder[Array[Long]] =
      Encoders.kryo[Array[Long]]
    override def outputEncoder: Encoder[CmsResult] =
      Encoders.product[CmsResult]
  }

  /** One-row (cms: array<long>) sketch of a long key column; NULL keys
    * drop (family convention). */
  def sketch(df: DataFrame, key: Column): DataFrame =
    df.select(key.cast("long").as("k")).where(col("k").isNotNull)
      .agg(udaf(new Agg(), Encoders.scalaLong)(col("k")).as("r"))
      .select(col("r.counts").as("cms"))

  /** Attach `est = min_d cms[d][h_d(key)]` to each row of `keys` — the
    * point query, evaluated in-plan: the sketch broadcasts (one row),
    * each depth's cell rides an `element_at`, the min is a `least`.
    * `key` must be the long key column of `keys`. */
  def estimates(keys: DataFrame, key: Column, cms: DataFrame): DataFrame = {
    val cells = (0 until Depth).map { d =>
      element_at(col("__cms"),
        (lit(d * Width) + pmod(xxhash64(key.cast("long"), lit(d.toLong)),
          lit(Width.toLong)) + lit(1)).cast("int"))
    }
    keys.crossJoin(broadcast(cms.select(col("cms").as("__cms"))))
      .withColumn("est", if (cells.size == 1) cells.head else least(cells: _*))
      .drop("__cms")
  }
}
