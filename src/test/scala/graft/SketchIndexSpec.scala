package graft

import org.apache.spark.sql.functions._

/** Pins for the histogram-sketch / blocking-report / dwell-time /
  * price-index batch. */
class SketchIndexSpec extends SparkSpec {
  import spark.implicits._

  test("histogramQuantiles: 1..100 uniform, hand-computed bin interp") {
    val df = (1L to 100L).toDF("v")
    val r = Sketches.histogramQuantiles(df, col("v"), lo = 0L, hi = 100L,
      bins = 10, qs = Seq(0.5)).collect()(0)
    assert(r.getAs[Long]("n") == 100L)
    assert(r.getAs[Double]("estimate") == 51.0)
    assert(r.getAs[Double]("exact") == 50.5)
    assert(r.getAs[Double]("abs_err") == 0.5)
  }

  test("histogramQuantiles: out-of-range values clamp into edge bins") {
    val df = Seq(-50L, 1L, 2L, 3L, 999L).toDF("v")
    val rows = Sketches.histogramQuantiles(df, col("v"), 0L, 10L, 5,
      Seq(0.1, 0.9)).collect()
    assert(rows.length == 2, "clamped rows must not vanish")
    assert(rows.forall(_.getAs[Long]("n") == 5L))
  }

  test("blockingReport: pair budget and reduction vs all-pairs") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"),
      (6L, "c")).toDF("id", "blk")
    val r = Dedup.blockingReport(df, col("id"), col("blk")).collect()(0)
    assert(r.getAs[Long]("n_docs") == 6L && r.getAs[Long]("n_blocks") == 3L)
    assert(r.getAs[Long]("largest_block") == 3L)
    assert(r.getAs[Long]("n_candidate_pairs") == 4L)
    assert(r.getAs[Double]("reduction_ratio") == 0.7333)
  }

  test("dwellTime: gap attributed to the current state, last event free") {
    val df = Seq((1L, 0L, 1L, "A"), (1L, 10000000L, 2L, "B"),
      (1L, 25000000L, 3L, "A")).toDF("u", "us", "eid", "et")
    val r = Sequences.dwellTime(df, col("u"), col("us"), col("eid"),
        col("et")).collect()
      .map(x => x.getString(0) -> (x.getAs[Long]("n_intervals"),
        x.getAs[Double]("total_s"))).toMap
    assert(r("A") == ((1L, 10.0)))
    assert(r("B") == ((1L, 15.0)))
  }

  test("priceIndex: uniform doubling → 2.0 across all three indices; " +
      "offsetting moves → 1.0") {
    val up = Seq((1L, 1994, 1000L, 10L), (1L, 1995, 2000L, 10L))
      .toDF("it", "p", "c", "q")
    val r = Derive.priceIndex(up, col("it"), col("p"), col("c"), col("q"),
      "1994", "1995").collect()(0)
    assert(r.getAs[Double]("laspeyres") == 2.0)
    assert(r.getAs[Double]("paasche") == 2.0)
    assert(r.getAs[Double]("fisher") == 2.0)
    val mix = Seq((1L, 1994, 1000L, 10L), (1L, 1995, 2000L, 10L),
      (2L, 1994, 2000L, 10L), (2L, 1995, 1000L, 10L))
      .toDF("it", "p", "c", "q")
    val r2 = Derive.priceIndex(mix, col("it"), col("p"), col("c"),
      col("q"), "1994", "1995").collect()(0)
    assert(r2.getAs[Long]("n_items") == 2L)
    assert(r2.getAs[Double]("laspeyres") == 1.0)
    assert(r2.getAs[Double]("paasche") == 1.0)
  }

  test("priceIndex: items missing a period drop from the basket") {
    val df = Seq((1L, 1994, 1000L, 10L), (1L, 1995, 1500L, 10L),
      (9L, 1994, 500L, 5L)).toDF("it", "p", "c", "q")
    val r = Derive.priceIndex(df, col("it"), col("p"), col("c"), col("q"),
      "1994", "1995").collect()(0)
    assert(r.getAs[Long]("n_items") == 1L)
    assert(r.getAs[Double]("laspeyres") == 1.5)
  }
}
