package graft

import org.apache.spark.sql.functions._

/** Pins for the Grubbs / partial-correlation / dup-histogram /
  * forecast-backtest batch. */
class BaselineStatsSpec extends SparkSpec {
  import spark.implicits._

  test("grubbs: hand-computed high-side outlier") {
    // {10,10,10,22}: mean 13, sd 6, maxdev·n = 36 → G = 36/(4·6) = 1.5
    val r = Inference.grubbs(Seq(10L, 10L, 10L, 22L).toDF("v"), col("v"))
      .collect()(0)
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("mean") == 13.0)
    assert(r.getAs[Double]("sd") == 6.0)
    assert(r.getAs[String]("side") == "high")
    assert(r.getAs[Double]("g_stat") == 1.5)
  }

  test("grubbs: low side flagged; constant data → NULL G") {
    val lo = Inference.grubbs(Seq(-22L, -10L, -10L, -10L).toDF("v"),
      col("v")).collect()(0)
    assert(lo.getAs[String]("side") == "low" &&
      lo.getAs[Double]("g_stat") == 1.5)
    val const = Inference.grubbs(Seq(5L, 5L, 5L).toDF("v"), col("v"))
      .collect()(0)
    assert(const.isNullAt(const.fieldIndex("g_stat")))
  }

  test("partialCorr: x+y = 2z exactly → r_partial = −1") {
    // rxy = 0, rxz = ryz = 1/√2; partial = (0 − 1/2)/(1/2) = −1
    val df = Seq((0L, 1L, 0L), (1L, 0L, 0L), (1L, 2L, 1L), (2L, 1L, 1L))
      .toDF("x", "y", "z")
    val r = Trend.partialCorr(df, col("x"), col("y"), col("z"))
      .collect()(0)
    assert(r.getAs[Double]("r_xy") == 0.0)
    assert(r.getAs[Double]("r_xz") == 0.7071)
    assert(r.getAs[Double]("r_yz") == 0.7071)
    assert(r.getAs[Double]("r_partial") == -1.0)
  }

  test("partialCorr: z fully explains x → NULL (no leftover variance)") {
    val df = Seq((1L, 3L, 1L), (2L, 1L, 2L), (3L, 2L, 3L))
      .toDF("x", "y", "z")
    val r = Trend.partialCorr(df, col("x"), col("y"), col("z"))
      .collect()(0)
    assert(r.getAs[Double]("r_xz") == 1.0)
    assert(r.isNullAt(r.fieldIndex("r_partial")))
  }

  test("clusterSizeHistogram: sizes, excess docs, chars saved vs min-id rep") {
    val df = Seq((1L, "A", 10L), (2L, "A", 12L), (3L, "A", 14L),
      (4L, "B", 5L), (5L, "B", 7L), (6L, "C", 9L))
      .toDF("doc_id", "text", "n_chars")
    val rows = Dedup.clusterSizeHistogram(df, col("text"), col("n_chars"),
      col("doc_id")).collect()
      .map(r => (r.getAs[Long]("cluster_size"), r.getAs[Long]("n_clusters"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_excess_docs"),
        r.getAs[Long]("chars_dropped")))
    assert(rows.toSeq == Seq((1L, 1L, 1L, 0L, 0L), (2L, 1L, 2L, 1L, 7L),
      (3L, 1L, 3L, 2L, 26L)))
  }

  test("backtestSeasonalNaive: ramp series, hand-computed MAE/RMSE/MAPE") {
    // x(t) = t over 14 days: every week-ahead error is 7
    val df = (1 to 14).map(i =>
      (java.sql.Date.valueOf(f"2024-01-$i%02d"), i.toLong)).toDF("day", "x")
    val r = Timeseries.backtestSeasonalNaive(df, col("day"), col("x"), 7)
      .collect()(0)
    assert(r.getAs[Long]("n_days") == 7L)
    assert(r.getAs[Double]("mae") == 7.0)
    assert(r.getAs[Double]("rmse") == 7.0)
    // Σ q6(7/x) for x=8..14 → 4,610,937 → /7e6 = 0.6587
    assert(r.getAs[Double]("mape") == 0.6587)
  }

  test("backtestSeasonalNaive: zero-actual days score MAE but not MAPE") {
    val df = Seq((java.sql.Date.valueOf("2024-01-01"), 4L),
      (java.sql.Date.valueOf("2024-01-08"), 0L)).toDF("day", "x")
    val r = Timeseries.backtestSeasonalNaive(df, col("day"), col("x"), 7)
      .collect()(0)
    assert(r.getAs[Long]("n_days") == 1L)
    assert(r.getAs[Double]("mae") == 4.0)
    assert(r.isNullAt(r.fieldIndex("mape")))
  }
}
