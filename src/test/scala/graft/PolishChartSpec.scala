package graft

import org.apache.spark.sql.functions._

/** Pins for the control-chart / term-burstiness / median-polish /
  * crawl-decay batch. */
class PolishChartSpec extends SparkSpec {
  import spark.implicits._

  test("controlChartI: hand-computed limits and the single breach") {
    val df = Seq((1, 10L), (2, 10L), (3, 10L), (4, 10L), (5, 30L))
      .toDF("day", "x")
    val r = Timeseries.controlChartI(df, col("day"), col("x")).collect()(0)
    assert(r.getAs[Long]("n_days") == 5L)
    assert(r.getAs[Double]("mean") == 14.0)
    assert(r.getAs[Double]("mr_bar") == 5.0)
    assert(r.getAs[Double]("ucl") == 27.3)
    assert(r.getAs[Double]("lcl") == 0.7)
    assert(r.getAs[Long]("n_violations") == 1L)
  }

  test("termBurstiness: clustered term bursts, sprinkled term Poisson") {
    val df = (Seq((1L, "x x x x y")) ++ (2L to 5L).map((_, "y")))
      .toDF("doc_id", "text")
    val rows = LanguageModel.termBurstiness(df, col("doc_id"), col("text"),
      minDf = 1L, k = 5).collect()
    assert(rows(0).getString(0) == "x" &&
      rows(0).getAs[Double]("fano") == 3.2)
    assert(rows(1).getString(0) == "y" &&
      rows(1).getAs[Double]("fano") == 0.0)
  }

  test("medianPolish: additive matrix residuals vanish; a planted " +
      "interaction survives the sweep") {
    val base = for (r <- Seq(0L, 10L, 20L); c <- Seq(0L, 1L, 2L))
      yield (s"r$r", s"c$c", r + c + (if (r == 20L && c == 2L) 5L else 0L))
    val df = base.toDF("r", "c", "v")
    val res = Inference.medianPolish(df, col("r"), col("c"), col("v"))
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        x.getAs[Double]("residual")).toMap
    assert(res(("r20", "c2")) == 5.0)
    (res - (("r20", "c2"))).values.foreach(v => assert(v == 0.0))
  }

  test("crawlDecay: early rich docs vs late repetitive docs") {
    val df = ((1L to 2L).map((_, "a b c d")) ++
      (3L to 8L).map((_, "a b c")) ++ (9L to 10L).map((_, "z z")))
      .toDF("doc_id", "text")
    val rows = Curate.crawlDecay(df, col("doc_id"), col("text"), bands = 5)
      .collect().map(r => r.getAs[Long]("band") ->
        (r.getAs[Double]("mean_tokens"), r.getAs[Double]("mean_ttr")))
      .toMap
    assert(rows(1L) == ((4.0, 1.0)))
    assert(rows(5L) == ((2.0, 0.5)))
  }
}
