package graft

import org.apache.spark.sql.functions._

/** Pins for the Wilson-CI / OR-CI / seasonal-index / Hill / scorecard
  * batch. */
class IntervalTailSpec extends SparkSpec {
  import spark.implicits._

  test("wilsonCi: p=0.5 at n=100 gives the textbook interval") {
    val df = (1 to 100).map(i => ("g", if (i <= 50) 1L else 0L))
      .toDF("g", "y")
    val r = Inference.wilsonCi(df, col("g"), col("y")).collect()(0)
    assert(r.getAs[Double]("rate") == 0.5)
    assert(r.getAs[Double]("ci_lo") == 0.4038)
    assert(r.getAs[Double]("ci_hi") == 0.5962)
  }

  test("oddsRatioCi: balanced table OR 1 with a symmetric CI; empty " +
      "cell → NULL") {
    val bal = (Seq.fill(10)((true, true)) ++ Seq.fill(10)((true, false)) ++
      Seq.fill(10)((false, true)) ++ Seq.fill(10)((false, false)))
      .toDF("e", "o")
    val r = Inference.oddsRatioCi(bal, col("e"), col("o")).collect()(0)
    assert(r.getAs[Double]("odds_ratio") == 1.0)
    val (lo, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(lo < 1.0 && hi > 1.0 && math.abs(lo * hi - 1.0) < 1e-3)
    val degenerate = Seq((true, true), (false, false)).toDF("e", "o")
    val r2 = Inference.oddsRatioCi(degenerate, col("e"), col("o"))
      .collect()(0)
    assert(r2.isNullAt(r2.fieldIndex("odds_ratio")))
  }

  test("seasonalIndexDow: constant series indexes 1.0 on every weekday") {
    val df = (1 to 21).map(i =>
      (java.sql.Date.valueOf(f"2024-01-$i%02d"), 7L)).toDF("day", "x")
    val rows = Timeseries.seasonalIndexDow(df, col("day"), col("x"))
      .collect()
    assert(rows.length == 7)
    rows.foreach(r => assert(r.getAs[Double]("seasonal_index") == 1.0))
  }

  test("hillTail: hand-computed alpha over a 3-deep tail") {
    val df = (Seq((400L, 1L), (200L, 2L), (100L, 3L), (50L, 4L),
      (10L, 5L))).toDF("v", "t")
    val r = Skew.hillTail(df, col("v"), col("t"), k = 3).collect()(0)
    assert(r.getAs[Long]("x_k") == 100L)
    // α = 2 / (ln 4 + ln 2) = 2 / 2.079441 = 0.9618
    assert(r.getAs[Double]("hill_alpha") == 0.9618)
  }

  test("corpusScorecard: census, dup rate, structural means, lang H") {
    val df = Seq((1L, "a b", "en", "s0"), (2L, "a b", "en", "s0"),
      (3L, "a a", "es", "s1"), (4L, "c d e", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val r = Curate.corpusScorecard(df, col("doc_id"), col("text"),
      col("lang"), col("source")).collect()(0)
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_sources") == 2L && r.getAs[Long]("n_langs") == 2L)
    assert(r.getAs[Double]("exact_dup_rate") == 0.25)
    assert(r.getAs[Double]("mean_tokens") == 2.25)
    assert(r.getAs[Double]("mean_ttr") == 0.875)
    assert(r.getAs[Double]("lang_shannon_h") == 0.5623)
  }
}
