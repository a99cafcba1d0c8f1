package graft

import org.apache.spark.sql.functions._

/** Pins for the Nelson-Aalen / ANCOVA / tf-idf-cosine / burstiness
  * batch. */
class HazardBurstSpec extends SparkSpec {
  import spark.implicits._

  test("nelsonAalen: hand-computed hazard increments accumulate") {
    // t=1: 4 at risk, 2 events → +0.5; t=2: 2 at risk, 1 event → +0.5
    val df = Seq((1L, 1), (1L, 1), (2L, 1), (2L, 0)).toDF("t", "ev")
    val rows = Survival.nelsonAalen(df, col("t"), col("ev")).collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n_risk") == 4L &&
      rows(0).getAs[Double]("cum_hazard") == 0.5)
    assert(rows(1).getAs[Long]("n_risk") == 2L &&
      rows(1).getAs[Double]("cum_hazard") == 1.0)
  }

  test("ancova: common slope pooled, means adjusted to the grand x̄") {
    // a: y = 2x at x∈{0,1,2}; b: y = 10 + 2x at x∈{2,3,4}
    // β_w = 2; grand x̄ = 2 → adj_a = 2−2(1−2) = 4, adj_b = 16−2(3−2) = 14
    val df = Seq(("a", 0L, 0L), ("a", 1L, 2L), ("a", 2L, 4L),
      ("b", 2L, 14L), ("b", 3L, 16L), ("b", 4L, 18L)).toDF("g", "x", "y")
    val r = Trend.ancova(df, col("g"), col("x"), col("y")).collect()
      .map(x => x.getString(0) -> (x.getAs[Double]("mean_y"),
        x.getAs[Double]("slope_w"), x.getAs[Double]("adj_mean_y"))).toMap
    assert(r("a") == ((2.0, 2.0, 4.0)))
    assert(r("b") == ((16.0, 2.0, 14.0)))
  }

  test("ancova: zero covariate variance everywhere → NULL slope") {
    val df = Seq(("a", 5L, 1L), ("a", 5L, 3L), ("b", 5L, 9L))
      .toDF("g", "x", "y")
    val r = Trend.ancova(df, col("g"), col("x"), col("y")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("slope_w")))
  }

  test("tfidfCosinePairs: identical docs score 1.0; disjoint vocab none") {
    val df = Seq((1L, "aa bb cc", "s"), (2L, "aa bb cc", "s"),
      (3L, "dd ee", "s")).toDF("doc_id", "text", "source")
    val rows = Curate.tfidfCosinePairs(df, col("doc_id"), col("text"),
      col("source"), minCos = 0.6).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("id_a") == 1L &&
      rows(0).getAs[Long]("id_b") == 2L)
    assert(rows(0).getAs[Double]("cos") == 1.0)
  }

  test("tfidfCosinePairs: corpus-wide terms weigh zero → degenerate " +
      "vectors yield NULL cosine, filtered not crashed") {
    val df = Seq((1L, "aa", "s"), (2L, "aa", "s"), (3L, "aa bb", "s"))
      .toDF("doc_id", "text", "source")
    assert(Curate.tfidfCosinePairs(df, col("doc_id"), col("text"),
      col("source"), minCos = 0.0).count() == 0L)
  }

  def tsAt(day: Int, n: Int): Seq[java.sql.Timestamp] =
    (1 to n).map(i =>
      new java.sql.Timestamp(day * 86400000L + i * 1000L))

  test("burstiness: bursty vs perfectly periodic key, zero days filled") {
    // A: 2 events day0, 1 event day2 (day1 silent) → Fano 2/3, B ≈ −0.101
    // B: 1 event each of days 0,1,2 → Fano 0, B = −1
    val rows = (tsAt(0, 2).map(("A", _)) ++ tsAt(2, 1).map(("A", _)) ++
      (0 to 2).flatMap(d => tsAt(d, 1).map(("B", _))))
    val df = rows.toDF("k", "ts")
    val r = Timeseries.burstiness(df, col("k"), col("ts")).collect()
      .map(x => x.getString(0) -> (x.getAs[Long]("n_days"),
        x.getAs[Double]("fano"), x.getAs[Double]("burstiness"))).toMap
    assert(r("A") == ((3L, 0.6667, -0.101)))
    assert(r("B") == ((3L, 0.0, -1.0)))
  }

  test("diversityIndices: even two-category mix vs single-category group") {
    val df = Seq(("g", "a"), ("g", "a"), ("g", "b"), ("g", "b"),
      ("h", "a"), ("h", "a")).toDF("grp", "cat")
    val r = Profile.diversityIndices(df, col("grp"), col("cat"))
      .collect()
    val g = r.find(_.getString(0) == "g").get
    assert(g.getAs[Double]("shannon_h") == 0.6931)
    assert(g.getAs[Double]("evenness") == 1.0)
    assert(g.getAs[Double]("simpson_d") == 0.5)
    val h = r.find(_.getString(0) == "h").get
    assert(h.getAs[Double]("shannon_h") == 0.0)
    assert(h.isNullAt(h.fieldIndex("evenness")),
      "single category: evenness undefined, not 1")
    assert(h.getAs[Double]("simpson_d") == 0.0)
  }

  test("giniSplitGain: perfect split gains full parent impurity; " +
      "empty-side split gains nothing") {
    val df = Seq((1L, 1L), (1L, 1L), (2L, 0L), (2L, 0L)).toDF("x", "y")
    val r = Inference.giniSplitGain(df, col("x"), col("y"),
        thresholds = Seq(0L, 1L)).collect()
      .map(x => x.getAs[Long]("threshold") -> x.getAs[Double]("gain"))
      .toMap
    assert(r(1L) == 0.5, "x<=1 separates classes perfectly")
    assert(r(0L) == 0.0, "empty left side cannot gain")
  }

  test("peaks: interior peak found with prominence; shoulders and " +
      "boundaries are not peaks") {
    val df = (1 to 9).zip(Seq(1L, 1L, 1L, 5L, 9L, 5L, 1L, 1L, 1L))
      .toDF("day", "x")
    val r3 = Timeseries.peaks(df, col("day"), col("x"), w = 3,
      minProminence = 3L).collect()
    assert(r3.length == 1)
    assert(r3(0).getAs[Int]("day") == 5 &&
      r3(0).getAs[Long]("prominence") == 4L)
    assert(Timeseries.peaks(df, col("day"), col("x"), w = 3,
      minProminence = 5L).count() == 0L)
  }
}
