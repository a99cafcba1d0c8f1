package graft

import org.apache.spark.sql.functions._

/** Pins for the KL / runs-test / keyness / capture-recapture batch. */
class KeynessRunsSpec extends SparkSpec {
  import spark.implicits._

  test("klPerSource: identical sources diverge zero; disjoint vocab " +
      "matches the hand-computed smoothed KL") {
    val same = Seq(("s1", "a b"), ("s2", "a b")).toDF("source", "text")
    val r0 = LanguageModel.klPerSource(same, col("text"), col("source"))
      .collect().map(_.getAs[Double]("kl_from_corpus"))
    assert(r0.toSeq == Seq(0.0, 0.0))
    // s1="a a", s2="b b": p=(0.75,0.25) vs q=(0.5,0.5) → KL = 0.1308
    val diff = Seq(("s1", "a a"), ("s2", "b b")).toDF("source", "text")
    val r1 = LanguageModel.klPerSource(diff, col("text"), col("source"))
      .collect().map(_.getAs[Double]("kl_from_corpus"))
    assert(r1.toSeq == Seq(0.1308, 0.1308))
  }

  test("runsTest: alternating series z > 0 path, exact-median days drop") {
    def daily(xs: Long*) = xs.zipWithIndex.map { case (x, i) => (i + 1, x) }
      .toDF("day", "x")
    val alt = Timeseries.runsTest(daily(1L, 10L, 1L, 10L, 1L, 10L),
      col("day"), col("x")).collect()(0)
    assert(alt.getAs[Long]("n_above") == 3L &&
      alt.getAs[Long]("n_below") == 3L && alt.getAs[Long]("n_runs") == 6L)
    assert(alt.getAs[Double]("z") == 1.8257)
    // median day (x=5) excluded: remaining F,T,T,F → 3 runs, E = 3 → z 0
    val med = Timeseries.runsTest(daily(1L, 9L, 5L, 9L, 1L),
      col("day"), col("x")).collect()(0)
    assert(med.getAs[Long]("n_above") == 2L &&
      med.getAs[Long]("n_below") == 2L && med.getAs[Long]("n_runs") == 3L)
    assert(med.getAs[Double]("z") == 0.0)
  }

  test("runsTest: one-sided series → zero variance → NULL z") {
    val df = Seq((1, 1L), (2, 1L), (3, 5L)).toDF("day", "x")
    // median 1 → the two x=1 days drop, only one signed day remains
    val r = Timeseries.runsTest(df, col("day"), col("x")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("keynessG2: exclusive terms score the Dunning G2, shared balanced " +
      "terms score zero; direction from integer cross-products") {
    val df = Seq((true, "x x x x c c"), (false, "y y y y c c"))
      .toDF("tgt", "text")
    val r = LanguageModel.keynessG2(df, col("text"), col("tgt"), k = 3)
      .collect().map(x => x.getString(0) ->
        (x.getAs[Double]("g2"), x.getString(4))).toMap
    assert(r("x") == ((5.5452, "over")))
    assert(r("y") == ((5.5452, "under")))
    assert(r("c")._1 == 0.0)
  }

  test("captureRecapture: counts consistent and the Chapman formula " +
      "reproduces from the reported pieces") {
    val df = (1L to 200L).map(Tuple1(_)).toDF("k")
    val r = Sketches.captureRecapture(df, col("k"), 40, 40).collect()(0)
    assert(r.getAs[Long]("n_true") == 200L)
    val (n1, n2, m) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
      r.getAs[Long]("overlap"))
    assert(m <= math.min(n1, n2) && n1 > 0 && n2 > 0)
    val expect = BigDecimal((n1 + 1).toDouble * (n2 + 1) / (m + 1) - 1.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("n_hat") == expect)
  }
}
