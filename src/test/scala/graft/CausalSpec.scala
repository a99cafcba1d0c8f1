package graft

import org.apache.spark.sql.functions._

/** Hand-computed pins for the [[Causal]] quasi-experimental family. */
class CausalSpec extends SparkSpec {
  import spark.implicits._

  test("ivWald: hand-computed Wald ratio") {
    // z=1: (x,y)=(2,10),(4,20); z=0: (1,5),(1,7)
    // dy = 15−6 = 9, dx = 3−1 = 2, beta = 4.5
    val df = Seq((1L, 2L, 10L), (1L, 4L, 20L), (0L, 1L, 5L), (0L, 1L, 7L))
      .toDF("z", "x", "y")
    val r = Causal.ivWald(df, col("z"), col("x"), col("y")).collect()(0)
    assert(r.getAs[Long]("n0") == 2L && r.getAs[Long]("n1") == 2L)
    assert(r.getAs[Double]("reduced_form") == 9.0)
    assert(r.getAs[Double]("first_stage") == 2.0)
    assert(r.getAs[Double]("beta_iv") == 4.5)
  }

  test("ivWald: dead first stage → NULL beta, reduced form still reported") {
    val df = Seq((1L, 2L, 10L), (0L, 2L, 3L)).toDF("z", "x", "y")
    val r = Causal.ivWald(df, col("z"), col("x"), col("y")).collect()(0)
    assert(r.getAs[Double]("first_stage") == 0.0)
    assert(r.getAs[Double]("reduced_form") == 7.0)
    assert(r.isNullAt(r.fieldIndex("beta_iv")))
  }

  test("rddLocalLinear: two-point side fits, bandwidth excludes far rows") {
    // left (−2,0),(−1,2): slope 2, icept 4; right (0,1),(1,1): slope 0,
    // icept 1 → effect = −3. r=10 outside bandwidth 5 must be ignored.
    val df = Seq((-2L, 0L), (-1L, 2L), (0L, 1L), (1L, 1L), (10L, 99L))
      .toDF("r", "y")
    val res = Causal.rddLocalLinear(df, col("r"), col("y"), bandwidth = 5L)
      .collect()(0)
    assert(res.getAs[Long]("n_left") == 2L && res.getAs[Long]("n_right") == 2L)
    assert(res.getAs[Double]("slope_left") == 2.0)
    assert(res.getAs[Double]("icept_left") == 4.0)
    assert(res.getAs[Double]("slope_right") == 0.0)
    assert(res.getAs[Double]("icept_right") == 1.0)
    assert(res.getAs[Double]("rdd_effect") == -3.0)
  }

  test("rddLocalLinear: single-point side → NULL fit on that side only") {
    val df = Seq((-1L, 3L), (0L, 1L), (1L, 2L)).toDF("r", "y")
    val r = Causal.rddLocalLinear(df, col("r"), col("y"), 5L).collect()(0)
    assert(r.isNullAt(r.fieldIndex("slope_left")),
      "one left point cannot identify a line")
    assert(r.getAs[Double]("slope_right") == 1.0)
  }

  def matchDf(rows: Seq[(Boolean, Long, Long, Long)]) =
    rows.toDF("tr", "s", "y", "tie")

  test("caliperMatchAtt: nearest control wins, out-of-caliper treated unmatched") {
    // treated s=100 (y=10): controls 90 (Δ10) vs 110 (Δ10)… use 90/112:
    // nearest = 90 → matched y 1. treated s=250 has no control in ±15.
    val df = matchDf(Seq((true, 100L, 10L, 1L), (true, 250L, 20L, 2L),
      (false, 90L, 1L, 3L), (false, 112L, 2L, 4L), (false, 400L, 9L, 5L)))
    val r = Causal.caliperMatchAtt(df, col("tr"), col("s"), col("y"),
      col("tie"), caliper = 15L).collect()(0)
    assert(r.getAs[Long]("n_treated") == 2L)
    assert(r.getAs[Long]("n_matched") == 1L)
    assert(r.getAs[Double]("att") == 9.0)
  }

  test("caliperMatchAtt: equidistant tie prefers at-or-below; same-score " +
      "controls collapse to the min-tie representative") {
    // controls at 95 (two rows, tie-min has y=5) and 105 (y=7); treated 100
    // → |Δ|=5 both sides → below wins → matched y = 5
    val df = matchDf(Seq((true, 100L, 10L, 1L),
      (false, 95L, 50L, 9L), (false, 95L, 5L, 2L), (false, 105L, 7L, 3L)))
    val r = Causal.caliperMatchAtt(df, col("tr"), col("s"), col("y"),
      col("tie"), caliper = 10L).collect()(0)
    assert(r.getAs[Long]("n_matched") == 1L)
    assert(r.getAs[Double]("att") == 5.0)
  }

  test("caliperMatchAtt: bucketed candidate join finds cross-bucket and " +
      "negative-score neighbors") {
    // treated −5 (bucket −1), control −14 (bucket −2, Δ=9 ≤ 10): the
    // adjacent-bucket explode must surface it despite different buckets
    val df = matchDf(Seq((true, -5L, 8L, 1L), (false, -14L, 3L, 2L)))
    val r = Causal.caliperMatchAtt(df, col("tr"), col("s"), col("y"),
      col("tie"), caliper = 10L).collect()(0)
    assert(r.getAs[Long]("n_matched") == 1L)
    assert(r.getAs[Double]("att") == 5.0)
  }

  test("caliperMatchAtt: no treated rows → zero counts, NULL att") {
    val df = matchDf(Seq((false, 10L, 1L, 1L)))
    val r = Causal.caliperMatchAtt(df, col("tr"), col("s"), col("y"),
      col("tie"), caliper = 10L).collect()(0)
    assert(r.getAs[Long]("n_treated") == 0L)
    assert(r.getAs[Long]("n_matched") == 0L)
    assert(r.isNullAt(r.fieldIndex("att")))
  }
}
