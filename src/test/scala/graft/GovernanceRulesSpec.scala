package graft

import org.apache.spark.sql.functions._

/** Pins for the erasure-audit / NB-margins / segmented-trend /
  * association-rules batch. */
class GovernanceRulesSpec extends SparkSpec {
  import spark.implicits._

  test("erasureAudit: lingering keys and rows counted against the list") {
    val data = Seq(1L, 1L, 2L, 3L).toDF("k")
    val ts = Seq(1L, 9L).toDF("tk")
    val r = Privacy.erasureAudit(data, col("k"), ts, col("tk"))
      .collect()(0)
    assert(r.getAs[Long]("n_tombstoned") == 2L)
    assert(r.getAs[Long]("n_lingering_keys") == 1L)
    assert(r.getAs[Long]("n_lingering_rows") == 2L)
    assert(r.getAs[Long]("n_rows") == 4L)
    assert(r.getAs[Double]("lingering_share") == 0.5)
  }

  test("erasureAudit: clean table reports zeros, not NULLs") {
    val r = Privacy.erasureAudit(Seq(5L).toDF("k"), col("k"),
      Seq(1L).toDF("tk"), col("tk")).collect()(0)
    assert(r.getAs[Long]("n_lingering_rows") == 0L &&
      r.getAs[Double]("lingering_share") == 0.0)
  }

  test("naiveBayesMargins: shares sum to 1 per language, buckets bounded, " +
      "separable corpus lands in high-margin buckets deterministically") {
    val df = Seq((1L, "cat cat dog cat", "en"), (2L, "dog cat cat cat", "en"),
      (3L, "perro gato gato gato", "es"), (4L, "gato perro perro gato", "es"))
      .toDF("id", "text", "lang")
    val rows = LanguageModel.naiveBayesMargins(df, col("id"), col("text"),
      col("lang")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0L && b <= 5L)
    }
    val shares = rows.groupBy(_.getString(0))
      .map { case (_, rs) => rs.map(_.getAs[Double]("share")).sum }
    shares.foreach(s => assert(math.abs(s - 1.0) < 1e-3))
    val again = LanguageModel.naiveBayesMargins(df, col("id"), col("text"),
      col("lang")).collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("ridge2 hinge basis recovers an exact piecewise-linear fit " +
      "(the q282 segmented-trend construction)") {
    // y = x for x<0, y = 2x for x>=0 → β1=1, β2=1, intercept 0
    val df = Seq((-2L, 0L, -2L), (-1L, 0L, -1L), (0L, 0L, 0L),
      (1L, 1L, 2L), (2L, 2L, 4L)).toDF("x1", "x2", "y")
    val r = Trend.ridge2(df, col("x1"), col("x2"), col("y"), lambda = 0.0)
      .collect()(0)
    assert(r.getAs[Double]("beta1") == 1.0)
    assert(r.getAs[Double]("beta2") == 1.0)
    assert(r.getAs[Double]("intercept") == 0.0)
  }

  test("assocRules: directional confidence differs across directions, " +
      "lift shared, ranked by confidence") {
    // b1{A,B}, b2{A,B}, b3{A}: A→B conf 2/3, B→A conf 1, lift 1 both
    val df = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (3L, "A"))
      .toDF("b", "it")
    val rows = Cooccur.assocRules(df, col("b"), col("it"),
      minSupport = 2L, k = 10).collect()
    assert(rows.length == 2)
    val first = rows(0)
    assert(first.getString(0) == "B" && first.getString(1) == "A")
    assert(first.getAs[Double]("confidence") == 1.0)
    val second = rows(1)
    assert(second.getString(0) == "A" &&
      second.getAs[Double]("confidence") == 0.6667)
    rows.foreach(r => assert(r.getAs[Double]("lift") == 1.0))
    assert(first.getAs[Double]("support") == 0.6667)
  }
}
