package graft

import org.apache.spark.sql.functions._

/** Pins for the log-odds / Bhattacharyya / partition-agreement /
  * V-measure batch. */
class AgreementSpec extends SparkSpec {
  import spark.implicits._

  test("logOddsPrior: exclusive terms polarize, shared terms sit near 0") {
    val df = Seq((true, "x x x x c c"), (false, "y y y y c c"))
      .toDF("tgt", "text")
    val rows = LanguageModel.logOddsPrior(df, col("text"), col("tgt"),
      k = 3).collect()
    assert(rows(0).getString(0) == "x" &&
      rows(0).getAs[Double]("z_log_odds") > 0.5)
    assert(rows.last.getString(0) == "y" &&
      rows.last.getAs[Double]("z_log_odds") < -0.5)
    val c = rows.find(_.getString(0) == "c").get
    assert(math.abs(c.getAs[Double]("z_log_odds")) < 0.1)
    // antisymmetric construction → antisymmetric scores
    assert(rows(0).getAs[Double]("z_log_odds") ==
      -rows.last.getAs[Double]("z_log_odds"))
  }

  test("bhattacharyya: identical densities BC 1 / dist 0; disjoint BC 0 " +
      "with NULL distance") {
    val same = ((1L to 10L).map(("A", _)) ++ (1L to 10L).map(("B", _)))
      .toDF("l", "v")
    val r = Drift.bhattacharyya(same, col("l"), col("v"), "A", "B",
      lo = 0L, hi = 20L, bins = 10).collect()(0)
    assert(r.getAs[Double]("bc") == 1.0)
    assert(r.getAs[Double]("bhattacharyya_dist") == 0.0)
    val disj = ((1L to 5L).map(("A", _)) ++ (501L to 505L).map(("B", _)))
      .toDF("l", "v")
    val r2 = Drift.bhattacharyya(disj, col("l"), col("v"), "A", "B",
      lo = 0L, hi = 1000L, bins = 10).collect()(0)
    assert(r2.getAs[Double]("bc") == 0.0)
    assert(r2.isNullAt(r2.fieldIndex("bhattacharyya_dist")))
  }

  test("partitionAgreement: identical partitions ARI 1; crossed 2x2 " +
      "layout ARI −0.5") {
    val same = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"))
      .toDF("u", "v")
    val r = RankEval.partitionAgreement(same, col("u"), col("v"))
      .collect()(0)
    assert(r.getAs[Double]("ari") == 1.0 &&
      r.getAs[Double]("purity") == 1.0)
    val crossed = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("u", "v")
    val r2 = RankEval.partitionAgreement(crossed, col("u"), col("v"))
      .collect()(0)
    assert(r2.getAs[Double]("ari") == -0.5)
    assert(r2.getAs[Double]("purity") == 0.5)
  }

  test("vMeasure: identical partitions score 1s; a constant side gives " +
      "h 1 / c 0 by the zero-entropy convention") {
    val same = Seq(("a", "a"), ("a", "a"), ("b", "b")).toDF("u", "v")
    val r = RankEval.vMeasure(same, col("u"), col("v")).collect()(0)
    assert(r.getAs[Double]("homogeneity") == 1.0)
    assert(r.getAs[Double]("completeness") == 1.0)
    assert(r.getAs[Double]("v_measure") == 1.0)
    val const = Seq(("z", "a"), ("z", "a"), ("z", "b"), ("z", "b"))
      .toDF("u", "v")
    val r2 = RankEval.vMeasure(const, col("u"), col("v")).collect()(0)
    assert(r2.getAs[Double]("homogeneity") == 1.0)
    assert(r2.getAs[Double]("completeness") == 0.0)
    assert(r2.getAs[Double]("v_measure") == 0.0)
  }
}
