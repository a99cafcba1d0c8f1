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

  test("partitionAgreement: ARI exact in the Pa*Pb-overflows-Long regime " +
      "(decimal(38,0) products vs a BigInt reference)") {
    // 400k rows in coarse 2x2 clusterings: Pa ~ Pb ~ C2(200k) ~ 2e10, so
    // Pa*Pb ~ 4e20 >> Long.MaxValue (9.2e18) — the pre-r9 long product
    // wrapped here and produced a silently wrong ARI
    val n = 400000
    val df = spark.range(n).selectExpr(
      "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS u",
      // imperfectly aligned second labeling — keeps ARI off the 1.0 /
      // degenerate special cases
      "CASE WHEN id % 10 < 4 THEN 'x' ELSE 'y' END AS v")
    val r = RankEval.partitionAgreement(df, col("u"), col("v"))
      .collect()(0)
    // BigInt reference replaying the same exact-rational seal
    val cells = df.groupBy("u", "v").count().collect()
      .map(x => ((x.getString(0), x.getString(1)), x.getLong(2))).toMap
    def c2(x: BigInt) = x * (x - 1) / 2
    val pij = cells.values.map(v => c2(BigInt(v))).sum
    val pa = cells.groupBy(_._1._1).values
      .map(g => c2(BigInt(g.values.sum))).sum
    val pb = cells.groupBy(_._1._2).values
      .map(g => c2(BigInt(g.values.sum))).sum
    val c2n = c2(BigInt(n))
    val anum = 2 * c2n * pij - 2 * pa * pb
    val aden = c2n * (pa + pb) - 2 * pa * pb
    val sealed4 =
      (if (anum < 0) -((2 * (-anum) * 10000 + aden) / (2 * aden))
       else (2 * anum * 10000 + aden) / (2 * aden)).toDouble / 10000.0
    assert(pa * pb > BigInt(Long.MaxValue),
      "fixture must actually be in the overflow regime")
    assert(r.getAs[Double]("ari") == sealed4)
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
