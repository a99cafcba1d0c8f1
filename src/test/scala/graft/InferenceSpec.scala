package graft

import org.apache.spark.sql.functions._

/** Hand-computed pins for the [[Inference]] classical-test family. */
class InferenceSpec extends SparkSpec {
  import spark.implicits._

  test("anovaF: hand-computed three-group F") {
    // a:{1,2,3} b:{2,4,6} c:{5,5,5} → SSB=14, SSW=10, F=(14/2)/(10/6)=4.2
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 2L), ("b", 4L),
      ("b", 6L), ("c", 5L), ("c", 5L), ("c", 5L)).toDF("g", "v")
    val r = Inference.anovaF(df, col("g"), col("v")).collect()(0)
    assert(r.getAs[Long]("k_groups") == 3L)
    assert(r.getAs[Long]("n_rows") == 9L)
    assert(r.getAs[Double]("ss_between") == 14.0)
    assert(r.getAs[Double]("ss_within") == 10.0)
    assert(r.getAs[Double]("f_stat") == 4.2)
  }

  test("anovaF: null groups and values dropped; single group → NULL F") {
    val df = Seq(("a", java.lang.Long.valueOf(1L)),
      ("a", java.lang.Long.valueOf(3L)), ("a", null),
      (null, java.lang.Long.valueOf(9L))).toDF("g", "v")
    val r = Inference.anovaF(df, col("g"), col("v")).collect()(0)
    assert(r.getAs[Long]("k_groups") == 1L && r.getAs[Long]("n_rows") == 2L)
    assert(r.isNullAt(r.fieldIndex("f_stat")),
      "k=1 must yield SQL-NULL F, not a division artifact")
  }

  test("brownForsythe: deviations taken from group medians, F hand-computed") {
    // a={0,0,0,10}: med 0 → d2={0,0,0,20}; b={5,7}: 2·med=12 → d2={2,2}
    // SSB=12, SSW=300, F=(12/1)/(300/4)=0.16
    val df = Seq(("a", 0L), ("a", 0L), ("a", 0L), ("a", 10L),
      ("b", 5L), ("b", 7L)).toDF("g", "v")
    val r = Inference.brownForsythe(df, col("g"), col("v")).collect()(0)
    assert(r.getAs[Double]("ss_between") == 12.0)
    assert(r.getAs[Double]("ss_within") == 300.0)
    assert(r.getAs[Double]("f_stat") == 0.16)
  }

  test("brownForsythe: identical deviations in every group → zero SSW, NULL F") {
    val df = Seq(("a", 0L), ("a", 10L), ("b", 3L), ("b", 13L))
      .toDF("g", "v")
    val r = Inference.brownForsythe(df, col("g"), col("v")).collect()(0)
    assert(r.getAs[Double]("ss_within") == 0.0)
    assert(r.isNullAt(r.fieldIndex("f_stat")))
  }

  test("cramersV: perfect 2x2 association → V=1, zero cells counted") {
    // (a,p)×10, (b,q)×10; zero cells (a,q),(b,p) each contribute e=5
    // → chi2 = 4·5 = 20, V = sqrt(20/(20·1)) = 1
    val df = (Seq.fill(10)(("a", "p")) ++ Seq.fill(10)(("b", "q")))
      .toDF("x", "y")
    val r = Inference.cramersV(df, col("x"), col("y")).collect()(0)
    assert(r.getAs[Double]("chi2") == 20.0)
    assert(r.getAs[Double]("cramers_v") == 1.0)
  }

  test("cramersV: independent layout → chi2 0; single level → NULL V") {
    // perfectly proportional 2x2 → expected == observed everywhere
    val ind = (Seq.fill(4)(("a", "p")) ++ Seq.fill(2)(("a", "q")) ++
      Seq.fill(8)(("b", "p")) ++ Seq.fill(4)(("b", "q"))).toDF("x", "y")
    val r0 = Inference.cramersV(ind, col("x"), col("y")).collect()(0)
    assert(r0.getAs[Double]("chi2") == 0.0)
    val one = Seq(("a", "p"), ("a", "q")).toDF("x", "y")
    val r1 = Inference.cramersV(one, col("x"), col("y")).collect()(0)
    assert(r1.isNullAt(r1.fieldIndex("cramers_v")),
      "min(r−1,c−1)=0 must yield SQL-NULL V")
  }

  test("cronbachAlpha: perfectly correlated items → 1; cancelling totals → NULL") {
    val perf = Seq((1L, "a", 1L), (1L, "b", 1L), (2L, "a", 2L),
      (2L, "b", 2L)).toDF("u", "it", "v")
    val r = Inference.cronbachAlpha(perf, col("u"), col("it"), col("v"))
      .collect()(0)
    assert(r.getAs[Long]("k_items") == 2L && r.getAs[Long]("n_units") == 2L)
    assert(r.getAs[Double]("alpha") == 1.0)
    // anti-correlated: every unit total equal → zero total variance
    val anti = Seq((1L, "a", 1L), (1L, "b", 2L), (2L, "a", 2L),
      (2L, "b", 1L)).toDF("u", "it", "v")
    val r2 = Inference.cronbachAlpha(anti, col("u"), col("it"), col("v"))
      .collect()(0)
    assert(r2.isNullAt(r2.fieldIndex("alpha")))
  }

  test("cronbachAlpha: missing (unit,item) cells zero-fill by omission") {
    // u2 lacks item b → counts as 0: items a={1,2}, b={2,0}, totals {3,2}
    // num = (2·5−9)+(2·4−4)=1+4=5; den = 2·13−25=1 → alpha = 2·(1−5) = −8
    val df = Seq((1L, "a", 1L), (1L, "b", 2L), (2L, "a", 2L))
      .toDF("u", "it", "v")
    val r = Inference.cronbachAlpha(df, col("u"), col("it"), col("v"))
      .collect()(0)
    assert(r.getAs[Double]("alpha") == -8.0)
  }
}
