package graft

import org.apache.spark.sql.functions._

/** Pins for the novelty / winsorized / Heaps / ICC batch. */
class NoveltyRobustSpec extends SparkSpec {
  import spark.implicits._

  test("ngramNovelty: first appearance wins, later docs score the rest") {
    val df = Seq((1L, "a b"), (2L, "b c"), (3L, "a c"))
      .toDF("doc_id", "text")
    val r = LanguageModel.ngramNovelty(df, col("doc_id"), col("text"))
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_new"), x.getAs[Double]("novelty"))).toMap
    assert(r(1L) == ((2L, 1.0)))
    assert(r(2L) == ((1L, 0.5)))
    assert(r(3L) == ((0L, 0.0)))
  }

  test("winsorizedStats: tails pinned to integer fences, n preserved") {
    // 1..20 plus 1000: p5 fence 2, p95 fence 20 → mean of clamped = 11
    val df = ((1L to 20L) :+ 1000L).map(("g", _)).toDF("g", "v")
    val r = Trend.winsorizedStats(df, col("g"), col("v"), p = 0.05)
      .collect()(0)
    assert(r.getAs[Long]("n") == 21L)
    assert(r.getAs[Long]("lo") == 2L && r.getAs[Long]("hi") == 20L)
    assert(r.getAs[Long]("n_clamped_low") == 1L &&
      r.getAs[Long]("n_clamped_high") == 1L)
    assert(r.getAs[Double]("wins_mean") == 11.0)
  }

  test("heapsLaw: all-new vocab fits beta 1; frozen vocab fits beta 0") {
    val fresh = Seq((1L, "a1 a2"), (2L, "b1 b2"), (3L, "c1 c2"))
      .toDF("doc_id", "text")
    val rf = LanguageModel.heapsLaw(fresh, col("doc_id"), col("text"))
      .collect()(0)
    assert(rf.getAs[Double]("beta") == 1.0)
    assert(rf.getAs[Double]("ln_k") == 0.0)
    val frozen = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val rz = LanguageModel.heapsLaw(frozen, col("doc_id"), col("text"))
      .collect()(0)
    assert(rz.getAs[Double]("beta") == 0.0)
  }

  test("icc1: zero within-variance → ICC 1; single group → NULL") {
    val df = Seq(("a", 1L), ("a", 1L), ("b", 5L), ("b", 5L))
      .toDF("g", "v")
    val r = Inference.icc1(df, col("g"), col("v")).collect()(0)
    assert(r.getAs[Double]("n0") == 2.0)
    assert(r.getAs[Double]("icc1") == 1.0)
    val one = Seq(("a", 1L), ("a", 3L)).toDF("g", "v")
    val r1 = Inference.icc1(one, col("g"), col("v")).collect()(0)
    assert(r1.isNullAt(r1.fieldIndex("icc1")))
  }
}
