package graft

import org.apache.spark.sql.functions._

/** Pins for the exact-test / stratified-table / containment batch. */
class ExactTestsSpec extends SparkSpec {
  import spark.implicits._

  def table22(n11: Int, n10: Int, n01: Int, n00: Int) =
    (Seq.fill(n11)((true, true)) ++ Seq.fill(n10)((true, false)) ++
      Seq.fill(n01)((false, true)) ++ Seq.fill(n00)((false, false)))
      .toDF("a", "b")

  test("fisherExact: lady-tasting-tea table [[3,1],[1,3]]") {
    // p(k)·70 = {1, 16, 36, 16, 1}; obs k=3 → point 16/70 = 0.2286,
    // two-sided = (1+16+16+1)/70 = 0.4857
    val r = Inference.fisherExact(table22(3, 1, 1, 3), col("a"), col("b"))
      .collect()(0)
    assert(r.getAs[Long]("n11") == 3L && r.getAs[Long]("r1") == 4L &&
      r.getAs[Long]("c1") == 4L && r.getAs[Long]("n_total") == 8L)
    assert(r.getAs[Double]("p_point") == 0.2286)
    assert(r.getAs[Double]("p_two_sided") == 0.4857)
  }

  test("fisherExact: the most likely table includes everything → p = 1") {
    // [[2,2],[2,2]]: observed is the modal table, all tables qualify
    val r = Inference.fisherExact(table22(2, 2, 2, 2), col("a"), col("b"))
      .collect()(0)
    assert(r.getAs[Double]("p_two_sided") == 1.0)
  }

  test("fisherExact: extreme table gets a small exact p") {
    // [[5,0],[0,5]]: p_point = 1/C(10,5) = 1/252 = 0.004
    val r = Inference.fisherExact(table22(5, 0, 0, 5), col("a"), col("b"))
      .collect()(0)
    assert(r.getAs[Double]("p_point") == 0.004)
    // two-sided adds the mirror table: 2/252 = 0.0079
    assert(r.getAs[Double]("p_two_sided") == 0.0079)
  }

  test("cochranArmitage: linear dose-response, hand-computed t and z") {
    // doses 0,1,2 with case rates 0, 1/2, 1 → T = 2, z = 2 exactly
    val df = Seq((0L, 0L), (0L, 0L), (1L, 0L), (1L, 1L), (2L, 1L),
      (2L, 1L)).toDF("s", "y")
    val r = Inference.cochranArmitage(df, col("s"), col("y")).collect()(0)
    assert(r.getAs[Long]("n") == 6L && r.getAs[Long]("r1") == 3L)
    assert(r.getAs[Double]("t_stat") == 2.0)
    assert(r.getAs[Double]("z") == 2.0)
  }

  test("cochranArmitage: constant dose → NULL z (zero dose variance)") {
    val df = Seq((3L, 0L), (3L, 1L)).toDF("s", "y")
    val r = Inference.cochranArmitage(df, col("s"), col("y")).collect()(0)
    assert(r.getAs[Double]("t_stat") == 0.0)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  def strat(rows: (String, Int, Int, Int, Int)*) =
    rows.flatMap { case (st, a, b, c, d) =>
      Seq.fill(a)((st, true, true)) ++ Seq.fill(b)((st, true, false)) ++
        Seq.fill(c)((st, false, true)) ++ Seq.fill(d)((st, false, false))
    }.toDF("st", "e", "o")

  test("mantelHaenszel: single stratum [[2,1],[1,2]] → OR 4, CMH 0.5556") {
    val r = Inference.mantelHaenszel(strat(("x", 2, 1, 1, 2)),
      col("st"), col("e"), col("o")).collect()(0)
    assert(r.getAs[Long]("n_strata") == 1L)
    assert(r.getAs[Double]("or_mh") == 4.0)
    assert(r.getAs[Double]("chi2_cmh") == 0.5556)
  }

  test("mantelHaenszel: strata pool as term sums, not collapsed cells") {
    // adding a perfectly concordant 2-person stratum [[1,0],[0,1]]
    // lifts OR to (2/3+1/2)/(1/6) = 7 and CMH to 1/0.7 = 1.4286
    val r = Inference.mantelHaenszel(
      strat(("x", 2, 1, 1, 2), ("y", 1, 0, 0, 1)),
      col("st"), col("e"), col("o")).collect()(0)
    assert(r.getAs[Long]("n_strata") == 2L)
    assert(r.getAs[Double]("or_mh") == 7.0)
    assert(r.getAs[Double]("chi2_cmh") == 1.4286)
  }

  test("ngramContainmentPairs: embedded short doc scores 1.0 where " +
      "Jaccard (0.3) would miss it; cross-block pairs never meet") {
    val df = Seq(
      (1L, "a b c d e f g h i j", "s0"),
      (2L, "a b c", "s0"),
      (3L, "a x y z", "s0"),
      (4L, "a b c", "s1")).toDF("doc_id", "text", "source")
    val rows = Dedup.ngramContainmentPairs(df, col("text"), col("doc_id"),
      col("source"), n = 1, minC = 0.9).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    assert(r.getAs[Long]("n_a") == 10L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Double]("containment") == 1.0)
  }

  test("ngramContainmentPairsBanded equals the naive quadratic join on " +
      "fixture documents (the scale-twin equality pin)") {
    val docs = Tables.t(spark, sf, "documents")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id_a", "id_b").collect().toSeq
    // fixture corpus at the query threshold
    assert(canon(Dedup.ngramContainmentPairsBanded(docs, col("text"),
        col("doc_id"), col("source"), n = 1, minC = 0.9)) ===
      canon(Dedup.ngramContainmentPairs(docs, col("text"),
        col("doc_id"), col("source"), n = 1, minC = 0.9)))
    // lower threshold (longer prefixes) + shingles exercise the other arm
    assert(canon(Dedup.ngramContainmentPairsBanded(docs, col("text"),
        col("doc_id"), col("source"), n = 2, minC = 0.5)) ===
      canon(Dedup.ngramContainmentPairs(docs, col("text"),
        col("doc_id"), col("source"), n = 2, minC = 0.5)))
    // the embedded-short-doc shape survives the banding
    val df = Seq(
      (1L, "a b c d e f g h i j", "s0"),
      (2L, "a b c", "s0"),
      (3L, "a x y z", "s0"),
      (4L, "a b c", "s1")).toDF("doc_id", "text", "source")
    val rows = Dedup.ngramContainmentPairsBanded(df, col("text"),
      col("doc_id"), col("source"), n = 1, minC = 0.9).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("id_a") == 1L &&
      rows(0).getAs[Long]("id_b") == 2L &&
      rows(0).getAs[Double]("containment") == 1.0)
  }

  test("tfidfCosinePairsBanded equals the naive block self-join on " +
      "fixture documents (the scale-twin equality pin)") {
    val docs = Tables.t(spark, sf, "documents")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id_a"), col("id_b"), round(col("cos"), 4).as("c"))
        .orderBy("id_a", "id_b").collect().toSeq
    // the query threshold, and a lower one (longer kept suffixes —
    // exercises the prefix cut at a different L2 bound)
    for (t <- Seq(0.6, 0.35)) {
      assert(canon(Curate.tfidfCosinePairsBanded(docs, col("doc_id"),
          col("text"), col("source"), minCos = t)) ===
        canon(Curate.tfidfCosinePairs(docs, col("doc_id"),
          col("text"), col("source"), minCos = t)),
        s"banded != naive at minCos=$t")
    }
    // repeated-rare-term pair: weights (not sets) decide — the banded
    // form must keep the exact integer dot of the naive join
    val df = Seq(
      (1L, "rare rare rare common", "s0"),
      (2L, "rare rare rare common other", "s0"),
      (3L, "common other filler words", "s0")).toDF("doc_id", "text", "source")
    val b = Curate.tfidfCosinePairsBanded(df, col("doc_id"), col("text"),
      col("source"), minCos = 0.6).orderBy("id_a", "id_b").collect()
    val n = Curate.tfidfCosinePairs(df, col("doc_id"), col("text"),
      col("source"), minCos = 0.6).orderBy("id_a", "id_b").collect()
    assert(b.toSeq === n.toSeq)
    assert(b.exists(r => r.getAs[Long]("id_a") == 1L &&
      r.getAs[Long]("id_b") == 2L))
  }
}
