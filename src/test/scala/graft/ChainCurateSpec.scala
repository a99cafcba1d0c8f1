package graft

import org.apache.spark.sql.functions._

/** Pins for the Markov-stationary / filter-funnel / weighted-kappa /
  * IQR-fence batch. */
class ChainCurateSpec extends SparkSpec {
  import spark.implicits._

  def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("u", "us", "eid", "et")

  test("markovStationary: alternating 2-state chain stays uniform") {
    val df = ev((1L, 1L, 1L, "A"), (1L, 2L, 2L, "B"), (1L, 3L, 3L, "A"),
      (1L, 4L, 4L, "B"), (1L, 5L, 5L, "A"))
    val r = Sequences.markovStationary(df, col("u"), col("us"),
      col("eid"), col("et"), iters = 3).collect()
      .map(x => x.getString(0) -> x.getAs[Double]("pi")).toMap
    assert(r == Map("A" -> 0.5, "B" -> 0.5))
  }

  test("markovStationary: absorbing state takes all mass via self-loop") {
    // A→B only; B never transitions → implicit self-loop; after the
    // first step all mass sits on B (A has no incoming edge)
    val df = ev((1L, 1L, 1L, "A"), (1L, 2L, 2L, "B"), (2L, 3L, 3L, "B"))
    val r = Sequences.markovStationary(df, col("u"), col("us"),
      col("eid"), col("et"), iters = 3).collect()
    assert(r.length == 1)
    assert(r(0).getString(0) == "B" && r(0).getAs[Double]("pi") == 1.0)
  }

  test("filterFunnel: each rule fires on its crafted doc, independently") {
    val good = (1 to 15).map(i => f"tok$i%04d".take(4) + i).mkString(" ")
    val goodDoc = (1 to 15).map(i => f"w$i%03d").mkString(" ") // 4-char
    val short = "aa bb cc"
    val repetitive = Seq.fill(20)("xy").mkString(" ")
    val longTok = (1 to 12).map(i => "z" * 19 + ('a' + i).toChar)
      .mkString(" ")
    val df = Seq(("s0", goodDoc), ("s0", short), ("s0", repetitive),
      ("s0", longTok)).toDF("source", "text")
    val r = Curate.filterFunnel(df, col("source"), col("text"))
      .collect()(0)
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_fail_len") == 1L)
    assert(r.getAs[Long]("n_fail_ttr") == 1L)
    assert(r.getAs[Long]("n_fail_toklen") == 1L)
    assert(r.getAs[Long]("n_kept") == 1L)
    assert(r.getAs[Double]("keep_rate") == 0.25)
  }

  test("weightedKappa: perfect agreement → 1; total 2-level flip → −1") {
    val perf = Seq((0L, 0L), (0L, 0L), (1L, 1L), (1L, 1L)).toDF("a", "b")
    val rp = RankEval.weightedKappa(perf, col("a"), col("b")).collect()(0)
    assert(rp.getAs[Double]("kappa_w") == 1.0)
    assert(rp.getAs[Double]("exp_disagreement") == 0.5)
    val flip = Seq((0L, 1L), (0L, 1L), (1L, 0L), (1L, 0L)).toDF("a", "b")
    val rf = RankEval.weightedKappa(flip, col("a"), col("b")).collect()(0)
    assert(rf.getAs[Double]("obs_disagreement") == 1.0)
    assert(rf.getAs[Double]("kappa_w") == -1.0)
  }

  test("weightedKappa: distance weighting punishes far misses harder") {
    // same #disagreements, but one lands 2 levels away: wo = 3 not 2
    val df = Seq((0L, 0L), (1L, 1L), (2L, 2L), (0L, 1L), (0L, 2L))
      .toDF("a", "b")
    val r = RankEval.weightedKappa(df, col("a"), col("b")).collect()(0)
    assert(r.getAs[Double]("obs_disagreement") == 0.6)
  }

  test("weightedKappa: single shared level → zero expected → NULL kappa") {
    val df = Seq((1L, 1L), (1L, 1L)).toDF("a", "b")
    val r = RankEval.weightedKappa(df, col("a"), col("b")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("kappa_w")))
  }

  test("iqrFences: 1..8 plus one far point → fences catch exactly it") {
    val df = ((1 to 8).map(i => ("g", i.toDouble)) :+ ("g", 100.0))
      .toDF("g", "v")
    val r = Trend.iqrFences(df, col("g"), col("v")).collect()(0)
    assert(r.getAs[Double]("q1") == 3.0 && r.getAs[Double]("q3") == 7.0)
    assert(r.getAs[Long]("n_low") == 0L && r.getAs[Long]("n_high") == 1L)
  }
}
