package graft

import org.apache.spark.sql.functions._

/** Pins for the DAG-layers / weighted-Jaccard / calibration-error /
  * entropy-rate batch. */
class LayeringSpec extends SparkSpec {
  import spark.implicits._

  test("dagLayers: path graph layers under the degree-id orientation") {
    // 1-2-3-4: orientation 1→2, 2→3, 4→3 → levels {1:0, 4:0, 2:1, 3:2}
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val r = Graph.dagLayers(e, col("u"), col("v"), rounds = 4).collect()
      .map(x => x.getAs[Long]("level") -> x.getAs[Long]("n_vertices"))
      .toMap
    assert(r == Map(0L -> 2L, 1L -> 1L, 2L -> 1L))
  }

  test("dagLayers: 6-chain needs all four rounds to settle") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("u", "v")
    val r = Graph.dagLayers(e, col("u"), col("v"), rounds = 4).collect()
      .map(x => x.getAs[Long]("level") -> x.getAs[Long]("n_vertices"))
      .toMap
    assert(r == Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("weightedJaccard: repetition counts where set Jaccard saturates") {
    val df = Seq((1L, "x x y", "s"), (2L, "x y y", "s"),
      (3L, "x x", "s"), (4L, "x x", "s")).toDF("doc_id", "text", "source")
    val rows = Dedup.weightedJaccardPairs(df, col("text"), col("doc_id"),
        col("source"), minW = 0.4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("wjaccard")).toMap
    // {x:2,y:1} vs {x:1,y:2}: Σmin 2 / Σmax 4 = 0.5 (set Jaccard = 1.0)
    assert(rows((1L, 2L)) == 0.5)
    assert(rows((3L, 4L)) == 1.0)
  }

  test("calibrationError: perfect calibration 0; inverted labels 1") {
    def mk(flip: Boolean) = (1L to 10L).map { i =>
      val hi = i <= 5
      (if (hi) 10000L else 0L, if (hi ^ flip) 1L else 0L, i)
    }.toDF("s", "y", "id")
    val good = RankEval.calibrationError(mk(false), col("s"), col("y"),
      col("id"), bins = 2).collect()(0)
    assert(good.getAs[Double]("ece") == 0.0 &&
      good.getAs[Double]("mce") == 0.0)
    val bad = RankEval.calibrationError(mk(true), col("s"), col("y"),
      col("id"), bins = 2).collect()(0)
    assert(bad.getAs[Double]("ece") == 1.0 &&
      bad.getAs[Double]("mce") == 1.0)
  }

  def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("u", "us", "eid", "et")

  test("entropyRate: deterministic chain 0; fair branch gives π_A·ln2") {
    val det = ev((1L, 1L, 1L, "A"), (1L, 2L, 2L, "B"), (1L, 3L, 3L, "A"),
      (1L, 4L, 4L, "B"), (1L, 5L, 5L, "A"))
    val r0 = Sequences.entropyRate(det, col("u"), col("us"), col("eid"),
      col("et")).collect()(0)
    assert(r0.getAs[Double]("entropy_rate") == 0.0)
    // A branches 50/50 to B/C which return deterministically:
    // π = (2/3, 1/6, 1/6) → H = (2/3)·ln 2 = 0.4621
    val br = ev((1L, 1L, 1L, "A"), (1L, 2L, 2L, "B"), (1L, 3L, 3L, "A"),
      (1L, 4L, 4L, "C"), (1L, 5L, 5L, "A"))
    val r1 = Sequences.entropyRate(br, col("u"), col("us"), col("eid"),
      col("et")).collect()(0)
    assert(r1.getAs[Long]("n_states") == 3L)
    assert(r1.getAs[Double]("entropy_rate") == 0.4621)
  }
}
