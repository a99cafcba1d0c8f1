package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{TextExprs, TokenEntropyUtil}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Unit pins for the round-6 operators wired as q119–q128: OLS trend,
  * Markov transitions, token entropy, fuzzy dictionary pairs, skew report,
  * decayed engagement, pair lift, MAD outliers, top paths. Crafted inputs
  * with hand-checkable answers throughout.
  */
class TrendSeqSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ OLS trend

  test("olsTrend: perfect line recovers slope and intercept exactly") {
    // y = 7x + 30 over x = 0..9, two groups with different lines
    val rows = (0 to 9).map(x => ("a", x.toLong, 7L * x + 30L)) ++
      (0 to 9).map(x => ("b", x.toLong, -2L * x + 100L))
    val out = Trend.olsTrend(rows.toDF("g", "x", "y"), col("g"), col("x"),
        col("y")).orderBy("g")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(out === Seq(("a", 10L, 7.0, 30.0), ("b", 10L, -2.0, 100.0)))
  }

  test("pearson: perfect, inverse, and zero-variance groups") {
    val rows = (1L to 10L).map(i => ("up", i, 3 * i + 5)) ++
      (1L to 10L).map(i => ("down", i, 100 - 2 * i)) ++
      (1L to 10L).map(i => ("flat", i, 7L))
    val out = Trend.pearson(rows.toDF("g", "x", "y"), col("g"), col("x"),
        col("y")).orderBy("g").collect()
    val byG = out.map(r => r.getString(0) ->
      (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(byG("up") === Some(1.0))
    assert(byG("down") === Some(-1.0))
    assert(byG("flat") === None) // zero y-variance -> null, not NaN
  }

  test("olsTrend: constant x yields null slope (zero denominator)") {
    val rows = Seq(("g", 5L, 1L), ("g", 5L, 2L))
    val out = Trend.olsTrend(rows.toDF("g", "x", "y"), col("g"), col("x"),
      col("y")).collect().head
    assert(out.isNullAt(2) && out.isNullAt(3))
  }

  // ------------------------------------------------------ Markov transitions

  test("transitions: per-from probabilities sum to 1; crafted counts match") {
    // user 1: a b a b -> (a->b)x2, (b->a)x1 ; user 2: a a -> (a->a)x1
    val e = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "a")).toDF("u", "t", "s")
    val out = Sequences.transitions(e, col("u"), col("t"), col("t"), col("s"))
      .orderBy("from_state", "to_state")
      .as[(String, String, Long, Double)].collect().toSeq
    // from 'a' there are 3 outgoing: a->b twice, a->a once
    assert(out === Seq(("a", "a", 1L, 0.3333), ("a", "b", 2L, 0.6667),
      ("b", "a", 1L, 1.0)))
  }

  test("transitions: tie-break column orders same-timestamp events") {
    // same ts, tie-break id decides order: 1:a then 2:b -> a->b only
    val e = Seq((1L, 10L, 1L, "a"), (1L, 10L, 2L, "b")).toDF("u", "t", "id", "s")
    val out = Sequences.transitions(e, col("u"), col("t"), col("id"), col("s"))
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out === Seq(("a", "b", 1L, 1.0)))
  }

  // ------------------------------------------------------------- topPaths

  test("topPaths: counts 3-step windows and breaks count ties by path") {
    val e = Seq((1L, 1L, "x"), (1L, 2L, "y"), (1L, 3L, "z"), (1L, 4L, "y"),
      (2L, 1L, "x"), (2L, 2L, "y"), (2L, 3L, "z")).toDF("u", "t", "s")
    val out = Sequences.topPaths(e, col("u"), col("t"), col("t"), col("s"),
      steps = 3, k = 10).as[(String, Long)].collect().toSeq
    // user1 windows: x>y>z, y>z>y ; user2: x>y>z
    assert(out === Seq(("x>y>z", 2L), ("y>z>y", 1L)))
  }

  // --------------------------------------------------------- token entropy

  test("TokenEntropy: hand-checked distributions, empty and uniform") {
    def ent(tokens: Seq[String]): Double =
      TokenEntropyUtil.compute(ArrayData.toArrayData(
        tokens.map(UTF8String.fromString).toArray))
    assert(ent(Seq("a", "a", "b", "c")) === 1.5) // 2-1/2-1/4-1/4 -> 1.5 bits
    assert(ent(Seq.empty) === 0.0)
    assert(ent(Seq("x")) === 0.0)
    assert(ent(Seq("x", "x", "x")) === 0.0)
    assert(math.abs(ent(Seq("a", "b", "c", "d")) - 2.0) < 1e-12)
  }

  test("TokenEntropy: codegen column path equals the util on fixture docs") {
    val docs = Seq("a a b c", "all same same same", "x").toDF("text")
    val got = docs.select(TextExprs.tokenEntropy(split(col("text"), " ")))
      .as[Double].collect().toSeq
    val want = docs.as[String].collect().toSeq
      .map(t => TokenEntropyUtil.compute(ArrayData.toArrayData(
        t.split(" ").map(UTF8String.fromString))))
    assert(got === want)
    assert(got.head === 1.5)
  }

  // ------------------------------------------------------------ fuzzy pairs

  test("dictionaryPairs: blocks by first char and length band, caps distance") {
    val parts = Seq("blue bolt", "blue belt", "blue anvil", "red bolt",
      "blue bolt", "blue bolt").toDF("nm")
    val out = FuzzyJoin.dictionaryPairs(parts, col("nm"), maxDist = 2)
      .as[(String, String, Int, Long, Long)].collect().toSeq
    // only belt/bolt within distance 2 AND same first char AND len band;
    // "red bolt" is in block 'r'; anvil is 2 chars longer than belt (band
    // ok) but distance > 2
    assert(out === Seq(("blue belt", "blue bolt", 1, 1L, 3L)))
  }

  // ------------------------------------------------------------ skew report

  test("keyDistribution: uniform keys have gini 0; single hot key is skewed") {
    val uniform = (1 to 8).flatMap(k => Seq.fill(5)(k.toLong)).toDF("k")
    val u = Skew.keyDistribution(uniform, col("k")).collect().head
    assert(u.getLong(0) === 8L && u.getLong(1) === 40L)
    assert(u.getDouble(2) === 0.125) // max_share = 5/40
    assert(u.getDouble(4) === 0.0)   // gini
    val hot = ((1 to 9).map(_.toLong) ++ Seq.fill(91)(10L)).toDF("k")
    val h = Skew.keyDistribution(hot, col("k")).collect().head
    assert(h.getDouble(2) === 0.91)  // hot key holds 91%
    assert(h.getDouble(4) > 0.8)     // strongly unequal
  }

  // -------------------------------------------------------------- pair lift

  test("pairLift: independent and perfectly-correlated items") {
    // baskets: {1,2} x4, {1,3}, {2,3} -> pair (1,2) has lift
    // c_ab*N/(c_a*c_b) = 4*6/(5*5) = 0.96
    val rows = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 2L), (13L, 1L), (13L, 2L),
      (14L, 1L), (14L, 3L), (15L, 2L), (15L, 3L))
    val out = Cooccur.pairLift(rows.toDF("b", "it"), col("b"), col("it"),
        minSupport = 2L)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq((1L, 2L, 4L, 5L, 5L, 0.96)))
  }

  test("pairLift: duplicate basket lines count once") {
    val rows = Seq((1L, 7L), (1L, 7L), (1L, 8L), (2L, 7L), (2L, 8L))
    val out = Cooccur.pairLift(rows.toDF("b", "it"), col("b"), col("it"), 1L)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq((7L, 8L, 2L, 2L, 2L, 1.0)))
  }

  test("pairLift: null basket keys are dropped, not merged into one basket") {
    // two UNRELATED null-basket rows must not fuse into a (7,8) pair or
    // count toward N — only the one real basket exists
    val rows = Seq((Option(1L), 7L), (Option(1L), 8L),
      (Option.empty[Long], 7L), (Option.empty[Long], 8L))
    val out = Cooccur.pairLift(rows.toDF("b", "it"), col("b"), col("it"), 1L)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq((7L, 8L, 1L, 1L, 1L, 1.0)))
  }

  // ----------------------------------------------------------- MAD outliers

  test("madOutliers: flags only the planted outlier") {
    val vals = Seq(10.0, 11.0, 12.0, 13.0, 14.0, 1000.0).map(("g", _))
    val out = Trend.madOutliers(vals.toDF("g", "v"), col("g"), col("v"))
      .as[(String, Double, Double, Long, Long)].collect().head
    // median of {10..14,1000} = 12.5; deviations {2.5,1.5,.5,.5,1.5,987.5}
    // MAD = 1.5; threshold 4.5 -> only 1000 flagged
    assert(out === (("g", 12.5, 1.5, 1L, 6L)))
  }

  // ------------------------------------------------------------ KMV rolling

  test("kmvRolling: merged daily sketches equal kmvDistinct over exploded raw") {
    // 3 units, overlapping values across units, k smaller than cardinality
    val rows = (for {
      u <- 0L to 9L
      v <- 0L until 40L
    } yield (u, u * 7 + v)).toDF("u", "v") // windows see 40..~80 distinct
    val rolling = Sketches.kmvRolling(rows, col("u"), col("v"), span = 3,
        k = 16).orderBy("w")
      .as[(Long, Double, Long, Long)].collect().toSeq
    val maxU = 9L
    val exploded = rows.select(explode(sequence(col("u"),
        least(col("u") + 2, lit(maxU)))).as("w"), col("v"))
    val reference = Sketches.kmvDistinct(exploded, col("w"), col("v"), k = 16)
      .orderBy("grp").as[(Long, Double, Long, Long)].collect().toSeq
    assert(rolling === reference)
    assert(rolling.size === 10)
    // windows with > k distinct report estimates, not exact
    assert(rolling.forall(_._4 === 0L))
  }

  test("kmvRolling: below-k windows are exact; trailing windows clipped") {
    val rows = Seq((0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L), (2L, 9L))
      .toDF("u", "v")
    val out = Sketches.kmvRolling(rows, col("u"), col("v"), span = 2, k = 8)
      .orderBy("w").as[(Long, Double, Long, Long)].collect().toSeq
    // w0: u0 only {1,2}; w1: u0+u1 {1,2,3}; w2: u1+u2 {2,3,9}
    assert(out === Seq((0L, 2.0, 2L, 1L), (1L, 3.0, 3L, 1L),
      (2L, 3.0, 3L, 1L)))
  }

  // --------------------------------------------------- transformWithState

  test("runRunningTotals: ValueState accumulates across micro-batches") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_tws").toString
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("ts", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("props", StringType)))
    // the file STREAM source lists plain files, not nested parquet dirs:
    // stage each mini-fixture, then lift its single part file to
    // $dir/<n>.parquet
    def write(n: String, rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
      val stage = s"$dir/_stage_$n"
      spark.createDataFrame(rows.toDF("event_id", "ts", "user_id",
        "event_type", "value", "props").rdd, schema)
        .repartition(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/$n.parquet"))
      ()
    }
    // two files -> two AvailableNow micro-batches (maxFilesPerTrigger=1);
    // user 1 spans both, user 2 only the first. ts is raw NANOS.
    write("f1", Seq((1L, 1000000000L, 1L, "view", 1.25, "{}"),
      (2L, 2000000000L, 2L, "view", 2.0, "{}")))
    write("f2", Seq((3L, 9000000000L, 1L, "click", 0.75, "{}")))
    val out = EventStreams.runRunningTotals(spark, dir,
        name = "tws_spec_stream", maxFilesPerTrigger = Some(1),
        glob = "*.parquet")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // user 1: 2 events, 125 + 75 cents, max_us = 9000000 (micros)
    assert(out === Seq((1L, 2L, 200L, 9000000L), (2L, 1L, 200L, 2000000L)))
    // and the memory sink really saw TWO emissions for user 1 (one per
    // batch) — proof the state carried across batches rather than one
    // batch seeing all rows
    val emissions = spark.table("tws_spec_stream")
      .where(col("user_id") === 1L).count()
    assert(emissions === 2L)
  }

  // ------------------------------------------------------------ decayed sum

  test("decayedScore: empty input fails loudly, not with a bare NPE") {
    val empty = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("k", "ts", "v")
    val e = intercept[IllegalArgumentException] {
      Trend.decayedScore(empty, col("k"), col("ts"), col("v"), 0.1)
    }
    assert(e.getMessage.contains("empty input"))
  }

  test("decayedScore: newest event is unweighted, older decay exponentially") {
    val day = 86400000000L
    val ts = (i: Long) => new java.sql.Timestamp(i / 1000L)
    val e = Seq((1L, ts(2 * day), 10.0), (1L, ts(day), 10.0),
      (1L, ts(0L), 10.0)).toDF("k", "ts", "v")
    val out = Trend.decayedScore(e, col("k"), col("ts"), col("v"),
      lambdaPerDay = 0.5).as[(Long, Double, Long)].collect().head
    val want = 10.0 + 10.0 * math.exp(-0.5) + 10.0 * math.exp(-1.0)
    assert(out._1 === 1L && out._3 === 3L)
    assert(math.abs(out._2 - want) < 1e-3)
  }
}
