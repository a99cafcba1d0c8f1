package graft

import org.apache.spark.sql.functions._

/** Round-8 analytics operators: Jaro-Winkler, CUSUM changepoint, Gini,
  * WOE/IV, Brier/log-loss, DP histogram — hand-computed pins plus the
  * family null/degenerate conventions. */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- Jaro-Winkler expression ---------------------------------------

  test("jaroWinkler matches the classic hand-computed values") {
    val got = Seq(
      ("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"), ("DIXON", "DICKSONX"),
      ("abc", "abc"), ("", "abc"), ("", ""), ("ab", "ba"), ("x", "xyz"))
      .toDF("a", "b")
      .select(org.apache.spark.sql.graft.StringSimExprs
        .jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(_.getDouble(0))
    // DIXON/DICKSONX: jaro 23/30, prefix 2 → 0.81333…; ''≡'' pins the
    // DuckDB convention (0, not 1)
    val want = Seq(0.9611111111111111, 0.84, 0.8133333333333332,
      1.0, 0.0, 0.0, 0.0, 0.8)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
  }

  test("jaroWinkler nulls propagate and codegen agrees with interpreted") {
    val df = Seq((Some("abc"), None: Option[String]),
      (None: Option[String], Some("abc"))).toDF("a", "b")
    val out = df.select(org.apache.spark.sql.graft.StringSimExprs
      .jaroWinkler(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
    // interpreted path (nullSafeEval) — same kernel, but exercise it
    // explicitly so a codegen-only regression can't hide
    import org.apache.spark.unsafe.types.UTF8String
    assert(math.abs(org.apache.spark.sql.graft.StringSim.jaroWinkler(
      UTF8String.fromString("MARTHA"), UTF8String.fromString("MARHTA"))
      - 0.9611111111111111) < 1e-12)
  }

  test("jaroWinklerPairs blocks, thresholds, and counts frequencies") {
    val df = Seq(
      ("B1", "red widget"), ("B1", "red gadget"), ("B1", "red widget"),
      ("B1", "blue bolt"), ("B2", "red widget"), ("B2", "red widgets"),
      ("B1", null.asInstanceOf[String]), (null.asInstanceOf[String], "x"))
      .toDF("brand", "name")
    val out = FuzzyJoin.jaroWinklerPairs(df, col("brand"), col("name"), 0.85)
      .orderBy("blk", "name_a", "name_b").collect()
    // B1: widget/gadget pair (0.895 ≥ 0.85; blue bolt too far);
    // B2: widget/widgets (prefix-heavy, ~0.9818); nulls dropped
    assert(out.length === 2)
    assert(out(0).getString(0) === "B1" &&
      out(0).getString(1) === "red gadget" &&
      out(0).getString(2) === "red widget" &&
      math.abs(out(0).getDouble(3) - 0.895) < 1e-9 &&
      out(0).getLong(4) === 1L && out(0).getLong(5) === 2L)
    assert(out(1).getString(0) === "B2" &&
      math.abs(out(1).getDouble(3) - 0.9818) < 1e-4)
    // cross-block identical names must NOT pair
    assert(!out.exists(r => r.getString(1) == r.getString(2)))
  }

  // ---- CUSUM changepoint ---------------------------------------------

  test("cusumChangepoint finds a hand-planted level shift") {
    // 10 days at 100 then 10 days at 200 → |S| peaks at the boundary
    val days = (1 to 20).map(d =>
      (java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00"),
        if (d <= 10) 100L else 200L))
    val out = Timeseries.cusumChangepoint(days.toDF("day", "cents"),
      col("day"), col("cents")).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getTimestamp(0) ===
      java.sql.Timestamp.valueOf("2024-01-10 00:00:00"))
    // mean 150; S_10 = 10·(100−150) = −500 cents = −5.00 dollars
    assert(math.abs(r.getDouble(1) - 5.0) < 1e-9)
    assert(r.getString(2) === "down_then_up")
    assert(r.getLong(3) === 20L)
    assert(math.abs(r.getDouble(4) - 1.5) < 1e-9)
  }

  test("cusumChangepoint breaks argmax ties to the earliest day") {
    // symmetric square wave: |S| attains its max at multiple days
    val days = Seq(
      ("2024-01-01", 0L), ("2024-01-02", 100L),
      ("2024-01-03", 0L), ("2024-01-04", 100L))
      .map { case (d, v) => (java.sql.Timestamp.valueOf(d + " 00:00:00"), v) }
    val out = Timeseries.cusumChangepoint(days.toDF("day", "cents"),
      col("day"), col("cents")).collect()(0)
    // S scaled by n=4: day1 → 4·0−1·200=−200; day2 → 4·100−2·200=0;
    // day3 → 4·100−3·200=−200; earliest argmax = day 1
    assert(out.getTimestamp(0) ===
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
  }

  // ---- Gini ----------------------------------------------------------

  test("gini pins perfect equality, strong inequality, and NULL guards") {
    val df = Seq(
      ("eq", 10L, 1L), ("eq", 10L, 2L), ("eq", 10L, 3L), ("eq", 10L, 4L),
      ("uneq", 0L, 1L), ("uneq", 0L, 2L), ("uneq", 0L, 3L), ("uneq", 100L, 4L),
      ("zero", 0L, 1L), ("zero", 0L, 2L),
      ("neg", -5L, 1L), ("neg", 10L, 2L))
      .toDF("g", "v", "tie")
    val out = Skew.gini(df, col("g"), col("v"), col("tie"))
      .orderBy("g").collect()
    val byG = out.map(r => r.getString(0) -> r).toMap
    assert(byG("eq").getDouble(3) === 0.0)
    // uneq: sorted 0,0,0,100; G = (2·400 − 5·100)/(4·100) = 0.75
    assert(math.abs(byG("uneq").getDouble(3) - 0.75) < 1e-9)
    assert(byG("zero").isNullAt(3)) // Σx = 0 → NULL, not div-by-zero
    // negative values drop (documented domain), leaving n=1 → G = (2−2)/1 = 0
    assert(byG("neg").getLong(1) === 1L)
  }

  // ---- WOE / IV ------------------------------------------------------

  test("woeIv hand-computed two-bucket case, one-sided skip rule") {
    // bucket 1: 30 good, 10 bad; bucket 2: 10 good, 30 bad; bucket 3 all good
    val rows =
      Seq.fill(30)((1L, 0L)) ++ Seq.fill(10)((1L, 1L)) ++
      Seq.fill(10)((2L, 0L)) ++ Seq.fill(30)((2L, 1L)) ++
      Seq.fill(5)((3L, 0L))
    val df = rows.toDF("bin", "y")
    val out = RankEval.woeIv(df, col("bin"), col("y")).orderBy("bin").collect()
    assert(out.length === 3)
    val g = 45.0; val b = 40.0
    val woe1 = math.log((30 / g) / (10 / b))
    val woe2 = math.log((10 / g) / (30 / b))
    assert(math.abs(out(0).getDouble(4) - woe1) < 1e-4)
    assert(math.abs(out(1).getDouble(4) - woe2) < 1e-4)
    assert(out(2).isNullAt(4) && out(2).getLong(3) === 1L) // one-sided
    val iv = (30 / g - 10 / b) * woe1 + (10 / g - 30 / b) * woe2
    assert(math.abs(out(0).getDouble(5) - iv) < 1e-4)
    assert(out(0).getDouble(5) === out(2).getDouble(5)) // same IV all rows
  }

  // ---- Brier / log-loss ----------------------------------------------

  test("brierLogloss pins a hand case and clamps degenerate probabilities") {
    val df = Seq((0.9, 1L), (0.1, 0L), (1.0, 0L), (0.0, 1L))
      .toDF("p", "y")
    val out = RankEval.brierLogloss(df, col("p"), col("y")).collect()(0)
    assert(out.getLong(0) === 4L && out.getLong(1) === 2L)
    // brier = (0.01 + 0.01 + 1 + 1)/4 = 0.505
    assert(math.abs(out.getDouble(2) - 0.505) < 1e-6)
    // clamped: −ln(0.9)−ln(0.9)−ln(1e-6)−ln(1e-6) over 4
    val ll = (-math.log(0.9) * 2 - math.log(1e-6) * 2) / 4
    assert(math.abs(out.getDouble(3) - ll) < 1e-3)
  }

  // ---- DP histogram --------------------------------------------------

  test("dpHistogram noise is seeded, bounded-ish, and epsilon-scaled") {
    val df = (1 to 100).map(i => s"cat${i % 4}").toDF("c")
    val a = Privacy.dpHistogram(df, col("c"), 0.5, "s1").orderBy("cell")
      .collect()
    val b = Privacy.dpHistogram(df, col("c"), 0.5, "s1").orderBy("cell")
      .collect()
    val c = Privacy.dpHistogram(df, col("c"), 0.5, "s2").orderBy("cell")
      .collect()
    // same salt → identical release; different salt → different noise
    assert(a.map(_.getDouble(1)).sameElements(b.map(_.getDouble(1))))
    assert(!a.map(_.getDouble(1)).sameElements(c.map(_.getDouble(1))))
    // noise centered on the true count 25: all draws within ±(1/ε)·ln(1e6)
    a.foreach { r =>
      assert(math.abs(r.getDouble(1) - 25.0) <= 2.0 * math.log(1e6) + 1e-9)
      assert(r.getDouble(2) === 0.5)
    }
  }
}
