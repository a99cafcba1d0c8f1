package graft

import org.apache.spark.sql.functions._

/** Unit pins for the round-7 evaluation/privacy/maintenance operators
  * (q191–q197): exact AUC, top-k precision/recall, calibration bins,
  * k-anonymity / l-diversity reports, generalization ladder, compaction
  * planning. Crafted inputs with hand-checkable answers.
  */
class EvalPrivacySpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- AUC

  test("aucRoc: perfect, inverted, tied and degenerate rankings") {
    // perfect separation: every positive scores above every negative
    val perfect = Seq((10L, 1L), (9L, 1L), (2L, 0L), (1L, 0L)).toDF("s", "y")
    val p = RankEval.aucRoc(perfect, col("s"), col("y")).collect().head
    assert((p.getLong(0), p.getLong(1), p.getDouble(2)) === (2L, 2L, 1.0))
    // inverted: AUC 0
    val inv = Seq((10L, 0L), (9L, 0L), (2L, 1L), (1L, 1L)).toDF("s", "y")
    assert(RankEval.aucRoc(inv, col("s"), col("y"))
      .collect().head.getDouble(2) === 0.0)
    // everyone tied on one score: average-rank handling gives exactly 0.5
    val tied = Seq((5L, 1L), (5L, 0L), (5L, 1L), (5L, 0L)).toDF("s", "y")
    assert(RankEval.aucRoc(tied, col("s"), col("y"))
      .collect().head.getDouble(2) === 0.5)
    // one positive between two negatives: concordant 1, discordant 1
    val mid = Seq((3L, 0L), (2L, 1L), (1L, 0L)).toDF("s", "y")
    assert(RankEval.aucRoc(mid, col("s"), col("y"))
      .collect().head.getDouble(2) === 0.5)
    // degenerate (no negatives): SQL NULL, not Inf/NaN
    val allPos = Seq((3L, 1L), (2L, 1L)).toDF("s", "y")
    assert(RankEval.aucRoc(allPos, col("s"), col("y"))
      .collect().head.isNullAt(2))
  }

  test("aucRocBy: groups are independent; matches global AUC per slice") {
    val df = Seq(("a", 10L, 1L), ("a", 9L, 1L), ("a", 2L, 0L),
      ("a", 1L, 0L), ("b", 10L, 0L), ("b", 9L, 0L), ("b", 2L, 1L),
      ("b", 1L, 1L)).toDF("g", "s", "y")
    val out = RankEval.aucRocBy(df, col("g"), col("s"), col("y"))
      .orderBy("g").collect()
    assert(out(0).getString(0) === "a" && out(0).getDouble(3) === 1.0)
    assert(out(1).getString(0) === "b" && out(1).getDouble(3) === 0.0)
  }

  test("aucRocBucketed: bit-identical to the global form across widths, " +
      "ties straddling bucket boundaries included") {
    // scores straddle width-10 boundaries (9|10, 19|20) with ties at 10
    val df = Seq((25L, 1L), (20L, 0L), (19L, 1L), (10L, 1L), (10L, 0L),
      (9L, 0L), (3L, 1L), (1L, 0L)).toDF("s", "y")
    val plain = RankEval.aucRoc(df, col("s"), col("y")).collect().head
    for (w <- Seq(1L, 3L, 10L, 1000L)) {
      val b = RankEval.aucRocBucketed(df, col("s"), col("y"), w)
        .collect().head
      assert(b === plain, s"bucketWidth=$w")
    }
  }

  // ------------------------------------------------------ top-k metrics

  test("topkMetrics: hand-checked cutoffs with deterministic tie-break") {
    // ranked by (s desc, id): ids 4(s=9,y=1), 1(s=8,y=0), 3(s=8,y=1),
    // 2(s=5,y=1), 5(s=1,y=0) — id 1 before id 3 on the s=8 tie
    val df = Seq((1L, 8L, 0L), (2L, 5L, 1L), (3L, 8L, 1L),
      (4L, 9L, 1L), (5L, 1L, 0L)).toDF("id", "s", "y")
    val out = RankEval.topkMetrics(df, col("s"), col("y"), col("id"),
        Seq(1, 3)).as[(Long, Long, Double, Double)].collect().toSeq
    // k=1: top is id4 (pos) -> prec 1.0, recall 1/3
    // k=3: ids 4,1,3 -> 2 pos -> prec 0.6667, recall 2/3
    assert(out === Seq((1L, 1L, 1.0, 0.3333), (3L, 2L, 0.6667, 0.6667)))
  }

  test("calibrationBins: equal-size bins, per-bin rate and mean score") {
    // 6 units into 3 bins of 2 under (s desc, id): bin1 = s 60,50;
    // bin2 = s 40,30; bin3 = s 20,10
    val df = Seq((1L, 60L, 1L), (2L, 50L, 1L), (3L, 40L, 1L),
      (4L, 30L, 0L), (5L, 20L, 0L), (6L, 10L, 0L)).toDF("id", "s", "y")
    val out = RankEval.calibrationBins(df, col("s"), col("y"), col("id"),
        bins = 3).as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(out === Seq((1L, 2L, 2L, 1.0, 55.0), (2L, 2L, 1L, 0.5, 35.0),
      (3L, 2L, 0L, 0.0, 15.0)))
  }

  test("mapAtK: hand-computed AP, min(n_rel,k) denominator, NULL when " +
      "no relevant item") {
    // group a ranked desc: rel 1,0,1 with n_rel=2 -> AP = (1 + 2/3)/2
    // group b: nothing relevant -> NULL
    // group c: 5 relevant, k=3 caps the denominator -> AP = 3/3 = 1.0
    val df = Seq(("a", 30L, 1L, 1L), ("a", 20L, 0L, 2L), ("a", 10L, 1L, 3L),
      ("b", 30L, 0L, 1L), ("b", 20L, 0L, 2L)) ++
      (1 to 5).map(i => ("c", 100L - i, 1L, i.toLong))
    val out = RankEval.mapAtK(df.toDF("g", "s", "y", "id"), col("g"),
        col("s"), col("y"), col("id"), k = 3)
      .orderBy("g").collect()
    assert((out(0).getString(0), out(0).getLong(1), out(0).getDouble(2)) ===
      ("a", 2L, 0.8333))
    assert(out(1).getString(0) === "b" && out(1).isNullAt(2))
    assert((out(2).getString(0), out(2).getLong(1), out(2).getDouble(2)) ===
      ("c", 5L, 1.0))
  }

  // ------------------------------------------------------------ privacy

  test("kAnonymityReport: violating groups, rows at risk, share") {
    // groups: (a,x)x5 ok, (a,y)x2 violating, (b,x)x1 violating at k=3
    val df = (Seq.fill(5)(("a", "x")) ++ Seq.fill(2)(("a", "y")) ++
      Seq(("b", "x"))).toDF("q1", "q2")
    val r = Privacy.kAnonymityReport(df,
      Seq("q1" -> col("q1"), "q2" -> col("q2")), k = 3L).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getDouble(5)) === (8L, 3L, 1L, 2L, 3L, 0.375))
  }

  test("lDiversityReport: uniform sensitive values flag a large group") {
    // group a: 4 rows but only 1 distinct sensitive value (uniform —
    // the k-anonymity blind spot); group b: 2 rows, 2 distinct
    val df = (Seq.fill(4)(("a", "s1")) ++ Seq(("b", "s1"), ("b", "s2")))
      .toDF("q", "sv")
    val r = Privacy.lDiversityReport(df, Seq("q" -> col("q")), col("sv"),
      l = 2L).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      (2L, 1L, 1L, 4L))
  }

  test("privacy reports: empty input yields zero counts, NULL min/share") {
    val empty = Seq.empty[(String, String)].toDF("q", "sv")
    val ka = Privacy.kAnonymityReport(empty, Seq("q" -> col("q")), k = 5L)
      .collect().head
    assert((ka.getLong(0), ka.getLong(1), ka.getLong(3), ka.getLong(4)) ===
      (0L, 0L, 0L, 0L))
    assert(ka.isNullAt(2) && ka.isNullAt(5)) // min_group_size, share
    val ld = Privacy.lDiversityReport(empty, Seq("q" -> col("q")),
      col("sv"), l = 2L).collect().head
    assert((ld.getLong(0), ld.getLong(2), ld.getLong(3)) === (0L, 0L, 0L))
    assert(ld.isNullAt(1)) // min_diversity
  }

  test("generalizationLadder: coarser levels strictly reduce rows at risk") {
    val df = (Seq.fill(5)(("n1", "r1", "x")) ++ Seq.fill(2)(("n2", "r1", "x"))
      ++ Seq(("n3", "r1", "x"))).toDF("nat", "reg", "seg")
    val out = Privacy.generalizationLadder(df, Seq(
        "l0" -> Seq("nat" -> col("nat"), "seg" -> col("seg")),
        "l1" -> Seq("reg" -> col("reg"), "seg" -> col("seg"))), k = 3L)
      .orderBy("level").collect()
    // l0: groups 5/2/1 -> 2 violating, 3 rows at risk; l1: one group of 8
    assert((out(0).getString(0), out(0).getLong(4), out(0).getLong(5)) ===
      ("l0", 2L, 3L))
    assert((out(1).getString(0), out(1).getLong(4), out(1).getLong(5)) ===
      ("l1", 0L, 0L))
  }

  // ----------------------------------------------------------- agreement

  test("cohensKappa: perfect, chance-level and degenerate raters") {
    // perfect agreement: kappa 1
    val perfect = Seq((1L, 1L), (1L, 1L), (0L, 0L), (0L, 0L)).toDF("a", "b")
    val p = RankEval.cohensKappa(perfect, col("a"), col("b")).collect().head
    assert((p.getLong(0), p.getDouble(1), p.getDouble(2), p.getDouble(3)) ===
      (4L, 1.0, 0.5, 1.0))
    // independent raters at 50/50 marginals: po = pe = 0.5 -> kappa 0
    val chance = Seq((1L, 1L), (1L, 0L), (0L, 1L), (0L, 0L)).toDF("a", "b")
    assert(RankEval.cohensKappa(chance, col("a"), col("b"))
      .collect().head.getDouble(3) === 0.0)
    // degenerate: both raters constant -> n² = cross -> NULL kappa
    val const = Seq((1L, 1L), (1L, 1L)).toDF("a", "b")
    assert(RankEval.cohensKappa(const, col("a"), col("b"))
      .collect().head.isNullAt(3))
  }

  test("spearmanRho: monotone, inverted, tied and constant inputs") {
    // any monotone relation (even nonlinear) gives rho 1
    val mono = Seq((1L, 10L), (2L, 100L), (3L, 1000L), (4L, 100000L))
      .toDF("x", "y")
    assert(RankEval.spearmanRho(mono, col("x"), col("y"))
      .collect().head.getDouble(1) === 1.0)
    // inverted: -1
    val inv = Seq((1L, 40L), (2L, 30L), (3L, 20L), (4L, 10L)).toDF("x", "y")
    assert(RankEval.spearmanRho(inv, col("x"), col("y"))
      .collect().head.getDouble(1) === -1.0)
    // ties: hand-computed via average ranks — x (1,2,2,3), y (10,20,20,40)
    // rank vectors equal under ties -> rho 1
    val tied = Seq((1L, 10L), (2L, 20L), (2L, 20L), (3L, 40L)).toDF("x", "y")
    assert(RankEval.spearmanRho(tied, col("x"), col("y"))
      .collect().head.getDouble(1) === 1.0)
    // constant x: zero variance -> NULL, not division blowup
    val const = Seq((5L, 1L), (5L, 2L), (5L, 3L)).toDF("x", "y")
    assert(RankEval.spearmanRho(const, col("x"), col("y"))
      .collect().head.isNullAt(1))
  }

  // ---------------------------------------------------------- profiling

  test("columnProfile: nulls, distincts and ranges per column, one pass") {
    val df = Seq((Some(1L), Some(10.0)), (Some(1L), None),
      (Some(3L), Some(-5.0)), (None, Some(10.0))).toDF("a", "b")
    val out = Profile.columnProfile(df,
        Seq("a" -> col("a"), "b" -> col("b")))
      .orderBy("column_name")
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(out === Seq(("a", 4L, 1L, 2L, 1.0, 3.0),
      ("b", 4L, 1L, 2L, -5.0, 10.0)))
  }

  // -------------------------------------------------- encoding / splits

  test("patternCount: control, non-ASCII and replacement chars counted") {
    import TextAnalysis._
    val df = Seq(
      ("clean ascii text", 0L, 0L, 0L),
      ("tab\tand\nnewline ok", 0L, 0L, 0L), // \t \n excluded from C0 set
      ("bad\u0001\u0002ctrl", 2L, 0L, 0L),
      ("café résumé", 0L, 3L, 0L),
      ("broken � decode �", 0L, 2L, 2L)) // U+FFFD is non-ASCII too
      .toDF("t", "ec", "ea", "er")
    val out = df.select(
      patternCount(col("t"), CtrlPattern).as("c"),
      patternCount(col("t"), NonAsciiPattern).as("a"),
      patternCount(col("t"), ReplacementPattern).as("r"),
      col("ec"), col("ea"), col("er")).collect()
    out.foreach { r =>
      assert((r.getInt(0).toLong, r.getInt(1).toLong, r.getInt(2).toLong) ===
        (r.getLong(3), r.getLong(4), r.getLong(5)))
    }
  }

  test("temporalSplitReport: split counts, overlap units, min gap >= embargo") {
    val ts = (d: Int, h: Int) =>
      java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    // user 1 spans both sides (gap 4 days > 3-day embargo), user 2 only
    // train, user 3 only test, one embargo-window event dropped from both
    val ev = Seq((1L, ts(10, 0)), (1L, ts(17, 12)), (1L, ts(21, 12)),
      (2L, ts(5, 0)), (3L, ts(25, 0)), (1L, ts(19, 0))).toDF("u", "ts")
    val r = Sampling.temporalSplitReport(ev, col("u"), col("ts"),
      "2024-01-18", "2024-01-21").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      (3L, 1L, 2L, 1L))
    // user 1: max train Jan 17 12:00, min test Jan 21 12:00 -> 4 days
    assert(r.getDouble(4) === 4 * 86400.0)
    assert(r.getDouble(4) >= 3 * 86400.0) // the embargo guarantee
  }

  test("temporalSplit: NULL ts gets NULL split; unparseable cutoffs fail") {
    val ev = Seq((1L, Option(java.sql.Timestamp.valueOf("2024-01-10 00:00:00"))),
      (2L, Option.empty[java.sql.Timestamp])).toDF("u", "ts")
    val out = ev.select(col("u"),
      Sampling.temporalSplit(col("ts"), "2024-01-18", "2024-01-21").as("sp"))
      .orderBy("u").collect()
    assert(out(0).getString(1) === "train")
    assert(out(1).isNullAt(1)) // NOT silently 'test'
    val e = intercept[Exception] {
      Sampling.temporalSplit(col("ts"), "2024-O1-18", "2024-01-21")
    }
    assert(e.isInstanceOf[java.time.format.DateTimeParseException] ||
      e.getMessage != null)
  }

  // ------------------------------------------------------ snapshot diff

  test("snapshotDiff: added/removed/changed/unchanged and per-column " +
      "counts, null-safe comparison") {
    val oldV = Seq((1L, Some(10L), "a"), (2L, Some(20L), "b"),
      (3L, Some(30L), "c"), (4L, None, "d")).toDF("k", "v", "s")
    val newV = Seq((2L, Some(20L), "b"), // unchanged
      (3L, Some(31L), "c"), // v changed
      (4L, Some(40L), "d"), // NULL -> value: v changed (null-safe)
      (5L, Some(50L), "e")) // added
      .toDF("k", "v", "s")
    val r = Mutations.snapshotDiff(oldV, newV, Seq("k"), Seq("v", "s"))
      .collect().head
    // removed: k=1; added: k=5; changed: k=3 (v), k=4 (v); unchanged: k=2
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === (1L, 1L, 2L, 1L, 2L, 0L))
  }

  test("snapshotDiff: two empty versions report zeros, not SQL NULLs") {
    val empty = Seq.empty[(Long, Long, String)].toDF("k", "v", "s")
    val r = Mutations.snapshotDiff(empty, empty, Seq("k"), Seq("v", "s"))
      .collect().head
    assert((0 until 6).map(r.getLong) === Seq(0L, 0L, 0L, 0L, 0L, 0L))
  }

  // ------------------------------------------------------- spatial join

  test("gridJoinCount: inclusive bounds, multi-cell boxes, negatives, " +
      "zero-point boxes — matches naive containment") {
    // cell size 10; box A spans 4 cells, box B sits in one, box C is
    // empty, box D covers negative coordinates
    val pts = Seq((1L, 5L, 5L), (2L, 10L, 10L), (3L, 15L, 15L),
      (4L, -3L, -3L), (5L, 100L, 100L)).toDF("id", "x", "y")
    val boxes = Seq((10L, 0L, 15L, 0L, 15L), (20L, 4L, 6L, 4L, 6L),
      (30L, 50L, 60L, 50L, 60L), (40L, -5L, 0L, -5L, 0L))
      .toDF("id", "xlo", "xhi", "ylo", "yhi")
    val out = Spatial.gridJoinCount(pts, boxes, cellSize = 10L)
      .orderBy("bid").as[(Long, Long)].collect().toSeq
    // box 10 contains points 1,2,3 (15 inclusive); box 20 only point 1;
    // box 30 empty; box 40 only point 4
    assert(out === Seq((10L, 3L), (20L, 1L), (30L, 0L), (40L, 1L)))
    // every answer identical to the naive cross-containment count
    val naive = boxes.as("b").crossJoin(pts.as("p"))
      .where(col("p.x") >= col("b.xlo") && col("p.x") <= col("b.xhi") &&
        col("p.y") >= col("b.ylo") && col("p.y") <= col("b.yhi"))
      .groupBy(col("b.id")).agg(count(lit(1))).as[(Long, Long)]
      .collect().toMap
    out.foreach { case (bid, n) => assert(naive.getOrElse(bid, 0L) === n) }
  }

  test("gridJoinCount: degenerate boxes still emit a zero row") {
    val pts = Seq((1L, 5L, 5L)).toDF("id", "x", "y")
    // inverted x-bounds: no point can be inside, but the box must still
    // appear in the output (the every-box contract)
    val boxes = Seq((10L, 9L, 1L, 0L, 10L), (20L, 0L, 10L, 0L, 10L))
      .toDF("id", "xlo", "xhi", "ylo", "yhi")
    val out = Spatial.gridJoinCount(pts, boxes, cellSize = 10L)
      .orderBy("bid").as[(Long, Long)].collect().toSeq
    assert(out === Seq((10L, 0L), (20L, 1L)))
  }

  // --------------------------------------------------------- compaction

  test("compactionPlan: next-fit bins by cumulative size, oversize unit") {
    // per-unit sizes: day1=300, day2=300, day3=700 (oversize), day4=100
    // budget 500: cumBefore 0,300,600,1300 -> bins 0,0,1,2
    val rows = Seq.fill(3)((1L, 100L)) ++ Seq((2L, 300L)) ++
      Seq((3L, 700L)) ++ Seq((4L, 100L))
    val out = Layout.compactionPlan(rows.toDF("d", "sz"), col("d"),
        col("sz"), budget = 500L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((0L, 2L, 600L, 1L, 2L), (1L, 1L, 700L, 3L, 3L),
      (2L, 1L, 100L, 4L, 4L)))
  }
}
