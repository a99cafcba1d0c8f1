package graft

import org.apache.spark.sql.functions._

/** Hand-computed pins for the scale-engineering / release-audit batch
  * (q336–q341). */
class PlanningOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tClosenessReport: symmetric two-class split, exact EMD") {
    // lo=0, hi=9, 10 bins → bin = v; class a sits entirely in bin 0,
    // class b entirely in bin 9. Each class's EMD vs the pooled
    // distribution: 9 bins × |2·4 − 2·2| = 36 over den 2·4·9 = 72 → 0.5
    val df = Seq(("a", 0L), ("a", 0L), ("b", 9L), ("b", 9L))
      .toDF("g", "v")
    val out = Privacy.tClosenessReport(df, Seq("g" -> col("g")),
      col("v"), bins = 10).orderBy("g").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("a", "b"))
    assert(out.map(_.getLong(1)).toSeq === Seq(2L, 2L))
    assert(out.map(_.getDouble(2)).toSeq === Seq(0.5, 0.5))
  }

  test("crossSplitNearDupLeakSampled: frac=1 reproduces the exact census; " +
       "frac=0.5 counts stay exact with sampled-subset verify") {
    val docs = Tables.t(spark, sf, "documents").limit(400)
      .withColumn("split", Sampling.splitAssign(col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "sp"))
    val exact = Dedup.crossSplitNearDupLeak(docs, col("text"),
      col("doc_id"), col("split")).collect()
    val full = Dedup.crossSplitNearDupLeakSampled(docs, col("text"),
      col("doc_id"), col("split"), frac = 1.0).collect()
    assert(full.length === exact.length)
    exact.zip(full).foreach { case (e, f) =>
      assert(f.getString(0) === e.getString(0))
      assert(f.getString(1) === e.getString(1))
      assert(f.getLong(2) === e.getLong(2), "n_candidates exact")
      assert(f.getLong(3) === e.getLong(2), "frac=1: every pair sampled")
      assert(f.getLong(4) === e.getLong(3), "frac=1: sampled leaks = exact")
      assert(f.getLong(6) === e.getLong(3), "frac=1: estimate = exact count")
    }
    val half = Dedup.crossSplitNearDupLeakSampled(docs, col("text"),
      col("doc_id"), col("split"), frac = 0.5).collect()
    exact.zip(half).foreach { case (e, h) =>
      assert(h.getLong(2) === e.getLong(2), "candidate counts never sampled")
      assert(h.getLong(3) <= e.getLong(2), "sample is a subset")
    }
    // the fixture actually exercises the sampling (some pair dropped)
    assert(half.map(_.getLong(3)).sum < exact.map(_.getLong(2)).sum)
    assert(half.map(_.getLong(3)).sum > 0)
  }

  test("tClosenessReport: class matching the global distribution has t = 0") {
    val df = Seq(("a", 0L), ("a", 9L), ("b", 0L), ("b", 9L))
      .toDF("g", "v")
    val out = Privacy.tClosenessReport(df, Seq("g" -> col("g")),
      col("v"), bins = 10).orderBy("g").collect()
    assert(out.map(_.getDouble(2)).toSeq === Seq(0.0, 0.0))
  }

  test("effectSizePanel: hand-computed d, g, Glass Δ") {
    // a = {2, 4}, b = {1, 3}: means 3 vs 2, each side ssq = n·Σv²−S² = 8
    // → s² = 8/(2·1·2)… pooled sp2 = (8/2 + 8/2)/2 = 4 — wait, ssq here
    // is n·Σv²−S² = 2·20−36 = 4 and 2·10−16 = 4; sp2 = (4/2+4/2)/2 = 2
    // → d = 1/√2 = 0.7071; J = 1−3/7 → g = 0.4041; sd_b = √(4/2) → Δ = 0.7071
    val df = Seq(("x", 2L), ("x", 4L), ("y", 1L), ("y", 3L))
      .toDF("l", "v")
    val r = Trend.effectSizePanel(df, col("l"), col("v"), "x", "y")
      .collect().head
    assert(r.getLong(2) === 2L && r.getLong(3) === 2L)
    assert(r.getDouble(4) === 1.0)      // mean_diff
    assert(r.getDouble(5) === 0.7071)   // cohens_d
    assert(r.getDouble(6) === 0.4041)   // hedges_g = d·(1−3/7)
    assert(r.getDouble(7) === 0.7071)   // glass_delta
  }

  test("effectSizePanel: n_a=1 keeps d/g defined (ssq_a = 0 convention)") {
    val df = Seq(("x", 2L), ("y", 1L), ("y", 3L)).toDF("l", "v")
    val r = Trend.effectSizePanel(df, col("l"), col("v"), "x", "y")
      .collect().head
    // ssq_a = 1·4−4 = 0; sp2 = (0/1 + 4/2)/1 = 2; mdiff = 2−2 = 0 →
    // d = g = 0 DEFINED; sd_b = √(4/2) defined → Δ = 0 defined
    assert(r.getLong(2) === 1L && r.getLong(3) === 2L)
    assert(!r.isNullAt(5) && r.getDouble(5) === 0.0) // cohens_d
    assert(!r.isNullAt(6) && r.getDouble(6) === 0.0) // hedges_g
    assert(!r.isNullAt(7) && r.getDouble(7) === 0.0) // glass_delta
  }

  test("effectSizePanel: Glass Δ nulls iff control n <= 1; d survives") {
    val df = Seq(("x", 2L), ("x", 4L), ("y", 1L)).toDF("l", "v")
    val r = Trend.effectSizePanel(df, col("l"), col("v"), "x", "y")
      .collect().head
    // sp2 = (4/2 + 0/1)/1 = 2 → d = 2/√2 = 1.4142;
    // g = d·(1 − 3/(4·1−1)) = 0; sd_b undefined (n_b = 1) → Δ NULL
    assert(r.getDouble(5) === 1.4142)
    assert(r.getDouble(6) === 0.0)
    assert(r.isNullAt(7))
  }

  test("effectSizePanel: df = 0 and zero pooled variance null out d/g") {
    val r1 = Trend.effectSizePanel(Seq(("x", 2L), ("y", 3L)).toDF("l", "v"),
      col("l"), col("v"), "x", "y").collect().head
    // n_a + n_b − 2 = 0: every effect size NULL, mean_diff still exact
    assert(r1.getDouble(4) === -1.0)
    assert(r1.isNullAt(5) && r1.isNullAt(6) && r1.isNullAt(7))
    val r2 = Trend.effectSizePanel(
      Seq(("x", 2L), ("x", 2L), ("y", 3L), ("y", 3L)).toDF("l", "v"),
      col("l"), col("v"), "x", "y").collect().head
    // both sides constant: sp2 = 0 and sd_b = 0 → all three NULL
    assert(r2.isNullAt(5) && r2.isNullAt(6) && r2.isNullAt(7))
  }

  test("tClosenessReport: NULL-QI rows are excluded, not a phantom group") {
    val df = Seq(Some("a") -> 0L, Some("a") -> 0L,
      Some("b") -> 9L, Some("b") -> 9L, None -> 5L)
      .map { case (g, v) => (g.orNull, v) }.toDF("g", "v")
    val out = Privacy.tClosenessReport(df, Seq("g" -> col("g")),
      col("v"), bins = 10).orderBy("g").collect()
    // the null-QI row is dropped up front: same report as without it
    assert(out.map(_.getString(0)).toSeq === Seq("a", "b"))
    assert(out.map(_.getLong(1)).toSeq === Seq(2L, 2L))
    assert(out.map(_.getDouble(2)).toSeq === Seq(0.5, 0.5))
  }

  test("packPlanEval: hand-computed slots/chunks at two budgets") {
    // shard a: docs of 3 and 5 tokens (total 8); shard b: one 10-token doc
    val df = Seq(("a", 3L), ("a", 5L), ("b", 10L)).toDF("sh", "nt")
    val out = Packing.packPlanEval(df, col("nt"), col("sh"), Seq(4L, 8L))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(4),
        r.getLong(5), r.getDouble(6))).toList
    // b=4: slots 1+2+3=6 → 18/24; chunks ⌈8/4⌉+⌈10/4⌉=5 → 18/20
    // b=8: slots 1+1+2=4 → 18/32; chunks 1+2=3 → 18/24
    assert(out === List((4L, 6L, 0.75, 5L, 0.9),
      (8L, 4L, 0.5625, 3L, 0.75)))
  }

  test("ngramDiversity: hand-computed counts; short-doc source zero-fills") {
    val df = Seq(("s", "a b a b"), ("s", "a b"), ("t", "x"))
      .toDF("src", "tx")
    val out = Curate.ngramDiversity(df, col("tx"), col("src"), Seq(1, 2, 3))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(5))).toList
    // s: n=1 → 6 grams / 2 distinct / 0 hapax; n=2 → 4 / 2 (ab×3, ba) /
    // 1 hapax; n=3 → 2 / 2 / 2. t: only 1-gram "x" (hapax); n=2,3 zero
    assert(out === List(
      ("s", 1, 6L, 2L, 0L), ("s", 2, 4L, 2L, 1L), ("s", 3, 2L, 2L, 2L),
      ("t", 1, 1L, 1L, 1L), ("t", 2, 0L, 0L, 0L), ("t", 3, 0L, 0L, 0L)))
    val ratios = Curate.ngramDiversity(df, col("tx"), col("src"),
      Seq(1, 2, 3)).collect()
    assert(ratios(1).getDouble(4) === 0.5 && ratios(1).getDouble(6) === 0.5)
    assert(ratios(4).isNullAt(4) && ratios(4).isNullAt(6)) // zero row → NULL
  }

  test("krippendorffAlpha: textbook nominal example, unpairable unit dropped") {
    // units: (A,A), (A,B), (B,B), (B,B) + a 1-rating unit that must drop.
    // Do = 0.25, De = 30/56 → alpha = 16/30 = 0.5333
    val df = Seq((1L, "r1", "A"), (1L, "r2", "A"),
      (2L, "r1", "A"), (2L, "r2", "B"),
      (3L, "r1", "B"), (3L, "r2", "B"),
      (4L, "r1", "B"), (4L, "r2", "B"),
      (5L, "r3", "A")).toDF("u", "r", "c")
    val out = Inference.krippendorffAlpha(df, col("u"), col("r"), col("c"))
      .collect().head
    assert(out.getLong(0) === 4L)   // n_units (unit 5 dropped)
    assert(out.getLong(1) === 3L)   // n_raters observed in input
    assert(out.getLong(2) === 2L)   // categories among kept units
    assert(out.getLong(3) === 8L)   // pairable ratings
    assert(out.getDouble(4) === 0.5333)
    // degenerate: one category everywhere → De = 0 → NULL alpha
    val mono = Seq((1L, "r1", "A"), (1L, "r2", "A")).toDF("u", "r", "c")
    val m = Inference.krippendorffAlpha(mono, col("u"), col("r"), col("c"))
      .collect().head
    assert(m.isNullAt(4))
  }

  test("joinCardinalityEval: hand-computed forecast on overlapping keys") {
    // a: x×2, y×1; b: x×3, z×4 → joint {x}: 2·3 = 6 rows, all on one key
    val a = Seq("x", "x", "y").toDF("k")
    val b = Seq("x", "x", "x", "z", "z", "z", "z").toDF("k")
    val r = Skew.joinCardinalityEval(a, col("k"), b, col("k"))
      .collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L) // n_keys a/b
    assert(r.getLong(2) === 3L && r.getLong(3) === 7L) // rows a/b
    assert(r.getLong(4) === 1L)                        // joint keys
    assert(r.getLong(5) === 6L && r.getLong(6) === 6L)
    assert(r.getDouble(7) === 1.0)
    // disjoint keys → zero forecast, NULL share
    val z = Skew.joinCardinalityEval(a, col("k"),
      Seq("q").toDF("k"), col("k")).collect().head
    assert(z.getLong(5) === 0L && z.isNullAt(7))
  }

  test("crossSplitNearDupLeak: cross-split dup leaks, same-split dup doesn't") {
    val df = Seq(
      (1L, "a b c d e", "train"), // identical pair across splits -> leak
      (2L, "a b c d e", "test"),
      (3L, "p q r s t", "train"), // identical pair WITHIN train -> excluded
      (4L, "p q r s t", "train"),
      (5L, "x y z w v", "test"))  // unique -> no candidate
      .toDF("id", "tx", "sp")
    val out = Dedup.crossSplitNearDupLeak(df, col("tx"), col("id"),
      col("sp"), shingleSize = 1, numPerm = 16, bands = 4, minBin10 = 7)
      .collect()
    assert(out.length === 1) // spine: only (test, train) present
    val r = out.head
    assert(r.getString(0) === "test" && r.getString(1) === "train")
    assert(r.getLong(2) === 1L && r.getLong(3) === 1L)
    assert(r.getLong(4) === 1L && r.getLong(5) === 1L)
    // three splits -> three explicit spine rows even with zero leakage
    val clean = Seq((1L, "a b c", "train"), (2L, "d e f", "val"),
      (3L, "g h i", "test")).toDF("id", "tx", "sp")
    val z = Dedup.crossSplitNearDupLeak(clean, col("tx"), col("id"),
      col("sp")).collect()
    assert(z.length === 3 && z.forall(r2 => r2.getLong(2) == 0L))
  }

  test("kendallW: judge with a duplicate (judge,item) row is dropped") {
    // j3 covers item 1 twice and item 2 never: row count = 2 = n would
    // pass a rows-only completeness check and corrupt Σ2R = mn(n+1)
    val df = Seq(("j1", 1L, 10L), ("j1", 2L, 20L),
      ("j2", 1L, 20L), ("j2", 2L, 10L),
      ("j3", 1L, 5L), ("j3", 1L, 7L))
      .toDF("j", "i", "v")
    val r = Inference.kendallW(df, col("j"), col("i"), col("v"))
      .collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 0.0)
  }

  test("kendallW: perfect agreement gives W = 1, chi2 = m(n-1)") {
    // 3 judges rank 3 items identically (values 1 < 2 < 3)
    val df = for (j <- Seq("j1", "j2", "j3"); i <- 1 to 3)
      yield (j, i.toLong, i.toLong * 10)
    val r = Inference.kendallW(df.toDF("j", "i", "v"),
      col("j"), col("i"), col("v")).collect().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L)
    assert(r.getDouble(2) === 1.0)
    assert(r.getDouble(3) === 6.0) // chi2 = m(n−1)W = 3·2·1
  }

  test("kendallW: incomplete judge dropped; opposite ranks cancel") {
    // j1 and j2 rank 2 items oppositely → rank sums equal → W = 0;
    // j3 ranked only one item and must be dropped (else n would skew)
    val df = Seq(("j1", 1L, 10L), ("j1", 2L, 20L),
      ("j2", 1L, 20L), ("j2", 2L, 10L), ("j3", 1L, 5L))
      .toDF("j", "i", "v")
    val r = Inference.kendallW(df, col("j"), col("i"), col("v"))
      .collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 0.0)
  }

  test("zonemapPruneEval: sort_x and zorder prune the x band, natural doesn't") {
    // full 4×4 grid, insertion order sweeps y first (ord = y·4 + x) so
    // the natural layout's every file spans the full x range
    val rows = for (x <- 0L to 3L; y <- 0L to 3L) yield (y * 4 + x, x, y)
    val df = rows.toDF("o", "x", "y")
    val out = Layout.zonemapPruneEval(df, col("o"), col("x"), col("y"),
      bits = 2, files = 4, preds = Seq(("x01", Some((0L, 1L)), None)))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getDouble(6))).toList
    // natural: 4 files, each holds all x → keeps 4 (scans 100%);
    // sort_x: file = x → keeps 2; zorder: file = quadrant → keeps the
    // two x-low quadrants
    assert(out === List(("natural", 4L, 4L, 1.0),
      ("sort_x", 4L, 2L, 0.5), ("zorder", 4L, 2L, 0.5)))
  }

  test("saltPlanEval: max bucket halves as the factor doubles") {
    val rows = (0L until 8L).map(i => ("hot", i)) ++
      (0L until 2L).map(i => ("cold", i))
    val df = rows.toDF("k", "b")
    val out = Skew.saltPlanEval(df, col("k"), col("b"), Seq(1, 2, 4))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
      .toList
    assert(out === List((1L, 8L, 0.8), (2L, 4L, 0.4), (4L, 2L, 0.2)))
  }

  test("bloomPlan: exact sealed fpr chain and optimal-h flag") {
    // two 20-token docs with identical text → 2 distinct 10-token
    // passages; replicate the operator's integer chain for (b=8, h=6)
    val words = (1 to 20).map("w" + _).mkString(" ")
    val df = Seq((1L, words), (2L, words)).toDF("id", "text")
    val out = Decontaminate.bloomPlan(df, col("text"), k = 10,
      bitsPerKey = Seq(8), maxHashes = 8).collect()
    assert(out.length === 8)
    val r86 = out.find(_.getLong(2) === 6L).get
    assert(r86.getLong(0) === 2L)        // n_keys
    assert(r86.getLong(3) === 16L)       // m_bits = 2·8
    val e8 = math.round(math.exp(-6.0 / 8.0) * 1e8)
    val base4 = (2 * (100000000L - e8) + 10000L) / 20000L
    val num = BigInt(base4).pow(6)
    val den = BigInt(10).pow(20)
    val fpr = ((2 * num + den) / (2 * den)).toDouble / 1e4
    assert(r86.getDouble(4) === fpr)
    assert(r86.getBoolean(5))            // h* = round(8·ln2) = 6
    assert(!out.find(_.getLong(2) === 5L).get.getBoolean(5))
  }
}
