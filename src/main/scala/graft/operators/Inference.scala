package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classical inference tests over grouped metrics — the "is this
  * difference real?" companions to the A/B readouts in [[Trend]]
  * (Welch t, Mann-Whitney, chi-square GoF): one-way ANOVA across k
  * groups, its robust Brown-Forsythe variant, Cramér's V effect size
  * for two categoricals, and Cronbach's alpha scale reliability.
  *
  * Extends the reference's derived-statistics surface
  * (census-data-pipeline transformers.py summary stats) with the
  * multi-group tests a data-quality / experimentation pipeline runs
  * after segmentation.
  *
  * Determinism (FIXTURES.md): inputs are INTEGER-quantized; every
  * cross-row reduction is an exact long sum; the per-group squared-sum
  * terms s²/n (a single IEEE double multiply+divide, bit-identical
  * across engines) are quantized to 1e-4 fixed-point longs before the
  * k-row sum — the [[Trend.chiSqTerm]] device — and each statistic is
  * one sealed round(,4) division at the end.
  *
  * Scale: each operator is one (or for Brown-Forsythe two) map-side-
  * combinable aggregations; per-group state is a handful of longs
  * regardless of group size, and the final arithmetic runs on a
  * k-row (or cell-count-row) table. Callers quantize coarsely enough
  * that n·Σv² stays inside Long at their row counts — the same
  * contract as [[Trend.welchTTest]].
  */
object Inference {

  /** 1e-4 fixed-point quantization of the ANOVA "explained" term s²/n:
    * one double multiply + divide of exact longs (bit-identical in any
    * IEEE engine), rounded to a long so the subsequent k-row sum is
    * exact in any order. */
  private def ssTerm(s: Column, n: Column): Column =
    round(s.cast("double") * s / n * lit(1e4), 0).cast("long")

  /** One-way ANOVA of an INTEGER-quantized metric `v` across the levels
    * of `group`:
    *
    *   SSB = Σ_g s_g²/n_g − s²/n,  SSW = Σv² − Σ_g s_g²/n_g,
    *   F = (SSB/(k−1)) / (SSW/(n−k))
    *
    * One grouped pass builds (n_g, Σv, Σv²) per level as exact long
    * sums; the s_g²/n_g terms are fixed-point quantized ([[ssTerm]])
    * so the k-row reduction to SSB/SSW is again exact integer.
    * Null groups/values are dropped (both engines agree). Degenerate
    * inputs (k ≤ 1 or zero within-variance) yield SQL-NULL F. */
  def anovaF(df: DataFrame, group: Column, v: Column): DataFrame =
    anovaFTyped(df.select(group.as("g"), v.cast("long").as("v"))
      .where(col("g").isNotNull && col("v").isNotNull))

  /** ANOVA core on a pre-cleaned (g, v:long) frame — shared with
    * [[brownForsythe]], which feeds it absolute deviations. */
  private[graft] def anovaFTyped(d: DataFrame): DataFrame = {
    val per = d.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("s"),
        sum(col("v") * col("v")).as("ss"))
      .select(col("n"), col("s"), col("ss"),
        ssTerm(col("s"), col("n")).as("tg"))
    per.agg(count(lit(1)).as("k"), sum("n").as("n"), sum("s").as("st"),
        sum("ss").as("sst"), sum("tg").as("stg"))
      .select(col("k"), col("n"), col("st"), col("sst"), col("stg"),
        ssTerm(col("st"), col("n")).as("tall"))
      .select(col("k").as("k_groups"), col("n").as("n_rows"),
        round((col("stg") - col("tall")).cast("double") / lit(1e4), 4)
          .as("ss_between"),
        round((col("sst") * lit(10000L) - col("stg")).cast("double") /
          lit(1e4), 4).as("ss_within"),
        round(((col("stg") - col("tall")).cast("double") / lit(1e4) /
            nullif((col("k") - 1).cast("double"), lit(0.0))) /
          nullif((col("sst") * lit(10000L) - col("stg")).cast("double") /
            lit(1e4) /
            nullif((col("n") - col("k")).cast("double"), lit(0.0)),
            lit(0.0)), 4).as("f_stat"))
  }

  /** Wilson 95% score interval for a per-group success rate — the
    * small-n-safe CI (a Wald interval collapses to zero width at
    * p̂ ∈ {0,1}; Wilson stays honest). Closed-form singles over the
    * exact (n, k) longs with z = 1.96 literal:
    * center = (p̂ + z²/2n)/(1 + z²/n),
    * hw = z·√(p̂(1−p̂)/n + z²/4n²)/(1 + z²/n). One aggregation. */
  def wilsonCi(df: DataFrame, group: Column, success: Column): DataFrame = {
    val z = 1.96
    val d = df.select(group.as("g"), success.cast("long").as("y"))
      .where(col("g").isNotNull && col("y").isNotNull)
    val p = col("k").cast("double") / col("n")
    val nD = col("n").cast("double")
    val denom = lit(1.0) + lit(z * z) / nD
    val center = (p + lit(z * z) / (lit(2.0) * nD)) / denom
    val hw = (lit(z) * sqrt(p * (lit(1.0) - p) / nD +
      lit(z * z) / (lit(4.0) * nD * nD))) / denom
    d.groupBy("g").agg(count(lit(1)).as("n"), sum("y").as("k"))
      .select(col("g"), col("n"), col("k"),
        Seal.ratio4("k", "n").as("rate"),
        round(center - hw, 4).as("ci_lo"),
        round(center + hw, 4).as("ci_hi"))
      .orderBy("g")
  }

  /** Woolf logit confidence interval for the 2×2 odds ratio:
    * OR = ad/bc, CI = exp(ln OR ± 1.96·√(1/a + 1/b + 1/c + 1/d)) —
    * NULL when any cell is empty (the logit blows up; report honesty,
    * not an infinity). One four-conditional-sum aggregation. */
  def oddsRatioCi(df: DataFrame, exposure: Column,
                  outcome: Column): DataFrame = {
    val d = df.select(exposure.cast("boolean").as("e"),
        outcome.cast("boolean").as("o"))
      .where(col("e").isNotNull && col("o").isNotNull)
    val ct = d.agg(
      sum(when(col("e") && col("o"), 1L).otherwise(0L)).as("a"),
      sum(when(col("e") && !col("o"), 1L).otherwise(0L)).as("b"),
      sum(when(!col("e") && col("o"), 1L).otherwise(0L)).as("c"),
      sum(when(!col("e") && !col("o"), 1L).otherwise(0L)).as("dd"))
    val ok = col("a") > 0 && col("b") > 0 && col("c") > 0 && col("dd") > 0
    val lnOr = log(col("a").cast("double") * col("dd") /
      (col("b").cast("double") * col("c")))
    val se = sqrt(lit(1.0) / col("a") + lit(1.0) / col("b") +
      lit(1.0) / col("c") + lit(1.0) / col("dd"))
    ct.select(col("a"), col("b"), col("c"), col("dd").as("d"),
      when(ok, round(exp(lnOr), 4)).as("odds_ratio"),
      when(ok, round(exp(lnOr - lit(1.96) * se), 4)).as("ci_lo"),
      when(ok, round(exp(lnOr + lit(1.96) * se), 4)).as("ci_hi"))
  }

  /** One-sweep Tukey median polish of a two-way CELL-MEDIAN table:
    * residual(r, c) = cellmed − rowmed(cellmed) − colmed(cellmed −
    * rowmed) — the robust two-way decomposition whose large residuals
    * mark genuine row×col interactions (a mean-based two-way ANOVA
    * chases its own outliers here).
    *
    * Determinism is the quadruple-scale device: the input quantizes to
    * longs, cell medians of longs live in ½·Z, so ×4 makes CELL4 even
    * integers; one row sweep (odd-cardinality row medians of ints are
    * ints) and one col sweep keep EVERYTHING exact integer through the
    * full sweep — no interpolated double ever enters a cross-row sum.
    * All tables are cell-count-sized after the first aggregation. */
  def medianPolish(df: DataFrame, row: Column, colKey: Column,
                   v: Column): DataFrame = {
    val d = df.select(row.as("r"), colKey.as("c"), v.cast("long").as("v"))
      .where(col("r").isNotNull && col("c").isNotNull &&
        col("v").isNotNull)
    val cells = d.groupBy("r", "c")
      .agg(round(percentile(col("v") * 4, lit(0.5)), 0).cast("long")
        .as("m4"))
    val rowMed = cells.groupBy("r")
      .agg(round(percentile(col("m4"), lit(0.5)), 0).cast("long")
        .as("rm4"))
    val r1 = cells.join(broadcast(rowMed), "r")
      .select(col("r"), col("c"), (col("m4") - col("rm4")).as("res4"))
    val colMed = r1.groupBy("c")
      .agg(round(percentile(col("res4"), lit(0.5)), 0).cast("long")
        .as("cm4"))
    r1.join(broadcast(colMed), "c")
      .select(col("r"), col("c"),
        round((col("res4") - col("cm4")).cast("double") / lit(4.0), 4)
          .as("residual"))
      .orderBy("r", "c")
  }

  /** Intraclass correlation ICC(1) — one-way random-effects reliability:
    * how much of the metric's variance lives BETWEEN groups,
    *
    *   ICC = (MSB − MSW) / (MSB + (n₀ − 1)·MSW),
    *   n₀ = (N − Σn_g²/N) / (k − 1)
    *
    * from the same per-group (n, Σv, Σv²) exact long sums as
    * [[anovaF]] (fixed-point s²/n terms, one extra Σn_g² long), with
    * the unbalanced-design n₀ correction. One grouped pass + a k-row
    * reduction; NULL on k ≤ 1 or zero within-variance denominators. */
  def icc1(df: DataFrame, group: Column, v: Column): DataFrame = {
    val d = df.select(group.as("g"), v.cast("long").as("v"))
      .where(col("g").isNotNull && col("v").isNotNull)
    val per = d.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("s"),
        sum(col("v") * col("v")).as("ss"))
      .select(col("n"), col("s"), col("ss"),
        ssTerm(col("s"), col("n")).as("tg"))
    // n0 = (n² − snn)/(n·(k−1)) and, with A = SSB·10⁴, B = SSW·10⁴,
    // a = k−1, b = n−k, C = n² − snn − n·a:
    //   ICC(1) = n·(A·b − a·B) / (A·b·n + C·B)
    // — every factor an exact integer, so both seals run through Seal
    per.agg(count(lit(1)).as("k"), sum("n").as("n"), sum("s").as("st"),
        sum("ss").as("sst"), sum("tg").as("stg"),
        sum(col("n") * col("n")).as("snn"))
      .withColumn("aq", col("stg") - ssTerm(col("st"), col("n")))
      .withColumn("bq", col("sst") * lit(10000L) - col("stg"))
      .withColumn("ka", col("k") - 1)
      .withColumn("kb", col("n") - col("k"))
      .withColumn("cq", col("n") * col("n") - col("snn") -
        col("n") * col("ka"))
      .withColumn("n0num", col("n") * col("n") - col("snn"))
      .withColumn("n0den", nullif(col("n") * col("ka"), lit(0L)))
      .withColumn("inum", col("n").cast("decimal(38,0)") *
        (col("aq").cast("decimal(38,0)") * col("kb") -
         col("ka").cast("decimal(38,0)") * col("bq")))
      .withColumn("iden", nullif(
        col("aq").cast("decimal(38,0)") * col("kb") * col("n") +
        col("cq").cast("decimal(38,0)") * col("bq"),
        lit(java.math.BigDecimal.ZERO)))
      .select(col("k").as("k_groups"), col("n").as("n_rows"),
        Seal.ratio4("n0num", "n0den").as("n0"),
        Seal.ratio4("inum", "iden").as("icc1"))
  }

  /** Brown-Forsythe robust ANOVA: one-way ANOVA on the absolute
    * deviations from each group's MEDIAN — the heteroscedasticity /
    * heavy-tail-safe location test (a significant F here means the
    * groups differ in spread/level even when variances are unequal).
    *
    * Determinism: medians of longs land on z or z+0.5, so the doubled
    * deviation |2v − 2·med| is an exact integer in both engines; the
    * ANOVA core then runs on those exact longs (statistics scale by the
    * constant 2, which cancels in F). Two passes: exact per-group
    * median (group-count-row result, broadcast back), then the
    * [[anovaF]] aggregation. */
  def brownForsythe(df: DataFrame, group: Column, v: Column): DataFrame = {
    val g = df.select(group.as("g"), v.cast("long").as("v"))
      .where(col("g").isNotNull && col("v").isNotNull)
    val med = g.groupBy("g")
      .agg(round(percentile(col("v"), lit(0.5)) * 2, 0).cast("long")
        .as("m2"))
    anovaFTyped(g.join(broadcast(med), "g")
      .select(col("g"), abs(col("v") * 2 - col("m2")).as("v")))
  }

  /** Cramér's V association strength between two categoricals:
    * chi-square of independence over the contingency cells, then
    *   V = √(χ² / (n · min(r−1, c−1))).
    *
    * One cell aggregation (cells ≤ r·c rows), margins re-aggregated
    * from the CELL table (not the corpus — a second corpus pass would
    * be pure waste) and crossed into the full r×c spine so zero cells
    * contribute their e term; each cell's (o−e)²/e term is
    * quantized via [[Trend.chiSqTerm]] before the exact sum. V and χ²
    * are both derived from the same exact fixed-point total, so the
    * two readouts can never disagree. Null categories are excluded
    * from cells, margins, AND n (the q153 convention). */
  def cramersV(df: DataFrame, x: Column, y: Column): DataFrame = {
    val cells = df.select(x.as("x"), y.as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
      .groupBy("x", "y").agg(count(lit(1)).as("o"))
    val rx = cells.groupBy("x").agg(sum("o").as("rx"))
    val cy = cells.groupBy("y").agg(sum("o").as("cy"))
    val tot = cells.agg(sum("o").as("n"),
      countDistinct("x").as("r"), countDistinct("y").as("c"))
    // r×c margin spine so ABSENT combinations still contribute their
    // full (0−e)²/e term — the srmCheck zero-group device; both margin
    // tables are aggregate-sized, so the cross is r·c rows, not corpus².
    val spine = rx.crossJoin(broadcast(cy))
    spine.join(cells, Seq("x", "y"), "left")
      .select(col("rx"), col("cy"), coalesce(col("o"), lit(0L)).as("o"))
      .crossJoin(broadcast(tot))
      .select(col("n"), col("r"), col("c"),
        Trend.chiSqTerm(col("o"),
          col("rx").cast("double") * col("cy") / col("n")).as("t"))
      .groupBy("n", "r", "c").agg(sum("t").as("chifix"))
      .select(col("n").as("n_rows"), col("r").as("levels_x"),
        col("c").as("levels_y"),
        Seal.pow4("chifix", 6).as("chi2"),
        round(sqrt(col("chifix").cast("double") / lit(1e6) /
          nullif((col("n") *
            least(col("r") - 1, col("c") - 1)).cast("double"),
            lit(0.0))), 4).as("cramers_v"))
  }

  /** Fisher's EXACT 2×2 independence test between two boolean columns:
    * point probability of the observed table and the two-sided p-value
    * (sum of all hypergeometric tables with margins fixed whose
    * probability does not exceed the observed one).
    *
    * All comparisons happen in integer space: log-factorials accumulate
    * as 1e-6-quantized ln sums over an O(n) generated spine, every
    * candidate table's log-probability is a ±combination of six exact
    * longs, and "as extreme" is an integer comparison — no float
    * tie-break can flip a table in one engine only. The final p-value
    * sums per-candidate exp() terms quantized to 1e-12 longs (error
    * ≤ 5e-13 per term, orders below the round(,4) seal).
    *
    * Scale note — deliberate: the operator materializes an O(n) spine
    * and an unpartitioned cumulative window over it. Fisher's exact
    * test is a SMALL-SAMPLE tool (at large n it is statistically
    * indistinguishable from chi-square, which [[cramersV]] serves);
    * use it on filtered subsets, not the raw corpus. */
  def fisherExact(df: DataFrame, a: Column, b: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = df.select(a.cast("boolean").as("a"), b.cast("boolean").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
    val ct = d.agg(
        sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n11"),
        sum(when(col("a") && !col("b"), 1L).otherwise(0L)).as("n10"),
        sum(when(!col("a") && col("b"), 1L).otherwise(0L)).as("n01"),
        sum(when(!col("a") && !col("b"), 1L).otherwise(0L)).as("n00"))
      .select(col("n11"), (col("n11") + col("n10")).as("r1"),
        (col("n01") + col("n00")).as("r2"),
        (col("n11") + col("n01")).as("c1"),
        (col("n10") + col("n00")).as("c2"),
        (col("n11") + col("n10") + col("n01") + col("n00")).as("n"))
    val lf = ct.select(explode(sequence(lit(0L), col("n"))).as("i"))
      .select(col("i"), when(col("i") >= 2,
        round(log(col("i").cast("double")) * lit(1e6), 0).cast("long"))
        .otherwise(0L).as("lnq"))
      .select(col("i"), sum("lnq").over(Window.orderBy("i")
        .rowsBetween(Window.unboundedPreceding, 0)).as("lf"))
    def at(name: String) =
      lf.select(col("i").as(s"__i_$name"), col("lf").as(name))
    val cand = ct.select(col("*"),
      explode(sequence(greatest(lit(0L), col("c1") - col("r2")),
        least(col("r1"), col("c1")))).as("k"))
    val scored = cand
      .join(at("lfk"), col("k") === col("__i_lfk"))
      .join(at("lfr1k"), col("r1") - col("k") === col("__i_lfr1k"))
      .join(at("lfc1k"), col("c1") - col("k") === col("__i_lfc1k"))
      .join(at("lfr2k"),
        col("r2") - col("c1") + col("k") === col("__i_lfr2k"))
      .join(at("lfr1"), col("r1") === col("__i_lfr1"))
      .join(at("lfr2"), col("r2") === col("__i_lfr2"))
      .join(at("lfc1"), col("c1") === col("__i_lfc1"))
      .join(at("lfc2"), col("c2") === col("__i_lfc2"))
      .join(at("lfn"), col("n") === col("__i_lfn"))
      .select(col("n11"), col("r1"), col("c1"), col("n"), col("k"),
        (col("lfr1") - col("lfk") - col("lfr1k") +
          col("lfr2") - col("lfc1k") - col("lfr2k") -
          (col("lfn") - col("lfc1") - col("lfc2"))).as("lnp6"))
    val obs = scored.where(col("k") === col("n11"))
      .select(col("lnp6").as("obs6"))
    scored.crossJoin(broadcast(obs))
      .where(col("lnp6") <= col("obs6"))
      .groupBy("n11", "r1", "c1", "n", "obs6")
      .agg(sum(round(exp(col("lnp6").cast("double") / lit(1e6)) *
        lit(1e12), 0).cast("long")).as("p12"))
      .select(col("n11"), col("r1"), col("c1"), col("n").as("n_total"),
        round(exp(col("obs6").cast("double") / lit(1e6)), 4).as("p_point"),
        Seal.pow4("p12", 12).as("p_two_sided"))
  }

  /** Grubbs outlier test: G = max|x − x̄| / s over an INTEGER-quantized
    * metric, with the N-cleared numerator
    *
    *   maxdev·n = max(n·max(x) − Σx, Σx − n·min(x))
    *
    * so the "which point is furthest" decision is an exact integer
    * comparison — ONE aggregation (n, Σx, Σx², max, min), no second
    * pass to find the extreme. The reported side says whether the
    * suspect point is the maximum or the minimum. NULL G on n ≤ 1 or
    * zero variance. Callers quantize coarsely enough that n·Σx² stays
    * inside Long (the [[anovaF]] contract). */
  def grubbs(df: DataFrame, v: Column): DataFrame = {
    val d = df.select(v.cast("long").as("x")).where(col("x").isNotNull)
    d.agg(count(lit(1)).as("n"), sum("x").as("s"),
        sum(col("x") * col("x")).as("ss"),
        max("x").as("mx"), min("x").as("mn"))
      .select(col("n"),
        Seal.ratio4c(col("s"), nullif(col("n"), lit(0L))).as("mean"),
        round(sqrt((col("n") * col("ss") - col("s") * col("s"))
          .cast("double") /
          nullif((col("n") * (col("n") - 1)).cast("double"), lit(0.0))), 4)
          .as("sd"),
        when(col("n") * col("mx") - col("s") >=
          col("s") - col("n") * col("mn"), "high").otherwise("low")
          .as("side"),
        round(greatest(col("n") * col("mx") - col("s"),
            col("s") - col("n") * col("mn")).cast("double") /
          nullif(col("n").cast("double") *
            sqrt((col("n") * col("ss") - col("s") * col("s"))
              .cast("double") /
              nullif((col("n") * (col("n") - 1)).cast("double"),
                lit(0.0))), lit(0.0)), 4).as("g_stat"))
  }

  /** Cochran-Armitage trend test: does case rate move monotonically
    * with an INTEGER dose score? z = T/√Var with the N-cleared
    * all-integer forms
    *
    *   T·N = N·Σsy − R1·Σs,  Var·N³ = R1(N−R1)(N·Σs² − (Σs)²)
    *
    * from one five-sum aggregation; the N³ factors cancel inside the
    * final √-ratio, each double product a single IEEE op over
    * exact-integer-valued doubles. NULL z on degenerate dose spread or
    * all/no cases (nullif). */
  def cochranArmitage(df: DataFrame, score: Column, case_ : Column)
      : DataFrame = {
    val d = df.select(score.cast("long").as("s"),
        case_.cast("long").as("y"))
      .where(col("s").isNotNull && col("y").isNotNull)
    d.agg(count(lit(1)).as("n"), sum("y").as("r1"), sum("s").as("sn"),
        sum(col("s") * col("s")).as("ssn"),
        sum(col("s") * col("y")).as("sa"))
      .select(col("n"), col("r1"),
        round((col("n") * col("sa") - col("r1") * col("sn")).cast("double") /
          nullif(col("n").cast("double"), lit(0.0)), 4).as("t_stat"),
        round((col("n") * col("sa") - col("r1") * col("sn")).cast("double") *
          sqrt(col("n").cast("double")) /
          nullif(sqrt(col("r1").cast("double") * (col("n") - col("r1")) *
            (col("n") * col("ssn") - col("sn") * col("sn")).cast("double")),
            lit(0.0)), 4).as("z"))
  }

  /** CART-style Gini split-gain scan: for each candidate threshold t on
    * the INTEGER feature `x`, the impurity reduction of splitting the
    * binary label `y` at x ≤ t,
    *
    *   gain(t) = G(parent) − (n_L/n)·G(left) − (n_R/n)·G(right),
    *   G = 1 − (p² + (n−p)²)/n²
    *
    * — the single-feature inner loop of decision-tree induction, run
    * as ONE aggregation: each row explodes to its |T| threshold
    * memberships and conditional long counts accumulate per threshold
    * (map-side combinable; |T| is a literal list, so the blow-up is
    * bounded and shuffle keys are thresholds, not rows). Gains are
    * fixed double expressions over exact counts, sealed round(,4);
    * empty sides yield zero weighted impurity (0/0 → the n_side=0
    * guard), parent stats ride a 1-row broadcast. */
  def giniSplitGain(df: DataFrame, x: Column, y: Column,
                    thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    def gini(n: Column, p: Column): Column =
      when(n === 0, lit(0.0)).otherwise(
        lit(1.0) - (p.cast("double") * p + (n - p).cast("double") *
          (n - p)) / (n.cast("double") * n))
    val d = df.select(x.cast("long").as("x"), y.cast("long").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
    val parent = d.agg(count(lit(1)).as("n"), sum("y").as("p"))
    val perT = d
      .withColumn("t", explode(array(thresholds.map(lit(_)): _*)))
      .groupBy("t")
      .agg(sum(when(col("x") <= col("t"), 1L).otherwise(0L)).as("nl"),
        sum(when(col("x") <= col("t"), col("y")).otherwise(0L)).as("pl"))
    perT.crossJoin(broadcast(parent))
      .select(col("t").as("threshold"), col("nl").as("n_left"),
        (col("n") - col("nl")).as("n_right"),
        round(gini(col("n"), col("p")) -
          col("nl").cast("double") / col("n") *
            gini(col("nl"), col("pl")) -
          (col("n") - col("nl")).cast("double") / col("n") *
            gini(col("n") - col("nl"), col("p") - col("pl")), 4)
          .as("gain"))
      .orderBy("threshold")
  }

  /** Mantel-Haenszel stratified 2×2 analysis: the common odds ratio
    * OR_MH = Σ aᵢdᵢ/nᵢ / Σ bᵢcᵢ/nᵢ and the CMH chi-square (without
    * continuity correction) across strata — "does exposure associate
    * with outcome once the stratifier is held fixed?", the
    * Simpson's-paradox-proof pooling.
    *
    * One stratum-keyed aggregation (four conditional long counts per
    * stratum); every per-stratum ratio term is a single-double op
    * quantized to 1e-6 fixed-point before the exact stratum sum
    * (a·1e6 stays integer exactly on the same scale as E6). NULL OR
    * when no discordant mass, NULL chi2 on zero variance. */
  def mantelHaenszel(df: DataFrame, stratum: Column, exposure: Column,
                     outcome: Column): DataFrame = {
    def q6(x: Column) = round(x * lit(1e6), 0).cast("long")
    val d = df.select(stratum.as("st"), exposure.cast("boolean").as("e"),
        outcome.cast("boolean").as("o"))
      .where(col("st").isNotNull && col("e").isNotNull &&
        col("o").isNotNull)
    val per = d.groupBy("st").agg(
        sum(when(col("e") && col("o"), 1L).otherwise(0L)).as("a"),
        sum(when(col("e") && !col("o"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("e") && col("o"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("e") && !col("o"), 1L).otherwise(0L)).as("dd"))
      .select(col("a"), col("b"), col("c"), col("dd"),
        (col("a") + col("b") + col("c") + col("dd")).as("nn"))
      .select(
        q6(col("a") * col("dd").cast("double") / col("nn")).as("r6"),
        q6(col("b") * col("c").cast("double") / col("nn")).as("s6"),
        (col("a") * lit(1000000L)).as("a6"),
        q6((col("a") + col("b")).cast("double") * (col("a") + col("c")) /
          col("nn")).as("e6"),
        q6((col("a") + col("b")).cast("double") * (col("c") + col("dd")) *
          (col("a") + col("c")) * (col("b") + col("dd")) /
          (col("nn").cast("double") * col("nn") *
            nullif((col("nn") - 1).cast("double"), lit(0.0)))).as("v6"))
    per.agg(count(lit(1)).as("n_strata"), sum("r6").as("sr"),
        sum("s6").as("ss"), sum(col("a6") - col("e6")).as("dev6"),
        sum("v6").as("sv"))
      .withColumn("nss", nullif(col("ss"), lit(0L)))
      .withColumn("cnum", col("dev6").cast("decimal(38,0)") * col("dev6"))
      .withColumn("cden", nullif(lit(1000000L).cast("decimal(38,0)") *
        col("sv"), lit(java.math.BigDecimal.ZERO)))
      .select(col("n_strata"),
        Seal.ratio4("sr", "nss").as("or_mh"),
        Seal.ratio4("cnum", "cden").as("chi2_cmh"))
  }

  /** Cronbach's alpha internal-consistency coefficient over a LONG
    * (unit, item, value) frame:
    *
    *   α = k/(k−1) · (1 − Σ_i var_i / var_total)
    *
    * where var_i is item i's variance across ALL units (units missing
    * an item count as 0 — they contribute nothing to Σx and Σx², which
    * is exactly the zero-fill semantics) and var_total the variance of
    * per-unit score totals. With integer values both numerator
    * Σ_i (n·Σx² − (Σx)²) and denominator n·Σt² − (Σt)² are EXACT long
    * arithmetic — the n factors cancel, so no variance normalization
    * ever touches a double until the single sealed division.
    *
    * Shape: one (unit,item) cell aggregation, then two small re-aggs
    * of the cell table (per-item and per-unit) — the corpus is read
    * once. Degenerate scales (k ≤ 1, zero total variance) yield
    * SQL-NULL alpha. */
  def cronbachAlpha(df: DataFrame, unit: Column, item: Column,
                    v: Column): DataFrame = {
    val cells = df.select(unit.as("u"), item.as("it"),
        v.cast("long").as("x"))
      .where(col("u").isNotNull && col("it").isNotNull &&
        col("x").isNotNull)
      .groupBy("u", "it").agg(sum("x").as("x"))
    val items = cells.groupBy("it")
      .agg(sum("x").as("s"), sum(col("x") * col("x")).as("ss"))
    val tstats = cells.groupBy("u").agg(sum("x").as("t"))
      .agg(count(lit(1)).as("n"), sum("t").as("st"),
        sum(col("t") * col("t")).as("stt"))
    items.crossJoin(broadcast(tstats))
      .select(col("n"), col("st"), col("stt"),
        (col("n") * col("ss") - col("s") * col("s")).as("vi"))
      .groupBy("n", "st", "stt")
      .agg(count(lit(1)).as("k"), sum("vi").as("num"))
      .select(col("k").as("k_items"), col("n").as("n_units"),
        round(col("k").cast("double") /
            nullif((col("k") - 1).cast("double"), lit(0.0)) *
          (lit(1.0) - col("num").cast("double") /
            nullif((col("n") * col("stt") - col("st") * col("st"))
              .cast("double"), lit(0.0))), 4).as("alpha"))
  }

  /** Wilcoxon signed-rank test over paired INTEGER measurements: rank
    * |post − pre| ascending with average ranks on ties (zero
    * differences drop — the standard convention), W⁺ = Σ ranks over
    * positive differences, z = (W⁺ − n(n+1)/4) / √(n(n+1)(2n+1)/24 −
    * Σ(t³−t)/48). The doubled-average-rank device ([[RankEval.aucRoc]]:
    * a tie group ending at cumulative count c with m members has
    * 2·r̄ = 2c − m + 1) keeps every rank sum an exact integer; W⁺
    * displays as one sealed division by 2, and z is √-composed so its
    * double seal is boundary-free. */
  def wilcoxonSignedRank(df: DataFrame, pre: Column,
                         post: Column): DataFrame = {
    val d = df.select((post.cast("long") - pre.cast("long")).as("dd"))
      .where(col("dd").isNotNull && col("dd") =!= 0)
      .select(abs(col("dd")).as("ad"),
        when(col("dd") > 0, 1L).otherwise(0L).as("pos"))
    val byV = d.groupBy("ad")
      .agg(count(lit(1)).as("m"), sum("pos").as("mp"))
    // cumulative tie-group count via the distributed Ranked prefix —
    // no single-partition window over the |diff| spine
    val ranked = Ranked.withPrefix(byV, Seq(col("ad")),
        Seq(col("m") -> "cum"))
      // 2·W⁺ contribution of the tie group: mp positives × (2c − m + 1)
      .select(col("m"), col("mp"),
        (col("mp") * (lit(2L) * col("cum") - col("m") + 1L)).as("w2"),
        (col("m") * col("m") * col("m") - col("m")).as("tc"))
    ranked.agg(sum("m").as("n"), sum("w2").as("w2"), sum("tc").as("tc"))
      .withColumn("two", lit(2L))
      .withColumn("znum", col("w2").cast("double") / lit(2.0) -
        col("n").cast("double") * (col("n") + lit(1)) / lit(4.0))
      .withColumn("zden", sqrt(
        col("n").cast("double") * (col("n") + lit(1)) *
          (lit(2) * col("n") + lit(1)) / lit(24.0) -
          col("tc").cast("double") / lit(48.0)))
      .select(col("n").as("n_pairs"),
        Seal.ratio4("w2", "two").as("w_plus"),
        round(col("znum") / nullif(col("zden"), lit(0.0)), 4).as("z"))
  }

  /** Kruskal–Wallis H across k groups of an INTEGER metric — the
    * rank-based one-way ANOVA (no normality assumption). Average-rank
    * sums per group come from the doubled-rank device over the
    * distinct-value spine (2·r̄ = 2c − m + 1); each group's
    * R²/(n_g·N·(N+1)) term is one double op over exact longs quantized
    * to 1e-6 before the k-row sum, and the tie-corrected statistic
    * seals as the integer rational H6·(N³−N) / (10⁶·(N³−N−T)). */
  def kruskalWallis(df: DataFrame, group: Column, v: Column): DataFrame = {
    val d = df.select(group.as("g"), v.cast("long").as("x"))
      .where(col("g").isNotNull && col("x").isNotNull)
    val byV = d.groupBy("x").agg(count(lit(1)).as("m"))
    // cumulative count via the distributed Ranked prefix — no
    // single-partition window over the value spine
    val spine = Ranked.withPrefix(byV, Seq(col("x")),
        Seq(col("m") -> "cum"))
      .select(col("x"), col("m"), col("cum"),
        (col("m") * col("m") * col("m") - col("m")).as("tc"))
    val perG = d.join(spine.select("x", "m", "cum"), "x")
      .groupBy("g")
      .agg(count(lit(1)).as("ng"),
        sum(lit(2L) * col("cum") - col("m") + 1L).as("r2"))
    val nn = perG.agg(sum("ng").as("n"), count(lit(1)).as("k"))
    val ties = spine.agg(coalesce(sum("tc"), lit(0L)).as("t"))
    val terms = perG.crossJoin(broadcast(nn))
      .select(col("n"), col("k"),
        round(col("r2").cast("double") * col("r2") /
          (lit(4.0) * col("ng") * col("n") * (col("n") + 1)) * lit(1e6), 0)
          .cast("long").as("u6"))
    terms.groupBy("n", "k").agg(sum("u6").as("su6"))
      .crossJoin(broadcast(ties))
      .withColumn("h6", lit(12L) * col("su6") -
        lit(3L) * (col("n") + 1) * lit(1000000L))
      .withColumn("cnum", col("h6").cast("decimal(38,0)") *
        (col("n").cast("decimal(38,0)") * col("n") * col("n") - col("n")))
      .withColumn("cden", nullif(lit(1000000L).cast("decimal(38,0)") *
        (col("n").cast("decimal(38,0)") * col("n") * col("n") - col("n")
          - col("t")), lit(java.math.BigDecimal.ZERO)))
      .select(col("n").as("n_rows"), col("k").as("k_groups"),
        Seal.pow4("h6", 6).as("h"),
        Seal.ratio4("cnum", "cden").as("h_tie_corrected"))
  }

  /** Mood's median test: does each group split the same way around the
    * GLOBAL median — the robust k-group location test that only counts
    * above/at-or-below. The median is the exact percentile (a 1-row
    * broadcast); the 2×k chi-square uses margin-derived expectations
    * with each (o−e)²/e term quantized to 1e-6 (the chiSqTerm device)
    * and the statistic sealed in integer space. */
  def moodsMedian(df: DataFrame, group: Column, v: Column): DataFrame = {
    val d = df.select(group.as("g"), v.cast("long").as("x"))
      .where(col("g").isNotNull && col("x").isNotNull)
    val med = d.agg(percentile(col("x"), lit(0.5)).as("m"))
    val cells = d.crossJoin(broadcast(med))
      .groupBy("g")
      .agg(sum(when(col("x").cast("double") > col("m"), 1L).otherwise(0L))
        .as("ab"),
        sum(when(col("x").cast("double") > col("m"), 0L).otherwise(1L))
        .as("be"))
    val tot = cells.agg(sum("ab").as("ta"), sum("be").as("tb"),
      count(lit(1)).as("k"))
    val terms = cells.crossJoin(broadcast(tot))
      .withColumn("n", col("ta") + col("tb"))
      .select(col("k"), col("n"),
        (Trend.chiSqTerm(col("ab"), (col("ab") + col("be")).cast("double") *
          col("ta") / col("n")) +
         Trend.chiSqTerm(col("be"), (col("ab") + col("be")).cast("double") *
          col("tb") / col("n"))).as("t6"))
    terms.groupBy("k", "n").agg(sum("t6").as("s6"))
      .select(col("n").as("n_rows"), col("k").as("k_groups"),
        Seal.pow4("s6", 6).as("chi2"))
  }

  /** Cliff's delta between two groups of an INTEGER metric — the
    * rank-biserial effect size: δ = P(a > b) − P(a < b), computed from
    * the Mann-Whitney rank sum as (2R_a − n_a(n_a+1) − n_a·n_b) /
    * (n_a·n_b) with average-rank ties (the [[RankEval.aucRoc]] doubled
    * device keeps 2R_a an exact long), sealed as one integer ratio. */
  def cliffsDelta(df: DataFrame, group: Column, v: Column,
                  a: String, b: String): DataFrame = {
    val d = df.select(group.as("g"), v.cast("long").as("x"))
      .where(col("x").isNotNull && col("g").isin(a, b))
    val byV = d.groupBy("x")
      .agg(count(lit(1)).as("m"),
        sum(when(col("g") === a, 1L).otherwise(0L)).as("ma"))
    // cumulative count via the distributed Ranked prefix — no
    // single-partition window over the value spine
    val terms = Ranked.withPrefix(byV, Seq(col("x")),
        Seq(col("m") -> "cum"))
      .select(col("ma"), col("m"),
        (col("ma") * (lit(2L) * col("cum") - col("m") + 1L)).as("r2a"))
    terms.agg(sum("ma").as("na"), sum(col("m") - col("ma")).as("nb"),
        sum("r2a").as("r2"))
      .withColumn("dnum", col("r2") - col("na") * (col("na") + 1) -
        col("na") * col("nb"))
      .withColumn("dden", nullif(col("na") * col("nb"), lit(0L)))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        Seal.ratio4("dnum", "dden").as("cliffs_delta"))
  }

  /** Friedman test over a (block, treatment, value) frame — the
    * repeated-measures rank ANOVA: within each block the k treatment
    * values rank with average ties (doubled-rank device per block),
    * column rank sums R_j accumulate as exact longs, and the
    * tie-corrected statistic seals as an integer rational:
    *   Q = [3·ΣR2_j² − 3n²k(k+1)²] · n·k(k²−1)
    *       / (n·k(k+1) · (n·k(k²−1) − T))
    * with T = Σ_blocks Σ(t³−t). Requires every block complete (EXACTLY
    * one value per treatment) — blocks missing a treatment, or holding
    * a duplicate (block, treatment) observation, are dropped. */
  def friedman(df: DataFrame, block: Column, treatment: Column,
               v: Column): DataFrame = {
    val d0 = df.select(block.as("u"), treatment.as("j"),
        v.cast("long").as("x"))
      .where(col("u").isNotNull && col("j").isNotNull && col("x").isNotNull)
    val kAll = d0.agg(countDistinct("j").as("k"))
    // exactly-once coverage (the kendallW rule): row count alone can't
    // tell "all k treatments" from "k−1 treatments, one duplicated"
    val complete = d0.groupBy("u").agg(count(lit(1)).as("cnt"),
        countDistinct("j").as("cntd"))
      .crossJoin(broadcast(kAll))
      .where(col("cnt") === col("k") && col("cntd") === col("k"))
      .select("u")
    val d = d0.join(complete, "u")
    val byUV = d.groupBy("u", "x").agg(count(lit(1)).as("m"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("u")
      .orderBy("x").rowsBetween(Long.MinValue, 0)
    val spine = byUV.withColumn("cum", sum("m").over(w))
      .select(col("u"), col("x"), col("m"), col("cum"),
        (col("m") * col("m") * col("m") - col("m")).as("tc"))
    val ranked = d.join(spine.select("u", "x", "m", "cum"), Seq("u", "x"))
      .select(col("j"), (lit(2L) * col("cum") - col("m") + 1L).as("r2"))
    val colSums = ranked.groupBy("j").agg(sum("r2").as("r2j"))
    val ties = spine.groupBy("u").agg(max(lit(1L)).as("one"),
        sum("tc").as("tcu"))
      .agg(count(lit(1)).as("n"), coalesce(sum("tcu"), lit(0L)).as("t"))
    colSums.agg(count(lit(1)).as("k"),
        sum(col("r2j").cast("decimal(38,0)") * col("r2j")).as("sr2"))
      .crossJoin(broadcast(ties))
      .withColumn("qnum",
        (lit(3L).cast("decimal(38,0)") * col("sr2") -
          lit(3L).cast("decimal(38,0)") * col("n") * col("n") * col("k") *
            (col("k") + 1) * (col("k") + 1)) *
        (col("n").cast("decimal(38,0)") * col("k") *
          (col("k") * col("k") - 1)))
      .withColumn("qden", nullif(
        col("n").cast("decimal(38,0)") * col("k") * (col("k") + 1) *
          (col("n").cast("decimal(38,0)") * col("k") *
            (col("k") * col("k") - 1) - col("t")),
        lit(java.math.BigDecimal.ZERO)))
      .select(col("n").as("n_blocks"), col("k").as("k_treatments"),
        Seal.ratio4("qnum", "qden").as("q_tie_corrected"))
  }

  /** Kendall's coefficient of concordance W over a (judge, item, value)
    * frame — HOW MUCH the k judges agree, on the [0, 1] scale the
    * [[friedman]] significance test doesn't give (W is the effect size;
    * chi² = m·(n−1)·W is its large-sample test). Within each judge the
    * n item values rank with average ties (the doubled-rank device:
    * 2·rank stays an exact long), item rank sums accumulate as exact
    * longs, and the tie-corrected statistic seals as integer rationals:
    *   W    = 3·S4 / (m²·(n³−n) − m·T)
    *   chi² = 3·S4·(n−1) / (m·(n³−n) − T)
    * with S4 = Σ_items (2R_j − m(n+1))² = 4·S and T = Σ_judges Σ(t³−t).
    * Judges missing any item — or observing any item MORE than once —
    * are dropped: the friedman completeness rule, strengthened to
    * exactly-once coverage, because a duplicate (judge, item) row would
    * rank n+1 values and silently break the Σ2R = m·n·(n+1) identity
    * that the S4 closed form relies on (a row count alone can't tell
    * "all n items" from "n−1 items, one twice").
    *
    * Scale shape: identical to [[friedman]] — one (judge, value) count
    * agg, per-judge windows over the judge×items spine, one item-keyed
    * rank-sum agg; items and judges are bounded spines, raw rows never
    * window. */
  def kendallW(df: DataFrame, judge: Column, item: Column,
               v: Column): DataFrame = {
    val d0 = df.select(judge.as("u"), item.as("j"), v.cast("long").as("x"))
      .where(col("u").isNotNull && col("j").isNotNull && col("x").isNotNull)
    val nAll = d0.agg(countDistinct("j").as("n"))
    // exactly-once coverage: cnt = n rows AND cntd = n distinct items
    // together force one observation per item (either alone admits a
    // judge with a duplicated item masking a missing one)
    val complete = d0.groupBy("u").agg(count(lit(1)).as("cnt"),
        countDistinct("j").as("cntd"))
      .crossJoin(broadcast(nAll))
      .where(col("cnt") === col("n") && col("cntd") === col("n"))
      .select("u")
    val d = d0.join(complete, "u")
    val byUV = d.groupBy("u", "x").agg(count(lit(1)).as("m"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("u")
      .orderBy("x").rowsBetween(Long.MinValue, 0)
    val spine = byUV.withColumn("cum", sum("m").over(w))
      .select(col("u"), col("x"), col("m"), col("cum"),
        (col("m") * col("m") * col("m") - col("m")).as("tc"))
    val ranked = d.join(spine.select("u", "x", "m", "cum"), Seq("u", "x"))
      .select(col("j"), (lit(2L) * col("cum") - col("m") + 1L).as("r2"))
    val itemSums = ranked.groupBy("j").agg(sum("r2").as("r2j"))
    val ties = spine.groupBy("u").agg(sum("tc").as("tcu"))
      .agg(count(lit(1)).as("m"), coalesce(sum("tcu"), lit(0L)).as("t"))
    itemSums.crossJoin(broadcast(ties))
      .groupBy("m", "t")
      .agg(count(lit(1)).as("n"),
        sum(col("r2j").cast("decimal(38,0)") * col("r2j")).as("sr2"))
      // S4 = Σ(2R_j)² − 2·m(n+1)·Σ(2R_j) + n·m²(n+1)² with Σ(2R_j) =
      // m·n(n+1) exactly, so S4 = Σ(2R_j)² − n·m²(n+1)² — exact decimal
      .withColumn("s4",
        col("sr2") - col("n").cast("decimal(38,0)") * col("m") * col("m") *
          (col("n") + 1) * (col("n") + 1))
      .withColumn("wnum", lit(3L).cast("decimal(38,0)") * col("s4"))
      .withColumn("wden", nullif(
        col("m").cast("decimal(38,0)") * col("m") *
          (col("n").cast("decimal(38,0)") * col("n") * col("n") - col("n")) -
          col("m").cast("decimal(38,0)") * col("t"),
        lit(java.math.BigDecimal.ZERO)))
      .withColumn("cnum",
        lit(3L).cast("decimal(38,0)") * col("s4") * (col("n") - 1))
      .withColumn("cden", nullif(
        col("m").cast("decimal(38,0)") *
          (col("n").cast("decimal(38,0)") * col("n") * col("n") - col("n")) -
          col("t"),
        lit(java.math.BigDecimal.ZERO)))
      .select(col("m").as("k_judges"), col("n").as("n_items"),
        Seal.ratio4("wnum", "wden").as("w"),
        Seal.ratio4("cnum", "cden").as("chi2"))
  }

  /** Krippendorff's alpha (nominal) over a (unit, rater, value) frame —
    * the agreement coefficient the rest of the family can't provide:
    * [[Inference.kendallW]]/[[friedman]] need complete rankings,
    * [[RankEval.cohensKappa]] exactly two raters; alpha handles any
    * number of raters, missing ratings, and per-unit rater counts — the
    * realistic shape of LLM-output labeling jobs. Definition (nominal
    * distance): alpha = 1 − Do/De with
    *
    *   Do = (1/N) Σ_u (m_u² − Σ_c n_uc²) / (m_u − 1)
    *   De = (1/(N(N−1))) Σ_c N_c (N − N_c)
    *
    * where n_uc = ratings of category c in unit u, m_u = ratings in
    * unit u (units with m_u < 2 are unpairable and dropped, the
    * standard rule), N = Σ m_u over kept units, N_c pooled category
    * counts over kept units.
    *
    * Determinism: every count is an exact long; the one per-unit
    * rational (denominator m_u − 1) quantizes to 1e-6 fixed point
    * before the exact cross-unit sum (the mantelHaenszel q6 device);
    * alpha = (den − num)/den computed as ONE sealed ratio4 with
    * num = (N−1)·Σ t_u6 and den = 10⁶·Σ_c N_c(N − N_c), both
    * decimal(38,0)-exact. De = 0 (one category everywhere) → NULL.
    *
    * Scale shape: one (unit, value)-keyed count agg, one unit-keyed
    * rollup (both map-side combinable), one category-keyed agg over the
    * kept units, three 1-row aggregates — raw rows never window, never
    * self-join. */
  def krippendorffAlpha(df: DataFrame, unit: Column, rater: Column,
                        value: Column): DataFrame = {
    def q6(x: Column) = round(x * lit(1e6), 0).cast("long")
    val d = df.select(unit.as("u"), rater.as("r"), value.as("c"))
      .where(col("u").isNotNull && col("r").isNotNull && col("c").isNotNull)
    val nRaters = d.agg(countDistinct("r").as("n_raters"))
    val byUC = d.groupBy("u", "c").agg(count(lit(1)).as("nuc"))
    val perU = byUC.groupBy("u")
      .agg(sum("nuc").as("mu"), sum(col("nuc") * col("nuc")).as("ssq"))
      .where(col("mu") >= 2)
    // per-unit disagreement term, 1e-6 fixed point: (m² − Σn²)/(m − 1)
    val units = perU.select(col("u"), col("mu"),
      q6((col("mu") * col("mu") - col("ssq")).cast("double") /
        (col("mu") - 1).cast("double")).as("t6"))
    val tot = units.agg(count(lit(1)).as("n_units"), sum("mu").as("nn"),
      sum("t6").as("st6"))
    val pooled = byUC.join(units.select("u"), "u")
      .groupBy("c").agg(sum("nuc").as("nc"))
    val de = pooled.crossJoin(broadcast(tot.select("nn")))
      .agg(sum(col("nc").cast("decimal(38,0)") *
        (col("nn") - col("nc"))).as("sde"),
        count(lit(1)).as("n_categories"))
    tot.crossJoin(broadcast(de)).crossJoin(broadcast(nRaters))
      .withColumn("num",
        (col("nn") - 1).cast("decimal(38,0)") * col("st6"))
      .withColumn("den", nullif(
        lit(1000000L).cast("decimal(38,0)") * col("sde"),
        lit(java.math.BigDecimal.ZERO)))
      .select(col("n_units"), col("n_raters"), col("n_categories"),
        col("nn").as("n_ratings"),
        Seal.ratio4c(col("den") - col("num"), col("den")).as("alpha"))
  }
}
