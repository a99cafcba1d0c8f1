package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking / classifier evaluation over (score, label) unit tables — the
  * offline-eval counterpart to the experimentation family ([[Trend]]
  * z-test/CUPED/MDE): once a model scores every unit, these are the
  * standard readouts of "does the score actually rank positives first?".
  *
  * All three operators share the determinism recipe: scores and labels
  * are integers (callers quantize — cents, counts), every cross-row
  * reduction is an exact integer sum, and each output statistic is ONE
  * final division sealed with round(,4) (FIXTURES.md).
  *
  * Scale shape: the score spine (distinct score values / ranked units)
  * is what sorts, never raw events — and no operator here sorts it
  * through a single partition. [[aucRoc]]'s cumulative pass runs the
  * distributed [[Ranked]] prefix over the distinct-score spine
  * ([[aucRocBucketed]] remains the bit-identical value-bucketed twin
  * whose prefix decomposition the device generalizes).
  * [[topkMetrics]] ranks the UNIT table but filters rk ≤ max(ks)
  * directly above the window, so WindowGroupLimit bounds the
  * single-partition sort input to max(ks) rows per map partition.
  * [[calibrationBins]] / [[calibrationError]] / [[spearmanRho]] rank
  * the unit table through the same device.
  */
object RankEval {

  /** Shared rank-term: a (n, np, cum)-shaped frame becomes the per-score
    * contribution to 2·R⁺ (tie group ending at cumulative rank `cum`
    * with n members spans ranks (cum−n+1)..cum, so its average rank
    * doubled is 2·cum − n + 1 — integer arithmetic only). */
  private def rankTerm: Column =
    (col("np") * (lit(2L) * col("cum") - col("n") + 1L)).as("r2")

  /** Shared finalization: an aggregated (…, n_pos, n_neg, r2p) frame
    * becomes (…, n_pos, n_neg, auc) with the degenerate-input NULL
    * guard — ONE copy so the q191/q201 bit-identical-twin invariant
    * can't drift between the three AUC forms. */
  private def sealAuc(aggregated: DataFrame, keep: Seq[String]): DataFrame =
    aggregated.select(keep.map(col) ++ Seq(col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        round((col("r2p") - col("n_pos") * (col("n_pos") + 1L))
          .cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 4)).as("auc")): _*)

  /** Exact ROC AUC via the Mann-Whitney rank-sum with average-rank tie
    * handling: AUC = (R⁺ − n₊(n₊+1)/2) / (n₊·n₋), R⁺ = Σ over positives
    * of their average rank under ascending score. Computed per DISTINCT
    * score value (n, n_pos, cumulative count), where the tie group's
    * doubled average rank 2·r̄ = 2·cum − n + 1 keeps everything in
    * longs; one row out: (n_pos, n_neg, auc). Degenerate inputs (no
    * positives or no negatives) yield SQL NULL, not ±Inf/NaN — the
    * t-test/z-test convention. */
  def aucRoc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val byS = df.select(score.cast("long").as("s"),
        label.cast("long").as("y"))
      .where(col("s").isNotNull && col("y").isNotNull)
      .groupBy("s").agg(count(lit(1)).as("n"), sum("y").as("np"))
    // cumulative count over the distinct-score spine via the
    // distributed Ranked prefix — no single-partition window even when
    // the score domain is large
    val terms = Ranked
      .withPrefix(byS, Seq(col("s")), Seq(col("n") -> "cum"))
      .select(col("n"), col("np"), rankTerm)
    sealAuc(terms.agg(sum("np").as("n_pos"),
      sum(col("n") - col("np")).as("n_neg"), sum("r2").as("r2p")), Nil)
  }

  /** Per-group [[aucRoc]]: one row (g, n_pos, n_neg, auc) per group key.
    * Same integer rank-sum arithmetic; the ordering windows partition by
    * group, so the score-spine sort parallelizes across groups (the
    * segment/cohort readout shape — each group's spine sorts in its own
    * task). */
  def aucRocBy(df: DataFrame, group: Column, score: Column,
               label: Column): DataFrame = {
    val byS = df.select(group.as("g"), score.cast("long").as("s"),
        label.cast("long").as("y"))
      .where(col("s").isNotNull && col("y").isNotNull)
      .groupBy("g", "s").agg(count(lit(1)).as("n"), sum("y").as("np"))
    val w = Window.partitionBy("g").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sealAuc(byS.withColumn("cum", sum("n").over(w))
      .select(col("g"), col("n"), col("np"), rankTerm)
      .groupBy("g")
      .agg(sum("np").as("n_pos"), sum(col("n") - col("np")).as("n_neg"),
        sum("r2").as("r2p")), Seq("g"))
  }

  /** Bucketed [[aucRoc]] — the scale twin (the q26/q60 convention:
    * bit-identical answer, scale-shaped plan). [[aucRoc]]'s one global
    * ordering window serializes the whole distinct-score spine through
    * a single task; here scores pre-bucket by ⌊s/bucketWidth⌋, the
    * cumulative count splits into a bucket-spine prefix (tiny window)
    * plus an in-bucket prefix (bucket-partitioned window, parallel
    * across buckets), and cum = bucket-prefix-before + in-bucket-cum
    * reproduces the global rank exactly — the same monotone-prefix
    * decomposition as [[Agg.weightedPercentileBucketed]]. */
  def aucRocBucketed(df: DataFrame, score: Column, label: Column,
                     bucketWidth: Long = 10000L): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    val byS = df.select(score.cast("long").as("s"),
        label.cast("long").as("y"))
      .where(col("s").isNotNull && col("y").isNotNull)
      .groupBy("s").agg(count(lit(1)).as("n"), sum("y").as("np"))
      .withColumn("bk",
        floor(col("s").cast("double") / lit(bucketWidth.toDouble))
          .cast("long"))
    // bucket-spine prefix: cumulative count of all buckets BEFORE bk
    val wB = Window.orderBy("bk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spine = byS.groupBy("bk").agg(sum("n").as("bn"))
      .withColumn("before", sum("bn").over(wB) - col("bn"))
    // in-bucket prefix runs parallel across buckets
    val wIn = Window.partitionBy("bk").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sealAuc(byS.join(broadcast(spine.select(col("bk"), col("before"))), "bk")
      .withColumn("cum", col("before") + sum("n").over(wIn))
      .select(col("n"), col("np"), rankTerm)
      .agg(sum("np").as("n_pos"), sum(col("n") - col("np")).as("n_neg"),
        sum("r2").as("r2p")), Nil)
  }

  /** Precision / recall at each cutoff in `ks`, ranking units by score
    * desc with `tie` as the deterministic tie-break (both engines sort
    * identically, so rank-k boundaries match exactly). One ordering
    * window + one explode: each ranked unit fans out to the cutoffs it
    * belongs to, then a k-keyed aggregation counts positives — no
    * per-k re-sort. Output: (k, n_pos_topk, precision, recall). */
  def topkMetrics(df: DataFrame, score: Column, label: Column, tie: Column,
                  ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), "cutoffs must be >= 1")
    val w = Window.orderBy(desc("s"), col("id"))
    // family convention (aucRoc/cohensKappa): null scores/labels are
    // excluded up front — Spark sorts nulls last under desc while DuckDB
    // sorts them first, so leaving them in moves every rank-k boundary
    val ranked = df.select(score.cast("long").as("s"),
        label.cast("long").as("y"), tie.as("id"))
      .where(col("s").isNotNull && col("y").isNotNull)
      .withColumn("rk", row_number().over(w))
    val nPos = ranked.agg(sum("y").as("npt"))
    ranked
      // rows past the largest cutoff can never match — bound the explode
      // fan-out to max(ks)·|ks| rows at any unit count
      .where(col("rk") <= lit(ks.max.toLong))
      .select(col("y"), col("rk"), explode(array(ks.map(k =>
        lit(k.toLong)): _*)).as("k"))
      .where(col("rk") <= col("k"))
      .groupBy("k").agg(sum("y").as("n_pos_topk"))
      .crossJoin(broadcast(nPos))
      .select(col("k"), col("n_pos_topk"),
        Seal.ratio4("n_pos_topk", "k").as("precision"),
        when(col("npt") > 0,
          Seal.ratio4("n_pos_topk", "npt")).as("recall"))
      .orderBy("k")
  }

  /** MAP@k core — average precision per group of a (score desc, tie)
    * ranking against binary relevance: AP = Σ_{r≤k, rel_r} prec@r
    * / min(n_rel, k), with n_rel counted over the WHOLE group (not just
    * the top k) and NULL when a group has no relevant item. prec@r
    * terms are quantized to 1e-6 longs before the per-group sum (the
    * DCG device), so the aggregation is exact; ONE sealed division.
    * The rk ≤ k filter sits directly above the row_number, so
    * WindowGroupLimit keeps k rows per group before any sort. Output:
    * (g, n_rel, ap). */
  def mapAtK(df: DataFrame, group: Column, score: Column, label: Column,
             tie: Column, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val base = df.select(group.as("g"), score.cast("long").as("s"),
        label.cast("long").as("rel"), tie.as("id"))
      .where(col("s").isNotNull && col("rel").isNotNull)
      .localCheckpoint() // two consumers: top-k ranking + n_rel totals
    val nRel = base.groupBy("g").agg(sum("rel").as("n_rel"))
    val wq = Window.partitionBy("g").orderBy(desc("s"), col("id"))
    val wc = Window.partitionBy("g").orderBy("rk")
    val terms = base
      .withColumn("rk", row_number().over(wq)).where(col("rk") <= k)
      .withColumn("hits", sum("rel").over(wc))
      .select(col("g"), when(col("rel") === 1,
        round(lit(1e6) * col("hits") / col("rk"), 0).cast("long"))
        .otherwise(0L).as("t"))
      .groupBy("g").agg(sum("t").as("tsum"))
    terms.join(broadcast(nRel), "g")
      .select(col("g"), col("n_rel"),
        when(col("n_rel") > 0,
          round(col("tsum").cast("double") /
            (lit(1e6) * least(col("n_rel"), lit(k.toLong))), 4)).as("ap"))
  }

  /** Cohen's kappa between two BINARY raters — chance-corrected
    * agreement, the labeling-quality gate before annotated data enters
    * training. Entirely integer until the final divisions:
    * kappa = (n·agree − cross) / (n² − cross) with
    * cross = n_a1·n_b1 + n_a0·n_b0 (the expected-agreement mass), so
    * both engines aggregate five exact long sums and divide once.
    * Perfect chance agreement (n² = cross) yields SQL NULL. One row:
    * (n, po, pe, kappa). Scale: ONE map-side-combinable aggregation. */
  def cohensKappa(df: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    val base = df.select(raterA.cast("long").as("a"),
        raterB.cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
    base.agg(count(lit(1)).as("n"), sum("a").as("na1"), sum("b").as("nb1"),
        sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("agree"))
      .select(col("n"), col("agree"),
        (col("na1") * col("nb1") +
          (col("n") - col("na1")) * (col("n") - col("nb1"))).as("cross"))
      .withColumn("nsq", col("n") * col("n"))
      .withColumn("knum", col("n") * col("agree") - col("cross"))
      .withColumn("kden", col("nsq") - col("cross"))
      .select(col("n"),
        Seal.ratio4("agree", "n").as("po"),
        Seal.ratio4("cross", "nsq").as("pe"),
        when(col("nsq") =!= col("cross"),
          Seal.ratio4("knum", "kden")).as("kappa"))
  }

  /** Partition-agreement report between two labelings of the same
    * rows: Adjusted Rand Index plus purity / inverse purity — "do
    * these two groupings cut the data the same way?" (dedup clusters
    * vs source blocks, predicted vs gold labels). All pair counts
    * C(x,2) = shiftright(x(x−1), 1) stay exact longs; the ARI
    * numerator/denominator products (Pa·Pb is order n⁴/4, past Long at
    * ~10⁵ rows with coarse clusterings) go through decimal(38,0) — the
    * Sampling.designEffect / Inference.friedman pattern — mirroring
    * the oracle's HUGEINT; purity is one division of exact max-cell
    * sums. NULL ARI on the degenerate single×single-cluster case. */
  def partitionAgreement(df: DataFrame, u: Column,
                         v: Column): DataFrame = {
    def c2(c: Column) = shiftright(c * (c - 1), 1)
    val d = df.select(u.as("u"), v.as("v"))
      .where(col("u").isNotNull && col("v").isNotNull)
    val cells = d.groupBy("u", "v").agg(count(lit(1)).as("nij"))
    val pij = cells.agg(sum(c2(col("nij"))).as("pij"))
    val ra = cells.groupBy("u").agg(sum("nij").as("ai"),
      max("nij").as("mi"))
    val cb = cells.groupBy("v").agg(sum("nij").as("bj"),
      max("nij").as("mj"))
    val pa = ra.agg(sum(c2(col("ai"))).as("pa"), sum("mi").as("purn"),
      count(lit(1)).as("ku"))
    val pb = cb.agg(sum(c2(col("bj"))).as("pb"), sum("mj").as("ipurn"),
      count(lit(1)).as("kv"))
    val nn = d.agg(count(lit(1)).as("n"))
    // ARI is an exact rational: multiply numerator and denominator by
    // 2·C2(n) — num = 2·C2·pij − 2·pa·pb, den = C2·(pa+pb) − 2·pa·pb —
    // then seal the integer ratio (Seal.ratio4; sign handled there)
    def d38(c: Column) = c.cast("decimal(38,0)")
    pij.crossJoin(broadcast(pa)).crossJoin(broadcast(pb))
      .crossJoin(broadcast(nn))
      .withColumn("c2n", expr("(n * (n - 1)) div 2").cast("decimal(38,0)"))
      .withColumn("anum", lit(2) * col("c2n") * d38(col("pij")) -
        lit(2) * d38(col("pa")) * d38(col("pb")))
      .withColumn("aden",
        nullif(col("c2n") * (d38(col("pa")) + d38(col("pb"))) -
          lit(2) * d38(col("pa")) * d38(col("pb")),
          lit(0L).cast("decimal(38,0)")))
      .select(col("n"), col("ku").as("k_u"), col("kv").as("k_v"),
        Seal.ratio4("anum", "aden").as("ari"),
        Seal.ratio4("purn", "n").as("purity"),
        Seal.ratio4("ipurn", "n").as("inverse_purity"))
  }

  /** V-measure (homogeneity / completeness / their harmonic mean)
    * between two labelings: h = 1 − H(U|V)/H(U), c = 1 − H(V|U)/H(V),
    * V = 2hc/(h+c) — the entropy view of partition agreement
    * ([[partitionAgreement]]'s ARI counts pairs; this weighs
    * information). Every −p·ln p term is a single-double op over exact
    * counts quantized to 1e-6 fixed-point before the cell-table-sized
    * sums; degenerate single-cluster sides yield the conventional
    * h/c = 1 via the zero-entropy guard (nullif → coalesce 1). */
  def vMeasure(df: DataFrame, u: Column, v: Column): DataFrame = {
    def q6(x: Column) = round(x * lit(1e6), 0).cast("long")
    val d = df.select(u.as("u"), v.as("v"))
      .where(col("u").isNotNull && col("v").isNotNull)
    val cells = d.groupBy("u", "v").agg(count(lit(1)).as("nij"))
    val ra = cells.groupBy("u").agg(sum("nij").as("ai"))
    val cb = cells.groupBy("v").agg(sum("nij").as("bj"))
    val nn = cells.agg(sum("nij").as("n"))
    val hu = ra.crossJoin(broadcast(nn))
      .select(q6(col("ai").cast("double") / col("n") *
        log(col("ai").cast("double") / col("n"))).as("t"))
      .agg(coalesce(-sum("t"), lit(0L)).as("hu6"))
    val hv = cb.crossJoin(broadcast(nn))
      .select(q6(col("bj").cast("double") / col("n") *
        log(col("bj").cast("double") / col("n"))).as("t"))
      .agg(coalesce(-sum("t"), lit(0L)).as("hv6"))
    val huv = cells.join(broadcast(cb), "v").crossJoin(broadcast(nn))
      .select(q6(col("nij").cast("double") / col("n") *
        log(col("nij").cast("double") / col("bj"))).as("t"))
      .agg(coalesce(-sum("t"), lit(0L)).as("huv6"))
    val hvu = cells.join(broadcast(ra), "u").crossJoin(broadcast(nn))
      .select(q6(col("nij").cast("double") / col("n") *
        log(col("nij").cast("double") / col("ai"))).as("t"))
      .agg(coalesce(-sum("t"), lit(0L)).as("hvu6"))
    // h = (hu6−huv6)/hu6 and c = (hv6−hvu6)/hv6 are exact rationals
    // (zero-entropy sides use the conventional 1/1), and the harmonic
    // mean collapses to 2·hn·cn/(hn·cd + cn·hd) — all integer, so every
    // output seals via Seal.ratio4 instead of the boundary-prone double
    hu.crossJoin(broadcast(hv)).crossJoin(broadcast(huv))
      .crossJoin(broadcast(hvu))
      .withColumn("hn", when(col("hu6") === 0, lit(1L))
        .otherwise(col("hu6") - col("huv6")))
      .withColumn("hd", when(col("hu6") === 0, lit(1L))
        .otherwise(col("hu6")))
      .withColumn("cn", when(col("hv6") === 0, lit(1L))
        .otherwise(col("hv6") - col("hvu6")))
      .withColumn("cd", when(col("hv6") === 0, lit(1L))
        .otherwise(col("hv6")))
      .withColumn("vnum", lit(2) * col("hn") * col("cn"))
      .withColumn("vden", nullif(col("hn") * col("cd") +
        col("cn") * col("hd"), lit(0L)))
      .select(Seal.ratio4("hn", "hd").as("homogeneity"),
        Seal.ratio4("cn", "cd").as("completeness"),
        Seal.ratio4("vnum", "vden").as("v_measure"))
  }

  /** Expected / maximum calibration error over equal-population score
    * bins: ECE = Σ_b (n_b/N)·|pos_rate_b − mean_conf_b|, MCE the max
    * gap — the one-number summaries of the [[calibrationBins]] table a
    * model-quality gate thresholds on. `scoreScale` maps the INTEGER
    * score to probability (score/scale ∈ [0,1]). Per-bin gaps are
    * single-double ops over exact counts quantized to 1e-6 fixed-point;
    * the weighted sum and the max are exact integer ops on bins-sized
    * data. */
  def calibrationError(df: DataFrame, score: Column, label: Column,
                       tie: Column, bins: Int = 10,
                       scoreScale: Long = 10000L): DataFrame = {
    // the tie key joins the null drop: a NULL id would bin differently in
    // Spark (nulls first) vs the DuckDB oracle (nulls last) inside the
    // global ntile ordering — bin assignment must not depend on engine
    // null ordering
    val base = df.select(score.cast("long").as("s"),
        label.cast("long").as("y"), tie.as("id"))
      .where(col("s").isNotNull && col("y").isNotNull && col("id").isNotNull)
    // distributed ntile — the calibrationBins device
    val binned = Ranked.withRowNumber(base, Seq(desc("s"), col("id")), "__rn")
      .crossJoin(broadcast(base.agg(count(lit(1)).as("__n"))))
      .withColumn("bin", Ranked.ntileOf(col("__rn"), col("__n"), bins))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("np"), sum("s").as("ss"))
      .select(col("n"),
        round(abs(col("np").cast("double") / col("n") -
          col("ss").cast("double") / (col("n") * lit(scoreScale))) *
          lit(1e6), 0).cast("long").as("gap6"))
    binned.agg(sum("n").as("nn"), count(lit(1)).as("n_bins"),
        sum(col("n") * col("gap6")).as("wg6"), max("gap6").as("mx6"))
      .withColumn("eden", nullif(col("nn"), lit(0L)) * lit(1000000L))
      .select(col("nn").as("n"), col("n_bins"),
        Seal.ratio4("wg6", "eden").as("ece"),
        Seal.pow4("mx6", 6).as("mce"))
  }

  /** Linear-weighted Cohen's kappa over two ORDINAL integer scales:
    * κ_w = 1 − Σ|i−j|·O_ij / Σ|i−j|·E_ij — disagreement weighted by
    * how FAR apart the raters land, the ordinal upgrade of
    * [[cohensKappa]]'s all-or-nothing agreement.
    *
    * One cell aggregation; margins re-aggregate from the cell table
    * and cross into the full level spine so ZERO cells still carry
    * their expected weight (the Cramér's-V device). Observed weighted
    * disagreement is an exact long; each expected term |i−j|·rᵢcⱼ/n
    * is one double op quantized to 1e-6 fixed-point before the exact
    * sum, and κ_w = 1 − obs·10⁶/exp6 is a single sealed division.
    * NULL κ when expected disagreement is zero (degenerate raters). */
  def weightedKappa(df: DataFrame, raterA: Column,
                    raterB: Column): DataFrame = {
    val base = df.select(raterA.cast("long").as("a"),
        raterB.cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
    val cells = base.groupBy("a", "b").agg(count(lit(1)).as("o"))
    val ra = cells.groupBy("a").agg(sum("o").as("r"))
    val cb = cells.groupBy("b").agg(sum("o").as("c"))
    val tot = cells.agg(sum("o").as("n"))
    val spine = ra.crossJoin(broadcast(cb))
    spine.join(cells, Seq("a", "b"), "left")
      .crossJoin(broadcast(tot))
      .select(col("n"),
        (abs(col("a") - col("b")) * coalesce(col("o"), lit(0L))).as("wo"),
        round(abs(col("a") - col("b")).cast("double") * col("r") *
          col("c") / col("n") * lit(1e6), 0).cast("long").as("we6"))
      .groupBy("n").agg(sum("wo").as("no"), sum("we6").as("ne6"))
      .select(col("n"),
        round(col("no").cast("double") /
          nullif(col("n").cast("double"), lit(0.0)), 4)
          .as("obs_disagreement"),
        round(col("ne6").cast("double") / lit(1e6) /
          nullif(col("n").cast("double"), lit(0.0)), 4)
          .as("exp_disagreement"),
        when(col("ne6") =!= 0,
          round(lit(1.0) - col("no").cast("double") * lit(1e6) /
            col("ne6"), 4)).as("kappa_w"))
  }

  /** Spearman rank correlation with average-rank tie handling: Pearson
    * over the doubled average ranks (2·r̄ = 2·rank_min + ties − 1 stays
    * in longs; doubling both vectors leaves the correlation unchanged).
    * Ranks come from the distributed [[Ranked]] prefix device (no
    * single-partition window); the correlation itself is five exact
    * integer power sums and one sealed division, carried in
    * decimal(38,0) — the final n·s products reach 4n⁴, so the exact
    * path holds to n ≈ 2·10⁹ units (longs died at ~55k — measured),
    * mirroring the oracle's HUGEINT. One row: (n, spearman_rho). */
  def spearmanRho(df: DataFrame, x: Column, y: Column): DataFrame = {
    val base = df.select(x.cast("long").as("x"), y.cast("long").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
    // 2·average-rank = 2·rank_min + ties − 1, with rank_min recovered
    // as min(distributed row_number) over the tie group: the device's
    // in-tie order is arbitrary but a tie group never spans range
    // partitions, so the min is the deterministic SQL rank(). Two
    // device passes replace the two single-partition rank() windows.
    val ranked = Ranked.withRowNumber(
        Ranked.withRowNumber(base, Seq(col("x")), "__rnx"),
        Seq(col("y")), "__rny")
      .withColumn("rx", lit(2L) *
        min("__rnx").over(Window.partitionBy("x")) +
        count(lit(1)).over(Window.partitionBy("x")) - 1L)
      .withColumn("ry", lit(2L) *
        min("__rny").over(Window.partitionBy("y")) +
        count(lit(1)).over(Window.partitionBy("y")) - 1L)
    // power sums and the final n·s products go through decimal(38,0)
    // (DuckDB's sum(BIGINT) is HUGEINT, so the oracle already computes
    // 128-bit): per-term rx² fits a long to n ~ 2·10⁹, but the SUMS
    // reach 4n³ and the products 4n⁴ — decimal keeps the exact path
    // to n ≈ 2·10⁹ where longs died at ~55k (measured: the sf1 probe
    // overflowed q203 at 200k parts)
    def d38(c: Column) = c.cast("decimal(38,0)")
    ranked.agg(count(lit(1)).as("n"), sum("rx").as("sx"),
        sum("ry").as("sy"), sum(d38(col("rx")) * col("rx")).as("sxx"),
        sum(d38(col("ry")) * col("ry")).as("syy"),
        sum(d38(col("rx")) * col("ry")).as("sxy"))
      .select(col("n"),
        when((d38(col("n")) * col("sxx") - d38(col("sx")) * col("sx")) > 0 &&
            (d38(col("n")) * col("syy") - d38(col("sy")) * col("sy")) > 0,
          round((d38(col("n")) * col("sxy") - d38(col("sx")) * col("sy"))
            .cast("double") /
            sqrt((d38(col("n")) * col("sxx") - d38(col("sx")) * col("sx"))
              .cast("double") *
              (d38(col("n")) * col("syy") - d38(col("sy")) * col("sy"))
                .cast("double")), 4)).as("spearman_rho"))
  }

  /** Calibration table: units ranked by score desc (tie-broken) split
    * into `bins` equal-size ntile bins; per bin the positive rate and
    * the mean score (exact integer sum, one sealed division). A
    * well-calibrated score has pos_rate tracking mean_score; a ranking
    * that inverts anywhere shows a non-monotone pos_rate column. */
  def calibrationBins(df: DataFrame, score: Column, label: Column,
                      tie: Column, bins: Int = 10): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    // null scores/labels excluded — the family convention (see topkMetrics)
    val base = df.select(score.cast("long").as("s"),
        label.cast("long").as("y"), tie.as("id"))
      .where(col("s").isNotNull && col("y").isNotNull)
    // global ntile without the single-partition window: distributed
    // row_number ([[Ranked.withPrefix]]) + the closed-form tile of
    // (rn, n) — bit-identical to ntile() at any scale
    Ranked.withRowNumber(base, Seq(desc("s"), col("id")), "__rn")
      .crossJoin(broadcast(base.agg(count(lit(1)).as("__n"))))
      .withColumn("bin", Ranked.ntileOf(col("__rn"), col("__n"), bins))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"),
        sum("s").as("ssum"))
      .select(col("bin"), col("n"), col("n_pos"),
        Seal.ratio4("n_pos", "n").as("pos_rate"),
        Seal.ratio4("ssum", "n").as("mean_score"))
      .orderBy("bin")
  }

  /** Weight-of-evidence / information-value feature readout — the
    * credit-scoring standard for "how separable is this label by this
    * binned feature". Buckets are VALUE-based (caller passes an integer
    * bucket expression — range bands, not ntile: value bands are
    * tie-order-free and shippable as monotone literals to any engine).
    * Per bucket b: WOE_b = ln((g_b/G)/(b_b/B)) = ln(g_b·B / (b_b·G));
    * IV = Σ_b (g_b/G − b_b/B)·WOE_b.
    *
    * Determinism: counts are exact longs, each bucket's IV term is
    * quantized to a 1e-6 fixed-point long BEFORE the cross-bucket sum
    * (the chiSqTerm device), WOE itself is a per-bucket ln of an integer
    * ratio sealed with round(,4). One-sided buckets (g=0 or b=0, where
    * WOE diverges) emit NULL woe and contribute 0 to IV — the standard
    * skip rule, stated in the output via the `one_sided` flag.
    *
    * Scale: one bucket-keyed aggregation (bucket cardinality output),
    * totals ride a broadcast 1-row cross join. */
  def woeIv(df: DataFrame, bucket: Column, label: Column): DataFrame = {
    val cells = df.select(bucket.cast("long").as("bin"),
        label.cast("long").as("y"))
      .where(col("bin").isNotNull && col("y").isNotNull)
      .groupBy("bin")
      .agg(sum(when(col("y") === 0, 1L).otherwise(0L)).as("g"),
        sum(when(col("y") =!= 0, 1L).otherwise(0L)).as("b"))
      .localCheckpoint() // totals + per-bucket readout share the table
    val tot = cells.agg(sum("g").as("gt"), sum("b").as("bt"))
    val woe = log(col("g").cast("double") * col("bt").cast("double") /
      (col("b").cast("double") * col("gt").cast("double")))
    val ivTerm = // (g/G − b/B)·woe in 1e-6 fixed point, exact integer sum
      round((col("g").cast("double") / col("gt").cast("double") -
        col("b").cast("double") / col("bt").cast("double")) * woe *
        lit(1e6), 0).cast("long")
    val perBucket = cells.crossJoin(broadcast(tot))
      .select(col("bin"), col("g"), col("b"),
        (col("g") === 0 || col("b") === 0).cast("long").as("one_sided"),
        when(col("g") > 0 && col("b") > 0, round(woe, 4)).as("woe"),
        when(col("g") > 0 && col("b") > 0, ivTerm).otherwise(lit(0L))
          .as("ivq"))
    val iv = perBucket.agg(sum("ivq").as("siv"))
      .select(Seal.pow4("siv", 6).as("iv"))
    perBucket.drop("ivq").crossJoin(broadcast(iv))
  }

  /** Mean reciprocal rank: per group, the rank of the FIRST relevant
    * unit under (score desc, tie) ordering; MRR = mean 1/first_rank over
    * groups that have a relevant unit (groups without one are counted
    * but excluded from the mean — the [[mapAtK]] NULL convention, made
    * explicit in the n_groups / n_with_rel columns). The "how fast does
    * the ranking surface one good answer" metric next to MAP's
    * all-answers view. 1/rank quantizes to a 1e-6 fixed-point long
    * before the cross-group mean. Rank-window parallelism = group
    * cardinality (the family's scale note). */
  def mrr(df: DataFrame, group: Column, score: Column, label: Column,
          tie: Column): DataFrame = {
    val w = Window.partitionBy("g").orderBy(desc("s"), col("id"))
    val base = df.select(group.as("g"), score.cast("long").as("s"),
        label.cast("long").as("y"), tie.as("id"))
      .where(col("s").isNotNull && col("y").isNotNull)
      .localCheckpoint() // group census + first-relevant share the table
    val fr = base.withColumn("rn", row_number().over(w))
      .where(col("y") > 0)
      .groupBy("g").agg(min("rn").as("fr"))
    val ng = base.agg(countDistinct(col("g")).as("n_groups"))
    fr.select(round(lit(1e6) / col("fr"), 0).cast("long").as("rr"))
      .agg(count(lit(1)).as("n_with_rel"), sum("rr").as("srr"))
      .crossJoin(broadcast(ng))
      .select(col("n_groups"), col("n_with_rel"),
        round(col("srr").cast("double") /
          (lit(1e6) * col("n_with_rel").cast("double")), 4).as("mrr"))
  }

  /** Qini-style cumulative uplift by descending score band: units carry
    * a treatment arm, a binary outcome, and an integer score band;
    * bands accumulate from the highest score down, and each prefix
    * reports qini = cumY_T − cumY_C · cumN_T / cumN_C — treated
    * conversions in excess of the control rate scaled to the treated
    * population (the uplift-model acceptance curve; a random ranking
    * tracks 0). Bands are caller-built VALUE bands (tie-order-free
    * literals, the [[woeIv]] convention). Cumulative window runs over
    * the BAND spine (bounded), not units; the unit table collapses in
    * one (band, arm)-keyed aggregation. cumN_C = 0 prefixes emit NULL
    * qini via nullif. */
  def qiniBands(df: DataFrame, band: Column, treated: Column,
                outcome: Column): DataFrame = {
    val cells = df.select(band.cast("long").as("band"),
        treated.cast("long").as("t"), outcome.cast("long").as("y"))
      .where(col("band").isNotNull && col("t").isNotNull &&
        col("y").isNotNull)
      .groupBy("band")
      .agg(sum(when(col("t") === 1, 1L).otherwise(0L)).as("nt"),
        sum(when(col("t") === 0, 1L).otherwise(0L)).as("nc"),
        sum(when(col("t") === 1, col("y")).otherwise(0L)).as("yt"),
        sum(when(col("t") === 0, col("y")).otherwise(0L)).as("yc"))
    val w = Window.orderBy(desc("band"))
      .rowsBetween(Window.unboundedPreceding, 0)
    cells
      .withColumn("cnt", sum("nt").over(w))
      .withColumn("cnc", sum("nc").over(w))
      .withColumn("cyt", sum("yt").over(w))
      .withColumn("cyc", sum("yc").over(w))
      .select(col("band"), col("nt"), col("nc"), col("yt"), col("yc"),
        round(col("cyt").cast("double") -
          col("cyc").cast("double") * col("cnt").cast("double") /
            nullif(col("cnc"), lit(0L)).cast("double"), 4).as("qini"))
  }

  /** Probability-score quality: Brier score and log-loss over a [0,1]
    * probability column — the proper-scoring-rule companions to
    * [[aucRoc]] (AUC sees only the ranking; these see the calibration).
    * Log-loss clamps p to [eps, 1−eps] so degenerate 0/1 probabilities
    * score finitely (the standard implementation rule, stated here
    * rather than inherited silently).
    *
    * Determinism: p is a caller-built double expression (identical
    * formula both engines); each row's squared error and each row's
    * negative log-likelihood are quantized to 1e-6 fixed-point longs
    * before the global sum — the sums are exact at any row count — then
    * one sealed division each. NULL p or label rows drop (family
    * convention). Single aggregation, no shuffle beyond it. */
  def brierLogloss(df: DataFrame, p: Column, label: Column,
                   eps: Double = 1e-6): DataFrame = {
    val base = df.select(p.cast("double").as("p"),
        label.cast("long").as("y"))
      .where(col("p").isNotNull && col("y").isNotNull)
    val pc = least(greatest(col("p"), lit(eps)), lit(1.0 - eps))
    val d = col("p") - col("y").cast("double")
    val sq = round(d * d * lit(1e6), 0).cast("long")
    val nll = round(-(col("y").cast("double") * log(pc) +
      (lit(1.0) - col("y").cast("double")) * log(lit(1.0) - pc)) * lit(1e6),
      0).cast("long")
    base.agg(count(lit(1)).as("n"), sum("y").as("n_pos"),
        sum(sq).as("sq"), sum(nll).as("nl"))
      .select(col("n"), col("n_pos"),
        round(col("sq").cast("double") / col("n").cast("double") / lit(1e6),
          4).as("brier"),
        round(col("nl").cast("double") / col("n").cast("double") / lit(1e6),
          4).as("logloss"))
  }
}
