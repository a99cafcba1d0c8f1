package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk profiling before a dataset leaves the pipeline —
  * k-anonymity (Sweeney 2002) and l-diversity (Machanavalingam et al.
  * 2007) over quasi-identifier (QI) column sets, plus the
  * generalization ladder that shows how coarsening the QIs trades
  * information for anonymity.
  *
  * Scale shape: everything is ONE hash aggregation keyed by the QI
  * tuple (the shuffle key a release audit needs anyway) followed by a
  * report-sized re-aggregation — no windows, no joins, no per-group
  * sort. Group counts and distinct-sensitive counts are exact integer
  * aggregations; the only doubles are final report ratios sealed with
  * round(,4) (FIXTURES.md). NULL QI values form their own group in
  * both engines (GROUP BY keeps the null tuple), so a null-laden
  * column honestly shows up as one big low-risk group rather than
  * silently vanishing.
  */
object Privacy {

  /** Per-QI-group row counts: (qi..., n) — the base table both reports
    * re-aggregate. Exposed so callers can also list/suppress the
    * violating groups themselves. */
  def qiGroups(df: DataFrame, qi: Seq[(String, Column)]): DataFrame =
    df.select(qi.map { case (n, c) => c.as(n) }: _*)
      .groupBy(qi.map(q => col(q._1)): _*)
      .agg(count(lit(1)).as("n"))

  /** One-row k-anonymity report: a release is k-anonymous iff every QI
    * group holds ≥ k rows. Emits (n_rows, n_groups, min_group_size,
    * n_violating = groups under k, rows_at_risk = rows in them,
    * at_risk_share). */
  def kAnonymityReport(df: DataFrame, qi: Seq[(String, Column)],
                       k: Long): DataFrame = {
    require(k >= 2, "k must be >= 2 (k=1 is vacuous)")
    // coalesce the count sums: an EMPTY release must report zeros, not
    // SQL NULLs (the snapshotDiff convention); min_group_size and the
    // share stay NULL — genuinely undefined over zero groups
    qiGroups(df, qi)
      .agg(coalesce(sum("n"), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_groups"),
        min("n").as("min_group_size"),
        coalesce(sum(when(col("n") < k, 1L).otherwise(0L)), lit(0L))
          .as("n_violating"),
        coalesce(sum(when(col("n") < k, col("n")).otherwise(0L)), lit(0L))
          .as("rows_at_risk"))
      .select(col("n_rows"), col("n_groups"), col("min_group_size"),
        col("n_violating"), col("rows_at_risk"),
        when(col("n_rows") > 0,
          Seal.ratio4("rows_at_risk", "n_rows")).as("at_risk_share"))
  }

  /** One-row l-diversity report: k-anonymity alone still leaks when a
    * small group is UNIFORM in the sensitive attribute — l-diversity
    * requires ≥ l distinct sensitive values per QI group. Emits
    * (n_groups, min_diversity, n_low_diversity = groups under l,
    * rows_in_low = rows in them). */
  def lDiversityReport(df: DataFrame, qi: Seq[(String, Column)],
                       sensitive: Column, l: Long): DataFrame = {
    require(l >= 2, "l must be >= 2")
    val g = df.select(qi.map { case (n, c) => c.as(n) } :+
        sensitive.as("__sv"): _*)
      .groupBy(qi.map(q => col(q._1)): _*)
      .agg(count(lit(1)).as("n"), countDistinct(col("__sv")).as("ndv"))
    // empty input → zero counts, NULL min (the kAnonymityReport rule)
    g.agg(count(lit(1)).as("n_groups"), min("ndv").as("min_diversity"),
      coalesce(sum(when(col("ndv") < l, 1L).otherwise(0L)), lit(0L))
        .as("n_low_diversity"),
      coalesce(sum(when(col("ndv") < l, col("n")).otherwise(0L)), lit(0L))
        .as("rows_in_low"))
  }

  /** Generalization ladder: the [[kAnonymityReport]] at each QI
    * coarsening level, stacked — the table a release reviewer reads to
    * pick the least-general level that clears the k bar. Levels are
    * evaluated independently (each is its own QI-keyed aggregation —
    * level coverage differs, so nothing is shared) and union by name
    * with the level tag first. */
  def generalizationLadder(df: DataFrame,
                           levels: Seq[(String, Seq[(String, Column)])],
                           k: Long): DataFrame = {
    require(levels.nonEmpty, "need at least one generalization level")
    levels.map { case (tag, qi) =>
      kAnonymityReport(df, qi, k).select(lit(tag).as("level"), col("*"))
    }.reduce(_.unionByName(_))
  }

  /** Per-QI-group t-closeness over an ordered NUMERIC sensitive
    * attribute (Li et al. 2007) — the member of the release ladder that
    * [[kAnonymityReport]]/[[lDiversityReport]] miss: a group can be
    * large AND diverse yet still leak when its sensitive DISTRIBUTION
    * sits far from the table's (e.g. one segment×nation holding only
    * top-decile balances). t = the 1-D Wasserstein distance between the
    * group's and the table's distribution over `bins` equal-width bins
    * of the global value range, normalized by (bins−1) so t ∈ [0, 1]
    * (the ordered-attribute EMD of the paper, same cumulative device as
    * Drift.emd1d / q166).
    *
    * Determinism: binning is pure integer arithmetic over the global
    * [lo, hi] envelope — bin = (v−lo)·bins div (hi−lo+1); cumulative
    * counts are exact integers over a dense per-group bin spine; the
    * EMD numerator Σ|cum_g·N − cum_all·n_g| is exact decimal(38,0) and
    * the single division seals with the ratio4 device.
    *
    * Scale shape: one 2-row-group envelope agg (1-row broadcast), ONE
    * corpus aggregation keyed (QI, bin), then windows/joins over the
    * group×bins spine only (groups ≪ rows — the release's equivalence
    * classes). No corpus window, no corpus join.
    *
    * Rows with a NULL in any QI column are EXCLUDED up front: a null
    * "group" is not an equivalence class a release would publish, and
    * the internal spine/group equi-joins are deliberately not
    * null-safe — without the filter a null-keyed group would silently
    * vanish from the report (or, in the SQL spelling, survive with a
    * zeroed cumulative and a bogus t). */
  def tClosenessReport(df: DataFrame, qi: Seq[(String, Column)],
                       sensitive: Column, bins: Int): DataFrame = {
    require(bins >= 2, "need >= 2 bins")
    val qiCols = qi.map(q => col(q._1))
    val base = df.select(qi.map { case (n, c) => c.as(n) } :+
      sensitive.cast("long").as("__v"): _*)
      .where(qiCols.map(_.isNotNull).reduce(_ && _) && col("__v").isNotNull)
    val env = base.agg(min("__v").as("lo"), max("__v").as("hi"))
    val binned = base.crossJoin(broadcast(env))
      .select(qiCols :+
        org.apache.spark.sql.graft.VectorExprs.idiv(
          (col("__v") - col("lo")) * bins, col("hi") - col("lo") + 1)
          .cast("long").as("bin"): _*)
    val cells = binned.groupBy(qiCols :+ col("bin"): _*)
      .agg(count(lit(1)).as("c"))
    // dense (group × bin) spine: absent bins must contribute their
    // cumulative term, exactly like the q166 dense-bin convention
    val groups = cells.groupBy(qiCols: _*).agg(sum("c").as("n_g"))
    val spine = groups.select(qiCols :+
      explode(sequence(lit(0L), lit(bins - 1L))).as("bin"): _*)
    val dense = spine.join(cells, qi.map(_._1) :+ "bin", "left")
      .select(qiCols ++ Seq(col("bin"),
        coalesce(col("c"), lit(0L)).as("c")): _*)
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy(qiCols: _*).orderBy("bin")
      .rowsBetween(Long.MinValue, 0)
    val globals = dense.groupBy("bin").agg(sum("c").as("cb"))
    val wAll = org.apache.spark.sql.expressions.Window.orderBy("bin")
      .rowsBetween(Long.MinValue, 0)
    // bins-row table: the global cumulative counts (bounded spine)
    val gcum = globals.select(col("bin"), sum("cb").over(wAll).as("cum_all"))
    val nAll = globals.agg(sum("cb").as("n_all"))
    val withCum = dense.join(groups, qi.map(_._1))
      .select(qiCols ++ Seq(col("bin"), col("n_g"),
        sum("c").over(wg).as("cum_g")): _*)
      // no broadcast hint on gcum: bounded by construction (bins rows)
      // but grouped over a corpus-derived child, so the hint audit can't
      // prove it — AQE broadcasts the bins-row side at runtime anyway
      .join(gcum, Seq("bin"))
      .crossJoin(broadcast(nAll))
      // the last bin's cumulative equals the totals on both sides and
      // contributes zero — keep it; |Σ| terms in exact decimal space
      .select(qiCols ++ Seq(col("n_g"), col("n_all"),
        abs(col("cum_g").cast("decimal(38,0)") * col("n_all") -
          col("cum_all").cast("decimal(38,0)") * col("n_g"))
          .as("term")): _*)
    withCum.groupBy(qiCols :+ col("n_g") :+ col("n_all"): _*)
      .agg(sum("term").as("emd_num"))
      .withColumn("emd_den",
        col("n_g").cast("decimal(38,0)") * col("n_all") * lit(bins - 1))
      .select(qiCols ++ Seq(col("n_g").as("n"),
        Seal.ratio4("emd_num", "emd_den").as("t_emd")): _*)
  }

  /** Differentially-private histogram release: per-category counts plus
    * Laplace(1/ε) noise — the simplest ε-DP mechanism, with parallel
    * composition across disjoint cells so the whole histogram costs one
    * ε. Rounds out the release toolkit: [[kAnonymityReport]] profiles a
    * microdata release, this one releases aggregates directly.
    *
    * The noise is DERIVED, not drawn: u = (hash60(cell∥salt) mod 10⁶ +
    * 0.5)/10⁶ ∈ (0,1), noise = −(1/ε)·sgn(u−½)·ln(1−2|u−½|) — the exact
    * inverse-CDF transform of Laplace, on a uniform that both engines
    * compute from the same md5 bytes. A seeded release is what a real
    * pipeline wants anyway (reruns must not leak fresh noise draws —
    * the "averaging attack" — so production DP systems pin noise to a
    * release id; `salt` IS that release id here), and it is what makes
    * the operator oracle-checkable. Noisy counts are sealed with
    * round(,4); true counts never leave the operator.
    *
    * Scale: one cell-keyed aggregation; noise is a per-cell scalar
    * expression on the aggregated (tiny) table. */
  /** Right-to-erasure audit: after a deletion pass, how many rows keyed
    * to tombstoned subjects still exist? Reports the tombstone census,
    * lingering distinct keys and rows, and the lingering share of the
    * table — the compliance gate that must read ZERO before an erasure
    * job is signed off (and reads the exact damage when it doesn't).
    * One distinct pass over tombstones (broadcast — the erasure list is
    * small by nature), one semi-join-shaped conditional aggregation
    * over the audited table; no corpus shuffle. */
  def erasureAudit(df: DataFrame, key: Column, tombstones: DataFrame,
                   tKey: Column): DataFrame = {
    val ts = tombstones.select(tKey.as("tk")).where(col("tk").isNotNull)
      .distinct()
    val nTs = ts.agg(count(lit(1)).as("n_tombstoned"))
    val joined = df.select(key.as("k")).where(col("k").isNotNull)
      .join(broadcast(ts), col("k") === col("tk"), "left")
    joined.agg(count(lit(1)).as("n_rows"),
        sum(when(col("tk").isNotNull, 1L).otherwise(0L))
          .as("n_lingering_rows"),
        countDistinct(when(col("tk").isNotNull, col("k")))
          .as("n_lingering_keys"))
      .crossJoin(broadcast(nTs))
      .select(col("n_tombstoned"), col("n_lingering_keys"),
        col("n_lingering_rows"), col("n_rows"),
        round(col("n_lingering_rows").cast("double") /
          nullif(col("n_rows").cast("double"), lit(0.0)), 4)
          .as("lingering_share"))
  }

  def dpHistogram(df: DataFrame, cell: Column, epsilon: Double,
                  salt: String): DataFrame = {
    require(epsilon > 0, "epsilon must be > 0")
    val u = (pmod(Dedup.hash60(concat(col("cell").cast("string"), lit(salt))),
      lit(1000000L)).cast("double") + lit(0.5)) / lit(1e6)
    val cen = u - lit(0.5)
    val noise = (lit(-1.0) / lit(epsilon)) * signum(cen) *
      log(lit(1.0) - lit(2.0) * abs(cen))
    df.select(cell.as("cell")).where(col("cell").isNotNull)
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .select(col("cell"),
        round(col("n").cast("double") + noise, 4).as("noisy_count"),
        lit(epsilon).as("epsilon"))
  }
}
