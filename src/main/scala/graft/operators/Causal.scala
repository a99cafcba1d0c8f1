package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Observational causal-inference estimators — the quasi-experimental
  * companions to [[Trend]]'s randomized readouts (diff-in-diff, CUPED,
  * subclassification ATE): instrumental-variable Wald, regression
  * discontinuity, and caliper nearest-neighbor matching.
  *
  * Determinism (FIXTURES.md): unit-level inputs are INTEGER-quantized;
  * every cross-row reduction is an exact long sum (conditional-sum
  * "side" device, one map-side-combinable aggregation); each statistic
  * is closed-form double arithmetic over those longs, mirrored verbatim
  * in the oracle SQL and sealed with round(,4). Degenerate inputs
  * (empty arms, zero first stage, no matches) yield SQL-NULL via
  * nullif, never NaN.
  */
object Causal {

  /** Instrumental-variable Wald estimator over one row per unit:
    * β_IV = (ȳ_{z=1} − ȳ_{z=0}) / (x̄_{z=1} − x̄_{z=0}) — the effect of
    * endogenous exposure `x` on outcome `y` identified by the binary
    * instrument `z` (valid when z shifts x but touches y only through
    * x). One aggregation: six conditional long sums; the reduced-form
    * and first-stage differences are each two single divisions, and β
    * is their ratio — all bit-identical IEEE steps. A dead first stage
    * (dx = 0) yields SQL-NULL β, the correct "instrument is
    * uninformative" answer. */
  def ivWald(df: DataFrame, z: Column, x: Column, y: Column): DataFrame = {
    val d = df.select(z.cast("long").as("z"), x.cast("long").as("x"),
        y.cast("long").as("y"))
      .where(col("z").isNotNull && col("x").isNotNull && col("y").isNotNull)
    val sums = d.agg(
      sum(when(col("z") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("z") =!= 1, 1L).otherwise(0L)).as("n0"),
      sum(when(col("z") === 1, col("x")).otherwise(0L)).as("sx1"),
      sum(when(col("z") =!= 1, col("x")).otherwise(0L)).as("sx0"),
      sum(when(col("z") === 1, col("y")).otherwise(0L)).as("sy1"),
      sum(when(col("z") =!= 1, col("y")).otherwise(0L)).as("sy0"))
    def mean(s: String, n: String) =
      col(s).cast("double") / nullif(col(n), lit(0L)).cast("double")
    // dy = sy1/n1 − sy0/n0 = (sy1·n0 − sy0·n1)/(n1·n0) — an exact
    // rational, as is dx; β = dy/dx cancels the common denominator to
    // dynum/dxnum. All three seal via Seal.ratio4; a zero-unit arm
    // (den NULL) or dead first stage (dxnum 0) yields SQL-NULL.
    sums
      .withColumn("dynum", col("sy1") * col("n0") - col("sy0") * col("n1"))
      .withColumn("dxnum", col("sx1") * col("n0") - col("sx0") * col("n1"))
      .withColumn("den", nullif(col("n1") * col("n0"), lit(0L)))
      .withColumn("dxnumn", nullif(col("dxnum"), lit(0L)))
      .select(col("n0"), col("n1"),
        Seal.ratio4("dynum", "den").as("reduced_form"),
        Seal.ratio4("dxnum", "den").as("first_stage"),
        when(col("den").isNotNull,
          Seal.ratio4("dynum", "dxnumn")).as("beta_iv"))
  }

  /** Sharp regression-discontinuity estimate: local linear fit of `y`
    * on the INTEGER-centered running variable `r` (treatment at
    * r ≥ 0) within ±`bandwidth`, effect = right-intercept minus
    * left-intercept at the cutoff. Both side fits come from ONE
    * aggregation of ten conditional long power sums (the [[Trend.olsTrend]]
    * closed form per side) — no second pass, no shuffle beyond the
    * global agg. Callers center/quantize `r` coarsely enough that
    * n·Σr² and Σy·Σr² stay inside Long (the shared contract). */
  def rddLocalLinear(df: DataFrame, r: Column, y: Column,
                     bandwidth: Long): DataFrame = {
    val d = df.select(r.cast("long").as("r"), y.cast("long").as("y"))
      .where(col("r").isNotNull && col("y").isNotNull &&
        abs(col("r")) <= bandwidth)
    def side(cond: Column, suf: String) = Seq(
      sum(when(cond, 1L).otherwise(0L)).as(s"n$suf"),
      sum(when(cond, col("r")).otherwise(0L)).as(s"sx$suf"),
      sum(when(cond, col("y")).otherwise(0L)).as(s"sy$suf"),
      sum(when(cond, col("r") * col("y")).otherwise(0L)).as(s"sxy$suf"),
      sum(when(cond, col("r") * col("r")).otherwise(0L)).as(s"sxx$suf"))
    val aggs = side(col("r") < 0, "l") ++ side(col("r") >= 0, "r")
    val sums = d.agg(aggs.head, aggs.tail: _*)
    // slopes/intercepts are exact integer rationals (Seal.ratio4); the
    // effect differences the SEALED intercepts — both are on the 1e-4
    // grid, so the difference is exact there and the final round is a
    // grid-snap, never a boundary call
    def denI(s: String) = nullif(
      col(s"n$s") * col(s"sxx$s") - col(s"sx$s") * col(s"sx$s"), lit(0L))
    val withNumDen = sums
      .withColumn("dl", denI("l")).withColumn("dr", denI("r"))
      .withColumn("snl", col("nl") * col("sxyl") - col("sxl") * col("syl"))
      .withColumn("snr", col("nr") * col("sxyr") - col("sxr") * col("syr"))
      .withColumn("inl", col("syl") * col("sxxl") - col("sxl") * col("sxyl"))
      .withColumn("inr", col("syr") * col("sxxr") - col("sxr") * col("sxyr"))
    withNumDen.select(col("nl").as("n_left"), col("nr").as("n_right"),
      Seal.ratio4("snl", "dl").as("slope_left"),
      Seal.ratio4("snr", "dr").as("slope_right"),
      Seal.ratio4("inl", "dl").as("icept_left"),
      Seal.ratio4("inr", "dr").as("icept_right"),
      round(Seal.ratio4("inr", "dr") - Seal.ratio4("inl", "dl"), 4)
        .as("rdd_effect"))
  }

  /** With-replacement caliper 1-NN matching ATT: each treated unit is
    * matched to the nearest control by the INTEGER score `s` (within
    * ±`caliper`, ties prefer the control at-or-below, then the
    * representative control with the lowest `tie` key), and the
    * average treated-minus-matched-control outcome is reported over
    * matched units only.
    *
    * Scale shape: NO global sort/window. Controls collapse to one
    * representative row per distinct score (min-tie unit, min_by);
    * treated collapse to (score, n, Σy). Candidate generation is a
    * bucketed equi-join — controls key to floor(s/caliper), treated
    * explode to the three adjacent buckets, so every in-caliper pair
    * meets exactly once and candidates are bounded by local score
    * density, never corpus². Selection is an integer-rank min_by
    * (rank = 2·|Δ| + above-flag — unique per treated score because
    * controls are score-distinct). The oracle states the same match as
    * a plain |Δ| ≤ caliper inequality join, fine at oracle scale. */
  def caliperMatchAtt(df: DataFrame, treated: Column, s: Column,
                      y: Column, tie: Column, caliper: Long): DataFrame = {
    val u = df.select(treated.cast("boolean").as("tr"),
        s.cast("long").as("s"), y.cast("long").as("y"),
        tie.cast("long").as("tie"))
      .where(col("tr").isNotNull && col("s").isNotNull &&
        col("y").isNotNull)
    val trg = u.where(col("tr"))
      .groupBy("s").agg(count(lit(1)).as("nt"), sum("y").as("syt"))
    // exact integer floor-division bucket (negative-safe via pmod)
    def bucket(c: Column) = (c - pmod(c, lit(caliper))) / caliper
    val ctl = u.where(!col("tr"))
      .groupBy("s").agg(min_by(col("y"), col("tie")).as("yc"))
      .select(col("s").as("cs"), col("yc"), bucket(col("s")).as("cb"))
    val cand = trg
      .withColumn("jb", explode(array(bucket(col("s")) - 1,
        bucket(col("s")), bucket(col("s")) + 1)))
      .join(ctl, col("jb") === col("cb"))
      .where(abs(col("cs") - col("s")) <= caliper)
      .select(col("s"), col("nt"), col("syt"), col("yc"),
        (abs(col("cs") - col("s")) * 2 +
          when(col("cs") > col("s"), 1L).otherwise(0L)).as("rank"))
    val best = cand.groupBy("s")
      .agg(min("nt").as("nt"), min("syt").as("syt"),
        min_by(col("yc"), col("rank")).as("yc"))
    val matched = best.agg(
      coalesce(sum("nt"), lit(0L)).as("n_matched"),
      coalesce(sum("syt"), lit(0L)).as("sy"),
      coalesce(sum(col("nt") * col("yc")), lit(0L)).as("sc"))
    val total = trg.agg(coalesce(sum("nt"), lit(0L)).as("n_treated"))
    total.crossJoin(broadcast(matched))
      .select(col("n_treated"), col("n_matched"),
        round((col("sy") - col("sc")).cast("double") /
          nullif(col("n_matched").cast("double"), lit(0.0)), 4).as("att"))
  }
}
