package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift metrics between two labeled slices of a numeric
  * column — the ML-monitoring complement to [[Trend.ksTest]]: PSI is the
  * industry-standard "has the feature shifted?" score (banking/model-
  * monitoring convention: <0.1 stable, >0.25 action), EMD (1-D
  * Wasserstein) weighs drift by HOW FAR mass moved, which KS/PSI ignore.
  *
  * Both run on a DENSE equi-width histogram: one corpus pass bins both
  * slices (conditional counts, map-side combinable), a `sequence()` bin
  * spine left-joins the counts so empty bins exist (cumulative
  * differences persist across empty bins — dropping them silently
  * understates EMD; PSI's Laplace smoothing needs them too), and the
  * per-bin terms are quantized to fixed-point longs BEFORE the final sum
  * (identical doubles in, identical longs out — the q108/q153 device),
  * so the cross-bin aggregation is exact at any bin count.
  */
object Drift {

  /** Bhattacharyya coefficient/distance between two labels'
    * distributions of an INTEGER metric over fixed equi-width bins:
    * BC = Σ_b √(p_b·q_b), D = −ln BC — the overlap-style drift metric
    * that complements PSI (ratio-sensitive) and EMD (mass-transport):
    * BC reads directly as "how much of the two densities coincide".
    * One conditional bin aggregation over the dense bin spine (zero
    * bins contribute 0 to BC — no smoothing needed, unlike KL);
    * each √(p·q) term is one double op over exact counts quantized to
    * 1e-9 fixed-point before the bins-sized sum. NULL D when the
    * distributions share no mass. */
  def bhattacharyya(df: DataFrame, label: Column, v: Column,
                    a: String, b: String, lo: Long, hi: Long,
                    bins: Int): DataFrame = {
    require(bins >= 2 && hi > lo, "bad binning")
    val d = df.select(label.as("l"), v.cast("long").as("v"))
      .where(col("l").isin(a, b) && col("v").isNotNull)
    val bin = least(floor(greatest((col("v") - lo) * bins /
      lit(hi - lo), lit(0L))).cast("long"), lit(bins - 1L))
    val counts = d.select(col("l"), bin.as("b"))
      .groupBy("b")
      .agg(sum(when(col("l") === a, 1L).otherwise(0L)).as("ca"),
        sum(when(col("l") === b, 1L).otherwise(0L)).as("cb"))
    val tots = counts.agg(sum("ca").as("na"), sum("cb").as("nb"))
    counts.crossJoin(broadcast(tots))
      .select(col("na"), col("nb"),
        round(sqrt(col("ca").cast("double") / col("na") *
          (col("cb").cast("double") / col("nb"))) * lit(1e9), 0)
          .cast("long").as("t9"))
      .groupBy("na", "nb").agg(sum("t9").as("bc9"))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        // exact 1e-9 rational seals in integer space (Seal.pow4); the
        // log-composed distance keeps the double seal (transcendental)
        Seal.pow4("bc9", 9).as("bc"),
        round(-log(nullif(col("bc9").cast("double") / lit(1e9),
          lit(0.0))), 4).as("bhattacharyya_dist"))
  }
  /** Dense per-bin counts: (bin 0..bins-1, ca, cb) + totals and range as
    * constant columns. One corpus aggregation + a bins-row spine. */
  private def binnedDense(df: DataFrame, label: Column, v: Column,
                          a: String, b: String, bins: Int): DataFrame = {
    val g = df.where(label.isin(a, b))
      .select(label.as("l"), v.cast("double").as("v"))
      // NULL metric rows carry no distribution mass: dropping them ONLY
      // from the bins (they have no bin key) while counting them in
      // n_a/n_b would deflate every share and corrupt the CDF tail
      .where(col("v").isNotNull)
    val mm = g.agg(min("v").as("lo"), max("v").as("hi"),
      sum(when(col("l") === a, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("l") === b, 1L).otherwise(0L)).as("n_b"))
    val cnt = g.crossJoin(broadcast(mm))
      .select(least(floor((col("v") - col("lo")) /
        ((col("hi") - col("lo")) / lit(bins.toDouble))), lit(bins - 1L))
        .as("bin"), col("l"))
      .groupBy("bin")
      .agg(sum(when(col("l") === a, 1L).otherwise(0L)).as("ca"),
        sum(when(col("l") === b, 1L).otherwise(0L)).as("cb"))
    mm.select(explode(expr(s"sequence(0L, ${bins - 1}L)")).as("bin"),
        col("lo"), col("hi"), col("n_a"), col("n_b"))
      .join(cnt, Seq("bin"), "left")
      .select(col("bin"), col("lo"), col("hi"), col("n_a"), col("n_b"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
  }

  /** Population Stability Index with Laplace smoothing
    * (p = (c+1)/(n+bins), so empty bins contribute finite terms):
    * PSI = Σ_bins (p−q)·ln(p/q). Per-bin terms quantized to 1e-8
    * fixed-point longs before the sum. */
  def psi(df: DataFrame, label: Column, v: Column, a: String, b: String,
          bins: Int = 20): DataFrame = {
    require(bins >= 2 && bins <= 1000, "bins must be in [2, 1000]")
    val p = (col("ca") + 1).cast("double") /
      (col("n_a") + bins).cast("double")
    val q = (col("cb") + 1).cast("double") /
      (col("n_b") + bins).cast("double")
    binnedDense(df, label, v, a, b, bins)
      .select(col("n_a"), col("n_b"),
        round((p - q) * log(p / q) * lit(1e8), 0).cast("long").as("t"))
      .groupBy("n_a", "n_b")
      .agg(sum("t").as("s8"))
      .select(lit(a).as("label_a"), lit(b).as("label_b"),
        col("n_a"), col("n_b"), Seal.pow4("s8", 8).as("psi"))
  }

  /** Jensen–Shannon divergence on the binned distributions, in nats:
    * JSD = ½·KL(p‖m) + ½·KL(q‖m) with m = (p+q)/2 — the SYMMETRIC,
    * always-finite drift score, bounded in [0, ln 2], that PSI's
    * unbounded log-ratio form is not. Same Laplace smoothing as [[psi]]
    * (p = (c+1)/(n+bins)), per-bin terms quantized to 1e-8 fixed-point
    * longs before the exact sum. */
  def jsd(df: DataFrame, label: Column, v: Column, a: String, b: String,
          bins: Int = 20): DataFrame = {
    require(bins >= 2 && bins <= 1000, "bins must be in [2, 1000]")
    val p = (col("ca") + 1).cast("double") /
      (col("n_a") + bins).cast("double")
    val q = (col("cb") + 1).cast("double") /
      (col("n_b") + bins).cast("double")
    val m = (p + q) / lit(2.0)
    binnedDense(df, label, v, a, b, bins)
      .select(col("n_a"), col("n_b"),
        round((p * log(p / m) + q * log(q / m)) * lit(0.5) * lit(1e8), 0)
          .cast("long").as("t"))
      .groupBy("n_a", "n_b")
      .agg(sum("t").as("s8"))
      .select(lit(a).as("label_a"), lit(b).as("label_b"),
        col("n_a"), col("n_b"), Seal.pow4("s8", 8).as("jsd"))
  }

  /** 1-D earth mover's distance on the binned distributions, in VALUE
    * units: EMD = Σ_bins |CDF_a − CDF_b| · binWidth. The cumulative sums
    * are exact long window aggregates over the bins-row spine; each
    * per-bin term is quantized to a 1e-6 fixed-point long. */
  def emd1d(df: DataFrame, label: Column, v: Column, a: String, b: String,
            bins: Int = 20): DataFrame = {
    require(bins >= 2 && bins <= 1000, "bins must be in [2, 1000]")
    val w = Window.orderBy("bin")
    val width = (col("hi") - col("lo")) / lit(bins.toDouble)
    binnedDense(df, label, v, a, b, bins)
      .select(col("n_a"), col("n_b"), col("lo"), col("hi"),
        sum("ca").over(w).as("cpa"), sum("cb").over(w).as("cpb"))
      .select(col("n_a"), col("n_b"),
        round(abs(col("cpa").cast("double") / col("n_a").cast("double") -
          col("cpb").cast("double") / col("n_b").cast("double")) * width *
          lit(1e6), 0).cast("long").as("t"))
      .groupBy("n_a", "n_b")
      .agg(sum("t").as("s6"))
      .select(lit(a).as("label_a"), lit(b).as("label_b"),
        col("n_a"), col("n_b"), Seal.pow4("s6", 6).as("emd"))
  }
}
