package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival estimation over right-censored durations — the churn /
  * time-to-event readout (how long do users stay active? how long until a
  * signup converts?) that the A/B family (q167/q168/q170) needs once the
  * metric is a TIME rather than a rate.
  */
object Survival {
  /** Kaplan–Meier product-limit estimator (Kaplan & Meier 1958): input is
    * one row per subject with an integer `duration` (time units survived
    * from that subject's own start) and `observed` (1 = the terminal event
    * happened at `duration`, 0 = right-censored there). Emits one row per
    * distinct EVENT time t with n_risk (subjects whose duration ≥ t),
    * n_events (observed events at t), and the survival curve
    * S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ); censored-only times shape n_risk but
    * add no product factor.
    *
    * Scale: one duration-keyed aggregation collapses the subject table to
    * a TIME-CARDINALITY table (distinct durations — days, so thousands of
    * rows at most); every window below runs over that collapsed table, so
    * the single-partition ordering window is bounded regardless of subject
    * count (the [[Skew.keyDistribution]] convention).
    *
    * Determinism (FIXTURES.md): n_risk comes from exact cumulative long
    * sums; each factor enters as ln(1−d/n) quantized to 1e-8 fixed-point
    * longs, the running product is the exact long sum of those, and one
    * exp seals it (ln/exp agree through round(,4) cross-engine — the
    * q80/q92 precedent). A time where d = n (everyone at risk dies) would
    * put ln(0) in the sum, so from that row on survival is pinned to
    * literal 0.0 via a cumulative max flag instead. */
  def kaplanMeier(df: DataFrame, duration: Column, observed: Column): DataFrame = {
    // NULL durations drop BEFORE the time spine: a null t row would enter
    // the unpartitioned Window.orderBy("t") prefix sums, where Spark
    // sorts NULLS FIRST but DuckDB's ORDER BY t sorts NULLS LAST — every
    // n_risk would silently diverge (the Sequences tie-key convention).
    val byT = df.select(duration.cast("long").as("t"),
        observed.cast("int").as("ev"))
      .where(col("t").isNotNull)
      .groupBy("t")
      .agg(count(lit(1)).as("n_at"), sum("ev").cast("long").as("d_at"))
    val tot = byT.agg(sum("n_at").as("n_total"))
    val wPrev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = byT.crossJoin(broadcast(tot))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum("n_at").over(wPrev), lit(0L)))
      .where(col("d_at") > 0)
      .withColumn("lnq", when(col("d_at") < col("n_risk"),
        round(log(lit(1.0) - col("d_at").cast("double") /
          col("n_risk").cast("double")) * lit(1e8), 0).cast("long"))
        .otherwise(lit(0L)))
      .withColumn("dead", when(col("d_at") >= col("n_risk"), 1).otherwise(0))
    risk.select(col("t"), col("n_risk"), col("d_at").as("n_events"),
        when(max("dead").over(wCum) > 0, lit(0.0))
          .otherwise(round(exp(sum("lnq").over(wCum).cast("double") /
            lit(1e8)), 4)).as("survival"))
      .orderBy("t")
  }

  /** Nelson-Aalen cumulative-hazard estimator Ĥ(t) = Σ_{tᵢ≤t} dᵢ/nᵢ —
    * the additive companion to [[kaplanMeier]] (KM multiplies survival
    * factors; NA sums hazard increments, the better-behaved quantity
    * for small risk sets and the input to hazard-ratio eyeballing).
    * Same shape: one duration aggregation, risk sets by prefix sums
    * over the DISTINCT-duration spine (day-cardinality rows — the KM
    * window convention), each dᵢ/nᵢ increment one double op quantized
    * to 1e-6 fixed-point before the exact cumulative sum. */
  def nelsonAalen(df: DataFrame, duration: Column,
                  observed: Column): DataFrame = {
    // same null-duration drop as kaplanMeier: Spark NULLS FIRST vs DuckDB
    // NULLS LAST in the unpartitioned ORDER BY t would shift every n_risk
    val byT = df.select(duration.cast("long").as("t"),
        observed.cast("int").as("ev"))
      .where(col("t").isNotNull)
      .groupBy("t")
      .agg(count(lit(1)).as("n_at"), sum("ev").cast("long").as("d_at"))
    val tot = byT.agg(sum("n_at").as("n_total"))
    val wPrev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT.crossJoin(broadcast(tot))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum("n_at").over(wPrev), lit(0L)))
      .where(col("d_at") > 0)
      .withColumn("h6", round(col("d_at").cast("double") /
        col("n_risk").cast("double") * lit(1e6), 0).cast("long"))
      .withColumn("ch6", sum("h6").over(wCum))
      .select(col("t"), col("n_risk"), col("d_at").as("n_events"),
        // cumulative 1e-6 hazard seals to 4 decimals in integer space
        // (Seal.pow4): k/1e6 is a .00005 tie whenever k ≡ 50 (mod 100)
        Seal.pow4("ch6", 6).as("cum_hazard"))
      .orderBy("t")
  }

  /** Two-arm log-rank test (Mantel-Cox): are the survival curves of
    * groups `a` and `b` the same? At each distinct EVENT time t with
    * d_t total deaths, n_{a,t}/n_t at risk in arm a:
    *   E_a = Σ d_t·n_{a,t}/n_t,
    *   V   = Σ d_t·(n_a/n)·(n_b/n)·(n−d)/(n−1),
    *   χ²  = (O_a − E_a)² / V.
    * Same machinery as [[kaplanMeier]]: one duration aggregation per
    * arm to the shared distinct-time spine, risk sets by prefix sums
    * over that time-cardinality table. Per-time E and V terms are
    * single-double rationals over exact longs quantized to 1e-6
    * fixed-point before the exact sums (the CMH device), and the χ²
    * seals as (O6−E6)²/(10⁶·V6) in integer space. */
  def logRank(df: DataFrame, duration: Column, observed: Column,
              group: Column, a: String, b: String): DataFrame = {
    val byT = df.select(duration.cast("long").as("t"),
        observed.cast("int").as("ev"), group.as("g"))
      .where(col("t").isNotNull && col("g").isin(a, b))
      .groupBy("t")
      .agg(sum(when(col("g") === a, 1L).otherwise(0L)).as("na_at"),
        sum(when(col("g") === b, 1L).otherwise(0L)).as("nb_at"),
        sum(when(col("g") === a, col("ev")).otherwise(0)).cast("long")
          .as("da_at"),
        sum(when(col("g") === b, col("ev")).otherwise(0)).cast("long")
          .as("db_at"))
    val tot = byT.agg(sum("na_at").as("na_tot"), sum("nb_at").as("nb_tot"))
    val wPrev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = byT.crossJoin(broadcast(tot))
      .withColumn("na_r", col("na_tot") -
        coalesce(sum("na_at").over(wPrev), lit(0L)))
      .withColumn("nb_r", col("nb_tot") -
        coalesce(sum("nb_at").over(wPrev), lit(0L)))
      .withColumn("d", col("da_at") + col("db_at"))
      .withColumn("n", col("na_r") + col("nb_r"))
      .where(col("d") > 0)
    def q6(x: Column) = round(x * lit(1e6), 0).cast("long")
    val terms = risk.select(col("da_at"),
      q6(col("d").cast("double") * col("na_r") / col("n")).as("e6"),
      when(col("n") > 1,
        q6(col("d").cast("double") * col("na_r") * col("nb_r") *
          (col("n") - col("d")) /
          (col("n").cast("double") * col("n") * (col("n") - 1))))
        .otherwise(lit(0L)).as("v6"))
    terms.agg(sum("da_at").as("o_a"), sum("e6").as("e6"),
        sum("v6").as("v6"))
      .withColumn("dev6", col("o_a") * lit(1000000L) - col("e6"))
      .withColumn("cnum", col("dev6").cast("decimal(38,0)") * col("dev6"))
      .withColumn("cden", nullif(lit(1000000L).cast("decimal(38,0)") *
        col("v6"), lit(java.math.BigDecimal.ZERO)))
      .select(col("o_a").as("observed_a"),
        Seal.pow4("e6", 6).as("expected_a"),
        Seal.ratio4("cnum", "cden").as("chi2"))
  }
}
