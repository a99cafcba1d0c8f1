package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Derived-column expressions (SURVEY §2.3; reference `src/transformers.py`
  * rates/change/index + the example workloads). Pure narrow transforms — no
  * shuffle.
  */
object Derive {
  /** E4 — rate = numerator/denominator * per, with zero-denominator policy
    * (reference `src/transformers.py:74-111`):
    *   - "nan"  (default): 0-denominator -> NULL (pandas inf -> NaN)
    *   - "zero": 0-denominator -> 0
    *   - "inf":  0-denominator -> signed Infinity (kept for API parity; the
    *             oracle queries never use it — NaN/Inf break hash parity)
    */
  def rate(num: Column, den: Column, per: Double = 100d,
           handleZero: String = "nan"): Column = {
    val safe = num / nullif(den, lit(0)) * lit(per)
    handleZero match {
      case "nan"  => safe
      case "zero" => when(den === 0, lit(0d)).otherwise(safe)
      case "inf"  => when(den === 0,
        when(num > 0, lit(Double.PositiveInfinity))
          .when(num < 0, lit(Double.NegativeInfinity))
          .otherwise(lit(null)))
        .otherwise(safe)
      case other  => throw new IllegalArgumentException(
        s"unknown handle_zero '$other'; expected nan/zero/inf")
    }
  }

  /** E5 — conditional derived-demographics bundle
    * (reference `src/transformers.py:113-150`): each metric is added only
    * when its source columns are present in the frame. */
  def derivedDemographics(df: DataFrame): DataFrame = {
    val has = df.columns.toSet
    val derivations: Seq[(String, Seq[String], DataFrame => DataFrame)] = Seq(
      ("pct_white", Seq("white_pop", "total_population"),
        d => d.withColumn("pct_white", rate(col("white_pop"), col("total_population")))),
      ("pct_black", Seq("black_pop", "total_population"),
        d => d.withColumn("pct_black", rate(col("black_pop"), col("total_population")))),
      ("pct_hispanic", Seq("hispanic_pop", "total_population"),
        d => d.withColumn("pct_hispanic", rate(col("hispanic_pop"), col("total_population")))),
      ("poverty_rate", Seq("poverty_count", "total_population"),
        d => d.withColumn("poverty_rate", rate(col("poverty_count"), col("total_population")))),
      ("unemployment_rate", Seq("unemployed", "labor_force"),
        d => d.withColumn("unemployment_rate", rate(col("unemployed"), col("labor_force")))))
    derivations.foldLeft(df) { case (d, (_, needs, fn)) =>
      if (needs.forall(has)) fn(d) else d
    }
  }

  /** E7 — absolute + percent change between two period columns
    * (reference `src/transformers.py:262-276`; /0 -> NULL matches inf->NaN). */
  def change(t1: Column, t2: Column): (Column, Column) =
    (t2 - t1, (t2 - t1) / nullif(t1, lit(0)) * 100)

  /** J2 + E7 — two-period change via inner self-join on `key`
    * (reference `src/transformers.py:233-277`; inner join is deliberate —
    * geographies present in only one period are dropped, SURVEY §7.4.8). */
  def changeJoin(d1: DataFrame, d2: DataFrame, key: String, value: String): DataFrame = {
    val a = d1.select(col(key), col(value).as(s"${value}_t1"))
    val b = d2.select(col(key), col(value).as(s"${value}_t2"))
    val joined = a.join(b, Seq(key), "inner")
    val (abs, pct) = change(col(s"${value}_t1"), col(s"${value}_t2"))
    joined
      .withColumn(s"${value}_change", abs)
      .withColumn(s"${value}_pct_change", pct)
  }

  /** E10 — weighted composite index: optional min-max normalization of each
    * component, then Σ v_i * (w_i / Σw) (reference `src/transformers.py:190-231`).
    * Normalization stats come from a single global aggregate cross-joined
    * back (no Window.partitionBy() — empty frame = single-task shuffle). */
  def compositeIndex(df: DataFrame, weights: Map[String, Double],
                     outputCol: String = "composite_index",
                     normalize: Boolean = true): DataFrame = {
    val totalW = weights.values.sum
    val base = if (normalize) Normalize.minMax(df, weights.keys.toSeq) else df
    def comp(c: String): Column =
      (if (normalize) col(s"${c}_norm") else col(c)) * lit(weights(c) / totalW)
    base.withColumn(outputCol, weights.keys.toSeq.map(comp).reduce(_ + _))
  }

  /** Laspeyres / Paasche / Fisher price indices between two periods
    * over the items present in BOTH (the standard matched-model
    * basket): with per-item period totals (cᵢ = Σ value-cents,
    * qᵢ = Σ quantity) and unit price p̄ᵢ = cᵢ/qᵢ,
    *
    *   L = Σ p̄₁q₀ / Σ c₀,   P = Σ c₁ / Σ p̄₀q₁,   F = √(L·P)
    *
    * — the denominators Σ p̄₀q₀ = Σ c₀ and numerator Σ p̄₁q₁ = Σ c₁
    * collapse to EXACT long sums; the two cross terms p̄·q quantize to
    * 1e-2 fixed-point (cents precision) before their exact item-keyed
    * sums. Two period aggregations + one item inner join; everything
    * downstream is item-count-sized. */
  def priceIndex(df: DataFrame, item: Column, period: Column,
                 valueCents: Column, qty: Column,
                 p0: String, p1: String): DataFrame = {
    def q2(x: Column) = round(x * lit(100.0), 0).cast("long")
    val d = df.select(item.as("it"), period.cast("string").as("p"),
        valueCents.cast("long").as("c"), qty.cast("long").as("q"))
      .where(col("it").isNotNull && col("p").isNotNull &&
        col("c").isNotNull && col("q").isNotNull && col("q") > 0)
    def per(p: String, suf: String) = d.where(col("p") === p)
      .groupBy("it").agg(sum("c").as(s"c$suf"), sum("q").as(s"q$suf"))
    val j = per(p0, "0").join(per(p1, "1"), "it")
    j.agg(count(lit(1)).as("n_items"),
        sum("c0").as("sc0"), sum("c1").as("sc1"),
        sum(q2(col("c1").cast("double") / col("q1") * col("q0")))
          .as("l2"),
        sum(q2(col("c0").cast("double") / col("q0") * col("q1")))
          .as("pd2"))
      .select(col("n_items"),
        round(col("l2").cast("double") / lit(100.0) /
          nullif(col("sc0").cast("double"), lit(0.0)), 4).as("laspeyres"),
        round(col("sc1").cast("double") /
          nullif(col("pd2").cast("double") / lit(100.0), lit(0.0)), 4)
          .as("paasche"),
        round(sqrt((col("l2").cast("double") / lit(100.0) /
          nullif(col("sc0").cast("double"), lit(0.0))) *
          (col("sc1").cast("double") /
            nullif(col("pd2").cast("double") / lit(100.0), lit(0.0)))), 4)
          .as("fisher"))
  }
}
