package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered event funnels and cohort retention — the product-analytics
  * pair every event pipeline ships: "how many users make it through
  * step 1 → 2 → 3, and how long do cohorts stay active".
  *
  * Scale shape: both operators collapse the event stream to
  * user-cardinality tables with map-side-combinable aggregations before
  * anything joins; the funnel chains three user-keyed aggregations (one
  * per step — each strictly smaller than the last), retention is one
  * (user, week)-distinct pass plus a cohort-sized join. No windows over
  * raw events, no per-event shuffles beyond the first groupBy.
  *
  * Determinism (FIXTURES.md): timestamps compare as µs longs; the
  * median step gap uses the DOUBLED-value percentile device (2·median
  * of integers is always an integer) so the seconds display is one
  * integer-sealed division; rates seal via [[Seal]].
  */
object Funnel {

  /** Strictly-ordered 3-step funnel: a user reaches step k if some
    * step-k event happens STRICTLY after their earliest completion of
    * step k−1 (the classic "first touch then forward" semantics —
    * re-orderings of earlier events never un-complete a step). Emits
    * one row per step: users reached, conversion from the previous
    * step, conversion from step 1, and the median gap (seconds) from
    * the previous step's completion. */
  def ordered3(df: DataFrame, user: Column, ts: Column, label: Column,
               s1: String, s2: String, s3: String): DataFrame = {
    val e = df.select(user.as("u"), unix_micros(ts).as("us"),
        label.as("l"))
      .where(col("u").isNotNull && col("us").isNotNull &&
        col("l").isNotNull)
    val t1 = e.where(col("l") === s1).groupBy("u")
      .agg(min("us").as("t1"))
    val t2 = e.where(col("l") === s2).join(t1, "u")
      .where(col("us") > col("t1"))
      .groupBy("u", "t1").agg(min("us").as("t2"))
    val t3 = e.where(col("l") === s3).join(t2, "u")
      .where(col("us") > col("t2"))
      .groupBy("u", "t2").agg(min("us").as("t3"))
    // 2·median of integer µs gaps is an integer (the percentile
    // interpolation at 0.5 is a half at worst); seal the seconds
    // display as one integer division by 2e6
    def med2(gap: Column) =
      round(percentile(gap * 2, lit(0.5)), 0).cast("long")
    val r1 = t1.agg(count(lit(1)).as("n")).select(lit(1L).as("step"),
      lit(s1).as("label"), col("n"), lit(null).cast("long").as("g2"))
    val r2 = t2.agg(count(lit(1)).as("n"),
        med2(col("t2") - col("t1")).as("g2"))
      .select(lit(2L).as("step"), lit(s2).as("label"), col("n"), col("g2"))
    val r3 = t3.agg(count(lit(1)).as("n"),
        med2(col("t3") - col("t2")).as("g2"))
      .select(lit(3L).as("step"), lit(s3).as("label"), col("n"), col("g2"))
    val steps = r1.unionByName(r2).unionByName(r3)
    val w = org.apache.spark.sql.expressions.Window.orderBy("step")
    steps
      .withColumn("prev_n", lag("n", 1).over(w))
      .withColumn("first_n", first("n").over(
        w.rowsBetween(Long.MinValue, 0)))
      .withColumn("pden", nullif(col("prev_n"), lit(0L)))
      .withColumn("fden", nullif(col("first_n"), lit(0L)))
      .withColumn("gden", lit(2000000L))
      .select(col("step"), col("label"), col("n").as("n_reached"),
        Seal.ratio4("n", "pden").as("conv_from_prev"),
        Seal.ratio4("n", "fden").as("conv_from_first"),
        Seal.ratio4("g2", "gden").as("median_gap_s"))
      .orderBy("step")
  }

  /** Weekly cohort retention triangle: users cohort by the week of
    * their FIRST event (weeks = 7-day buckets from the corpus's global
    * minimum day — a data-defined origin both engines derive
    * identically), and week k of a cohort counts users with ≥1 event
    * in relative week k. Emits (cohort_week, week_k, n_active,
    * n_cohort, retention) with k = 0 always 1.0. */
  def cohortRetention(df: DataFrame, user: Column, ts: Column): DataFrame = {
    val e = df.select(user.as("u"), to_date(ts).as("d"))
      .where(col("u").isNotNull && col("d").isNotNull)
    val origin = e.agg(min("d").as("d0"))
    val weeks = e.crossJoin(broadcast(origin))
      .select(col("u"), floor(datediff(col("d"), col("d0")) / 7)
        .cast("long").as("w"))
      .distinct()
    val firstW = weeks.groupBy("u").agg(min("w").as("w0"))
    val sizes = firstW.groupBy("w0").agg(count(lit(1)).as("n_cohort"))
    weeks.join(firstW, "u")
      .groupBy(col("w0").as("cohort_week"), (col("w") - col("w0")).as("week_k"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes.withColumnRenamed("w0", "cohort_week")),
        Seq("cohort_week"))
      .select(col("cohort_week"), col("week_k"), col("n_active"),
        col("n_cohort"),
        Seal.ratio4("n_active", "n_cohort").as("retention"))
      .orderBy("cohort_week", "week_k")
  }
}
