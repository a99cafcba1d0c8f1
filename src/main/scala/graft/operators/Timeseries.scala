package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series repair: calendar-spine densification with forward fill and
  * linear interpolation — the "no row for quiet days" fix every daily
  * metric pipeline needs before window math (a 7-day frame over a table
  * with missing days silently becomes a 7-OBSERVATION frame).
  *
  * The spine is generated from the series' own [min, max] day range
  * (`sequence()` explode — one row per day, no driver loop). Carry
  * values ride as (day, value) structs through `last/first(ignoreNulls)`
  * windows, so the interpolation knows each gap's true endpoints and
  * widths. Determinism: values are integer cents; the interpolation is
  * one fixed double expression on identical longs/day-counts, sealed
  * with round(,4); days outside any observation (before the first /
  * after the last) yield SQL-NULL interp by null propagation.
  *
  * Scale note: the windows run over the DAY-sized spine (bounded — a
  * decade is ~3.7k rows), not the event corpus; a multi-series
  * deployment adds the series key to `partitionBy` and the spine
  * cross-join stays proportional to #series × #days.
  */
object Timeseries {
  def gapFillDaily(daily: DataFrame, day: Column, vCents: Column): DataFrame = {
    val d = daily.select(day.as("day"), vCents.cast("long").as("cents"))
    val spine = d.agg(min("day").as("lo"), max("day").as("hi"))
      .select(explode(expr("sequence(lo, hi)")).as("day"))
    val wPrev = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.orderBy("day")
      .rowsBetween(0, Window.unboundedFollowing)
    val obs = when(col("cents").isNull, lit(null))
      .otherwise(struct(col("day").as("d"), col("cents").as("v")))
    val filled = spine.join(d, Seq("day"), "left")
      .select(col("day"), col("cents"), obs.as("obs"))
      .select(col("day"), col("cents"),
        last("obs", ignoreNulls = true).over(wPrev).as("prev"),
        first("obs", ignoreNulls = true).over(wNext).as("next"))
    filled.select(col("day"), col("cents"),
        col("prev.v").as("ffill_cents"),
        round(when(col("cents").isNotNull, col("cents").cast("double"))
          .otherwise(col("prev.v").cast("double") +
            (col("next.v") - col("prev.v")).cast("double") *
            datediff(col("day"), col("prev.d")).cast("double") /
            datediff(col("next.d"), col("prev.d")).cast("double")), 4)
          .as("interp_cents"))
      .orderBy("day")
  }
}
