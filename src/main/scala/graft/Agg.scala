package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregations (SURVEY §2.7; reference `src/transformers.py:279-318` and
  * the example workloads). All shapes are single hash-aggregates: Spark plans
  * partial (map-side) + final aggregation automatically, so the shuffle
  * moves only one row per (group, partition) — the scale-safe shape.
  */
object Agg {
  /** Per-column aggregate by pandas-style function name
    * (reference agg spec dict, `src/transformers.py:313-316`). `count`
    * counts non-nulls, matching pandas. */
  def named(fn: String, c: String): Column = fn match {
    case "sum"            => sum(col(c)).as(c)
    case "mean" | "avg"   => avg(col(c)).as(c)
    case "median"         => median(col(c)).as(c)
    case "min"            => min(col(c)).as(c)
    case "max"            => max(col(c)).as(c)
    case "count"          => count(col(c)).as(c)
    case "first"          => first(col(c), ignoreNulls = true).as(c)
    case other => throw new IllegalArgumentException(s"unknown agg fn '$other'")
  }

  /** A1 — hierarchy re-aggregation: group rows by a GEOID prefix and
    * aggregate each measure with its caller-chosen function; the prefix is
    * renamed back to GEOID (reference `src/transformers.py:279-318`).
    * `level` ∈ state/county/tract/block_group. */
  def aggregateToGeography(df: DataFrame, level: String,
                           aggs: Map[String, String],
                           geoidCol: String = "GEOID"): DataFrame = {
    val key = GeoidOps.coarsen(col(geoidCol), level).as(geoidCol)
    val exprs = aggs.toSeq.sortBy(_._1).map { case (c, fn) => named(fn, c) }
    df.groupBy(key).agg(exprs.head, exprs.tail: _*)
  }

  /** A3 — global one-row summary stats for a measure column
    * (reference `examples/tract_level_analysis.py:121-139`). */
  def summaryStats(df: DataFrame, c: String): DataFrame =
    df.agg(
      sum(col(c)).as("sum"), avg(col(c)).as("mean"), median(col(c)).as("median"),
      min(col(c)).as("min"), max(col(c)).as("max"))
}
