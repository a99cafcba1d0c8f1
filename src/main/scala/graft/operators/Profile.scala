package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiler — the "what is actually in this table?"
  * report that gates every ingest: per column, row count, null count,
  * exact distinct count, min and max. The contract-check companion to
  * [[Expectations]] (which tests asserted rules; this one reports the
  * observed shape to write the rules FROM).
  *
  * Scale shape: ONE aggregation over the table computes every column's
  * stats side by side (the multi-countDistinct expand is map-side —
  * partial aggregates collapse each partition's expansion before the
  * single tiny shuffle), then the 1-row wide result unpivots to a
  * row-per-column report driver-free via `stack`. Nothing row-sized
  * ever shuffles. Values are cast to double up front: the profile's
  * min/max/ndv semantics are then identical in both engines for any
  * numeric input (callers quantize currency to cents first, per
  * FIXTURES.md).
  */
object Profile {

  /** Per-column profile of numeric columns: (column, n_rows, n_null,
    * ndv, min_v, max_v), one row per entry of `cols`, in given order. */
  def columnProfile(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val src = df.select(cols.map { case (n, c) =>
      c.cast("double").as(n) }: _*)
    val wide = src.agg(count(lit(1)).as("__n"),
      cols.flatMap { case (n, _) => Seq(
        count(col(n)).as(s"__nn_$n"),
        countDistinct(col(n)).as(s"__ndv_$n"),
        min(col(n)).as(s"__min_$n"),
        max(col(n)).as(s"__max_$n"))
      }: _*)
    val stackExpr = cols.map { case (n, _) =>
      s"'$n', __nn_$n, __ndv_$n, __min_$n, __max_$n"
    }.mkString(s"stack(${cols.size}, ", ", ", ")")
    wide.select(col("__n"),
        expr(s"$stackExpr AS (column_name, __nn, ndv, min_v, max_v)"))
      .select(col("column_name"), col("__n").as("n_rows"),
        (col("__n") - col("__nn")).as("n_null"), col("ndv"),
        col("min_v"), col("max_v"))
  }
}
