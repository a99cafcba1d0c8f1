package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (backward) join — an operator Spark lacks natively.
  *
  * For each left row, attach the latest right row with the same key and
  * `rightTs <= leftTs` (or null if none). Built by composition, not a
  * custom physical operator: tag both sides, union them, and carry the
  * right-side payload forward with `last(_, ignoreNulls)` over a
  * (key)-partitioned window ordered by (ts, side, tie).
  *
  * Scale shape: ONE shuffle keyed by the join key — the same cost as any
  * equi-join — instead of the `leftTs >= rightTs` theta-join a naive
  * formulation produces (which Spark plans as a per-key cross product
  * filtered after the fact). Skewed keys salt exactly like any other
  * shuffle key; the window is rows-bounded so state is O(1) per row.
  */
object AsofJoin {
  /** @param rightVals right-side columns to attach (null when no match)
    * @param rightTie  deterministic tie-break among right rows sharing
    *                  (key, ts): the row with the greatest tie value wins */
  def backward(left: DataFrame, leftKey: Column, leftTs: Column,
               right: DataFrame, rightKey: Column, rightTs: Column,
               rightVals: Seq[String], rightTie: Column): DataFrame = {
    val leftCols = left.columns
    val l = left.select(
      Seq(leftKey.as("__k"), leftTs.as("__ts"), lit(1).as("__side"),
        lit(null).cast("long").as("__tie"),
        struct(leftCols.map(col): _*).as("__l")) ++
        rightVals.map(v => lit(null).cast(right.schema(v).dataType).as(v)): _*)
    val r = right.select(
      Seq(rightKey.as("__k"), rightTs.as("__ts"), lit(0).as("__side"),
        rightTie.cast("long").as("__tie"),
        lit(null).cast(l.schema("__l").dataType).as("__l")) ++
        rightVals.map(col): _*)
    // right rows sort before left rows at equal ts (side 0 < 1), so a right
    // row exactly at leftTs matches; among right ties the greatest __tie is
    // last and wins the carry.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(Seq(col("__k"), col("__side"), col("__l")) ++
        rightVals.map(v => last(col(v), ignoreNulls = true).over(w).as(v)): _*)
    carried.where(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++ rightVals.map(col): _*)
  }
}
