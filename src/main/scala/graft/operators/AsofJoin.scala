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
  /** @param rightVals right-side columns to attach (all null when no match)
    * @param rightTie  deterministic tie-break among right rows sharing
    *                  (key, ts): the row with the greatest tie value wins
    *
    * The right payload is carried as ONE struct, not per-column: carrying
    * columns independently would backfill a legitimately-NULL field of the
    * latest right row from an older right row, fusing fields of different
    * rows into one match. */
  def backward(left: DataFrame, leftKey: Column, leftTs: Column,
               right: DataFrame, rightKey: Column, rightTs: Column,
               rightVals: Seq[String], rightTie: Column): DataFrame = {
    val leftCols = left.columns
    val rStruct = struct(rightVals.map(col): _*)
    val rStructType = right.select(rStruct.as("__r")).schema("__r").dataType
    val l = left.select(
      leftKey.as("__k"), leftTs.as("__ts"), lit(1).as("__side"),
      lit(null).cast("long").as("__tie"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(rStructType).as("__r"))
    // a NULL rightTs would sort NULLS-FIRST and be carried into every
    // earlier left row, violating the rightTs <= leftTs contract
    val r = right.where(rightTs.isNotNull).select(
      rightKey.as("__k"), rightTs.as("__ts"), lit(0).as("__side"),
      rightTie.cast("long").as("__tie"),
      lit(null).cast(l.schema("__l").dataType).as("__l"),
      rStruct.as("__r"))
    // right rows sort before left rows at equal ts (side 0 < 1), so a right
    // row exactly at leftTs matches; among right ties the greatest __tie is
    // last and wins the carry.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(col("__side"), col("__l"),
        last(col("__r"), ignoreNulls = true).over(w).as("__r"))
    carried.where(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightVals.map(v => col(s"__r.$v").as(v)): _*)
  }
}
