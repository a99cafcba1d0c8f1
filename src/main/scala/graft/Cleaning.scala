package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Missing-value handling (SURVEY §2.4, reference `src/transformers.py:20-72`).
  *
  * Census publishes sentinel codes for suppressed estimates; the reference
  * maps them to NaN and then applies a fill or drop strategy. Spark's
  * equivalent of pandas NaN here is SQL NULL (SURVEY §7.4.1) — we never emit
  * literal Double.NaN.
  */
object Cleaning {
  /** Sentinel codes (reference `src/transformers.py:30-36`):
    * -666666666 too few samples, -999999999/-888888888 suppressed,
    * -222222222/-333333333 geography-not-applicable. */
  val MissingCodes: Seq[Double] = Seq(
    -666666666d, -999999999d, -888888888d, -222222222d, -333333333d)

  /** N1 — sentinel -> NULL for one column (expression form; codegen'd). */
  def sentinelToNull(c: Column): Column =
    when(c.isin(MissingCodes: _*), lit(null)).otherwise(c)

  /** N1–N3 — clean `cols` (default: all numeric columns) then apply a
    * strategy: "nan" keep nulls (default), "fill" na.fill(fillValue),
    * "drop" na.drop over the cleaned columns.
    * Mirrors `clean_missing_values` (`src/transformers.py:42-72`). */
  def cleanMissing(df: DataFrame, cols: Seq[String] = Nil,
                   strategy: String = "nan", fillValue: Double = 0d): DataFrame = {
    val numeric = if (cols.nonEmpty) cols else df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] => f.name
    }.toSeq
    val cleaned = numeric.foldLeft(df)((d, c) => d.withColumn(c, sentinelToNull(col(c))))
    strategy match {
      case "nan"  => cleaned
      case "fill" => cleaned.na.fill(fillValue, numeric)
      case "drop" => cleaned.na.drop("any", numeric)
      case other  => throw new IllegalArgumentException(
        s"unknown strategy '$other'; expected nan/fill/drop")
    }
  }
}
