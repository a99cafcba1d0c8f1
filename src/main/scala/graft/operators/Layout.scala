package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout keys for multi-dimensional clustering — the write-side
  * complement to the scan-side pruning the plan audit pins: sorting a
  * 100 TB table by a Z-order (Morton) key before writing parquet gives
  * every file a tight min/max envelope on BOTH interleaved dimensions, so
  * range predicates on either column prune files (the technique behind
  * Delta/Iceberg `ZORDER BY`; cf. Morton 1966).
  *
  * The key is a pure bit-shuffle built from `shiftleft`/`shiftright`/`&`/
  * `|` column ops — whole-stage-codegen'd, no UDF — and [[Layout.zorderSql]]
  * emits the identical arithmetic as ANSI SQL so the DuckDB oracle computes
  * the very same longs (FIXTURES.md: integer-only, nothing to round).
  */
object Layout {

  /** Interleave the low `bits` bits of `x` (even positions) and `y` (odd
    * positions) into a single long: bit i of x lands at 2i, bit i of y at
    * 2i+1. Inputs are masked to `bits` first, so callers bin/modulo into
    * range beforehand. Backed by the native codegen
    * [[org.apache.spark.sql.graft.MortonInterleave]] expression (one tight
    * generated loop per row instead of a 2·bits-term unrolled tree); also
    * registered as SQL `graft_zorder(x, y, bits)`. */
  def zorderKey(x: Column, y: Column, bits: Int): Column =
    org.apache.spark.sql.graft.LayoutExprs.zorder(
      x.cast("long"), y.cast("long"), bits)

  /** DuckDB twin of [[zorderKey]]: the same unrolled shift/mask arithmetic
    * over SQL expressions `x` and `y` (already masked here too). */
  def zorderSql(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val mask = (1L << bits) - 1
    val xm = s"(CAST($x AS BIGINT) & $mask)"
    val ym = s"(CAST($y AS BIGINT) & $mask)"
    (0 until bits).map { i =>
      s"((($xm >> $i) & 1) << ${2 * i}) | ((($ym >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")
  }

  /** Size-budgeted sequential compaction plan — the table-maintenance
    * planner behind "merge these small files/partitions into
    * target-sized groups": units (files, date partitions) ordered by
    * `unit` are packed next-fit into bins of ~`budget` total size, by
    * assigning each unit to bin = floor(cumulative-size-before / budget).
    * Deterministic and one-pass (no driver loop); a unit larger than the
    * budget gets its own overflowing bin, the standard next-fit
    * behavior. Emits per bin: n_units, total size, first/last unit — the
    * work list a compaction job executes.
    *
    * Scale shape: one aggregation to unit granularity (unit cardinality
    * ≪ rows — days, files), one ordering window over THAT spine, one
    * bin-keyed re-aggregation. The window is a global sort of the unit
    * spine only; raw rows never sort. */
  def compactionPlan(df: org.apache.spark.sql.DataFrame, unit: Column,
                     size: Column, budget: Long): org.apache.spark.sql.DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val W = org.apache.spark.sql.expressions.Window
    val perUnit = df.select(unit.as("u"), size.cast("long").as("sz"))
      .where(col("u").isNotNull)
      .groupBy("u").agg(sum("sz").as("sz"))
    val wCum = W.orderBy("u")
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    perUnit.withColumn("cum", sum("sz").over(wCum))
      .select(col("u"), col("sz"),
        floor((col("cum") - col("sz")).cast("double") / lit(budget.toDouble))
          .cast("long").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_units"), sum("sz").as("total_size"),
        min("u").as("first_unit"), max("u").as("last_unit"))
      .orderBy("bin")
  }
}
