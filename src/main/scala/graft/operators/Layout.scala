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

  /** Scan-side zone-map pruning evaluation — the MEASURED "is Z-order
    * worth it" readout that q142's envelope table only implies: simulate
    * writing the table as `files` equal-width contiguous files under
    * three layouts (natural = insertion order via `ord`; sort_x = sorted
    * by the x dimension; zorder = sorted by the Morton key of
    * [[zorderKey]]), compute each file's min/max zone map on BOTH masked
    * dimensions, and report — per layout × range predicate — how many
    * files a zone-map-aware scan planner prunes and what fraction of
    * ROWS the kept files still hold. The table a 100 TB layout decision
    * reads: natural prunes nothing, sort_x prunes x-predicates only,
    * zorder prunes both.
    *
    * Determinism: file assignment is pure integer arithmetic (value-
    * range buckets — `(v−lo)·files div (hi−lo+1)` — the proxy for
    * "sorted then split into equal files" that needs no global sort in
    * either engine); zone maps are exact integer min/max; the two
    * shares seal with ratio4.
    *
    * Scale shape: one 1-row envelope agg on `ord`, ONE corpus pass that
    * explodes each row into its 3 layout assignments (constant ×3, no
    * shuffle growth), one aggregation keyed (layout, file) — bounded at
    * 3·`files` rows — then literal-spine cross joins over that bounded
    * table. Raw rows never sort and never window.
    *
    * Denominator caveat: `n_files` (and hence `files_pruned_share`)
    * counts OCCUPIED simulated files — a (layout, file) bucket holding
    * at least one row. When the `ord` range has fewer than `files`
    * distinct buckets, or a skewed x/y distribution leaves value-range
    * buckets empty, the empty files are EXCLUDED: they hold no rows a
    * scan could skip, and counting them would let a skew-emptied layout
    * inflate its prune share with files that were never real work. The
    * cross-layout comparison stays fair on `rows_scanned_share`, whose
    * denominator is the (layout-invariant) total row count. */
  def zonemapPruneEval(df: org.apache.spark.sql.DataFrame, ord: Column,
                       x: Column, y: Column, bits: Int, files: Int,
                       preds: Seq[(String, Option[(Long, Long)],
                         Option[(Long, Long)])])
      : org.apache.spark.sql.DataFrame = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    require(files >= 2 && (files & (files - 1)) == 0 &&
      files <= (1 << math.min(2 * bits, 30)),
      "files must be a power of two within the z key space")
    require(preds.nonEmpty, "need at least one predicate")
    val logF = java.lang.Integer.numberOfTrailingZeros(files)
    val mask = (1L << bits) - 1
    val idiv = org.apache.spark.sql.graft.VectorExprs.idiv _
    val spark = df.sparkSession
    val base = df.select(ord.cast("long").as("o"),
        x.cast("long").bitwiseAND(lit(mask)).as("xm"),
        y.cast("long").bitwiseAND(lit(mask)).as("ym"))
      .where(col("o").isNotNull)
    val env = base.agg(min("o").as("lo_o"), max("o").as("hi_o"))
    val assigned = base.crossJoin(broadcast(env))
      .select(col("xm"), col("ym"),
        explode(array(
          struct(lit("natural").as("layout"),
            idiv((col("o") - col("lo_o")) * files,
              col("hi_o") - col("lo_o") + 1).cast("long").as("f")),
          struct(lit("sort_x").as("layout"),
            idiv(col("xm") * files, lit(1L << bits)).cast("long").as("f")),
          struct(lit("zorder").as("layout"),
            shiftright(Layout.zorderKey(col("xm"), col("ym"), bits),
              2 * bits - logF).as("f")))).as("a"))
      .select(col("a.layout").as("layout"), col("a.f").as("f"),
        col("xm"), col("ym"))
    val zones = assigned.groupBy("layout", "f")
      .agg(count(lit(1)).as("n_rows"),
        min("xm").as("x_min"), max("xm").as("x_max"),
        min("ym").as("y_min"), max("ym").as("y_max"))
    val totals = zones.groupBy("layout")
      .agg(count(lit(1)).as("n_files"), sum("n_rows").as("rows_total"))
    def optLit(v: Option[Long]): Column =
      v.map(lit(_)).getOrElse(lit(null).cast("long"))
    val predSpine = spark.range(1).select(explode(array(preds.map {
      case (label, px, py) => struct(lit(label).as("predicate"),
        optLit(px.map(_._1)).as("xlo"), optLit(px.map(_._2)).as("xhi"),
        optLit(py.map(_._1)).as("ylo"), optLit(py.map(_._2)).as("yhi"))
    }: _*)).as("p")).select(col("p.*"))
    val kept = zones.crossJoin(broadcast(predSpine))
      .select(col("layout"), col("predicate"), col("n_rows"),
        (coalesce(col("x_max") >= col("xlo"), lit(true)) &&
          coalesce(col("x_min") <= col("xhi"), lit(true)) &&
          coalesce(col("y_max") >= col("ylo"), lit(true)) &&
          coalesce(col("y_min") <= col("yhi"), lit(true))).as("keep"))
      .groupBy("layout", "predicate")
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("n_files_kept"),
        sum(when(col("keep"), col("n_rows")).otherwise(0L))
          .as("rows_scanned"))
    // no broadcast hint on totals: 3 rows by construction but grouped
    // over a corpus-derived child — unprovable to the hint audit; AQE
    // broadcasts it at runtime
    kept.join(totals, Seq("layout"))
      .withColumn("n_pruned", col("n_files") - col("n_files_kept"))
      .select(col("layout"), col("predicate"), col("n_files"),
        col("n_files_kept"), col("rows_scanned"),
        Seal.ratio4("n_pruned", "n_files").as("files_pruned_share"),
        Seal.ratio4("rows_scanned", "rows_total").as("rows_scanned_share"))
      .orderBy("layout", "predicate")
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
