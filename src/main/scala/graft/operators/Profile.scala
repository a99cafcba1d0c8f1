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
  /** Categorical diversity indices per group: Shannon entropy H (nats),
    * Pielou evenness J = H/ln k, and Simpson's D = 1 − Σpᵢ² — the
    * "how concentrated is this group's category mix" readout a corpus
    * curator runs per language/source before rebalancing.
    *
    * One cell aggregation; margins re-aggregate from cells. Simpson is
    * EXACT rational arithmetic ((n² − Σc²)/n²); each Shannon term
    * quantizes to 1e-6 fixed-point before the cell-count-sized sum
    * (the infoGain device). Single-category groups get J = NULL
    * (ln 1 = 0 — evenness of one category is undefined, not 1). */
  def diversityIndices(df: DataFrame, group: Column,
                       cat: Column): DataFrame = {
    val cells = df.select(group.as("g"), cat.as("c"))
      .where(col("g").isNotNull && col("c").isNotNull)
      .groupBy("g", "c").agg(count(lit(1)).as("o"))
    val per = cells.groupBy("g")
      .agg(sum("o").as("n"), count(lit(1)).as("k"),
        sum(col("o") * col("o")).as("ssq"))
    val h = cells.join(per.select(col("g"), col("n")), Seq("g"))
      .select(col("g"),
        round(col("o").cast("double") / col("n") *
          log(col("o").cast("double") / col("n")) * lit(1e6), 0)
          .cast("long").as("t"))
      .groupBy("g").agg(sum("t").as("h6"))
    per.join(h, Seq("g"))
      .withColumn("nh6", -col("h6"))
      .withColumn("snum", col("n") * col("n") - col("ssq"))
      .withColumn("sden", col("n") * col("n"))
      .select(col("g").as("grp"), col("n"), col("k").as("k_categories"),
        // exact rationals seal in integer space (Seal); evenness keeps
        // the double seal — its ln(k) denominator is transcendental, so
        // a .00005 boundary is unreachable
        Seal.pow4("nh6", 6).as("shannon_h"),
        round(-col("h6").cast("double") / lit(1e6) /
          nullif(log(col("k").cast("double")), lit(0.0)), 4).as("evenness"),
        Seal.ratio4("snum", "sden").as("simpson_d"))
      .orderBy("grp")
  }

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

  /** Functional-dependency violation report for a candidate rule
    * a → b: for each determinant value, the DOMINANT dependent value's
    * count is the "clean" mass and everything else violates. One
    * (a, b)-keyed aggregation, one a-keyed re-aggregation (max + sum
    * collapse the cell table), one summary row: determinant census,
    * violating keys, violating rows, violation rate — the data-quality
    * pre-flight for "can I treat a as a key for b".
    * Rows with NULL on either side are excluded (a NULL dependent
    * neither supports nor violates the rule). */
  def fdViolations(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = df.select(a.as("a"), b.as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
    cells.groupBy("a")
      .agg(sum("c").as("n"), max("c").as("maxc"))
      .agg(count(lit(1)).as("n_keys"), sum("n").as("n_rows"),
        sum(when(col("n") > col("maxc"), 1L).otherwise(0L))
          .as("n_keys_violating"),
        sum(col("n") - col("maxc")).as("n_violations"))
      .withColumn("nrn", nullif(col("n_rows"), lit(0L)))
      .select(col("n_keys"), col("n_rows"), col("n_keys_violating"),
        col("n_violations"),
        Seal.ratio4("n_violations", "nrn").as("violation_rate"))
  }

  /** Freedman–Diaconis histogram: bin width h = 2·IQR/∛n (the
    * robust-optimal width), bin count ⌈(max−min)/h⌉, dense counts over
    * the derived bins — the automatic version of the fixed-width q148
    * histogram.
    *
    * Cross-engine exactness: libm `pow(n, 1/3)` is NOT guaranteed
    * bit-identical between JVM and C, so the cube root is the
    * INTEGER-FLOORED ∛n — seeded from pow but corrected with exact
    * integer cube comparisons, so an ulp of libm error cannot change
    * it — and with IQR4 = 4·IQR an exact long (the quarters device),
    * h = IQR4/(8c)·4 means bin = ⌊(x−lo)·2c / IQR4⌋ and
    * nb = ⌈(hi−lo)·2c / IQR4⌉ are pure integer division: every bin id
    * and count is engine-exact. IQR = 0 falls back to one bin. */
  def fdHistogram(df: DataFrame, v: Column): DataFrame = {
    val d = df.select(v.cast("long").as("x")).where(col("x").isNotNull)
    val stats = d.agg(count(lit(1)).as("n"), min("x").as("lo"),
        max("x").as("hi"),
        (round(percentile(col("x") * 4, lit(0.75)), 0).cast("long") -
          round(percentile(col("x") * 4, lit(0.25)), 0).cast("long"))
          .as("iqr4"))
      .withColumn("c0",
        pow(col("n").cast("double"), lit(1.0 / 3.0)).cast("long"))
      .withColumn("c", when(
          (col("c0") + 1) * (col("c0") + 1) * (col("c0") + 1) <= col("n"),
          col("c0") + 1)
        .when(col("c0") * col("c0") * col("c0") > col("n"), col("c0") - 1)
        .otherwise(col("c0")))
      .withColumn("nb", when(col("iqr4") > 0,
          expr("((hi - lo) * 2 * c + iqr4 - 1) div iqr4"))
        .otherwise(lit(1L)))
      .withColumn("nb", greatest(col("nb"), lit(1L)))
    d.crossJoin(broadcast(stats))
      .withColumn("bin", when(col("nb") === 1 || col("iqr4") <= 0, lit(0L))
        .otherwise(least(expr("((x - lo) * 2 * c) div iqr4"),
          col("nb") - 1)))
      .groupBy("bin", "nb")
      .agg(count(lit(1)).as("n_rows"), min("x").as("bin_min"),
        max("x").as("bin_max"))
      .select(col("bin"), col("nb").as("n_bins"), col("n_rows"),
        col("bin_min"), col("bin_max"))
      .orderBy("bin")
  }
}
