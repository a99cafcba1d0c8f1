package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectation checks — the validation stage every production
  * pipeline runs before promoting a batch (null rates, domains, ranges,
  * uniqueness, referential integrity), reported as one row per check.
  *
  * Scale shape: all row-level predicates evaluate in a SINGLE narrow scan —
  * one aggregate with a `sum(violation)` column per check, so adding checks
  * never adds passes over the data. Uniqueness needs one key-hash shuffle
  * (count per key, count keys seen twice); referential integrity is an
  * aggregate over a left join against the (broadcast) reference keyset.
  * Reports violation COUNTS, not violating rows — the report is O(checks),
  * collectable at any corpus size; row-level triage is a follow-up filter
  * with the same predicate.
  */
object Expectations {
  /** A named row-level expectation: `violated` must evaluate to true on
    * rows that BREAK the expectation. */
  final case class Check(name: String, violated: Column)

  /** Run row-level checks in one scan: (check, n_violations, pass). */
  def rowChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    val aggs = checks.map(c =>
      sum(when(c.violated, 1L).otherwise(0L)).as(c.name))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the 1-row wide aggregate into the per-check report
    wide.select(explode(array(checks.map(c =>
        struct(lit(c.name).as("check_name"), col(c.name).as("n_violations"))): _*)).as("r"))
      .select(col("r.check_name"), col("r.n_violations"),
        (col("r.n_violations") === 0L).cast("long").as("pass"))
  }

  /** Uniqueness check: keys with more than one row. One key-keyed hash agg
    * (map-side combined), then a count of offending keys. */
  def uniqueCheck(df: DataFrame, name: String, key: Column): DataFrame =
    df.groupBy(key.as("__k")).agg(count(lit(1)).as("__n"))
      .agg(sum(when(col("__n") > 1, 1L).otherwise(0L)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"),
        (col("n_violations") === 0L).cast("long").as("pass"))

  /** Referential-integrity check: rows of `df` whose `fk` has no match in
    * `ref`'s `pk`. Anti-join keyed by the fk; the reference keyset
    * broadcasts when dimension-sized, shuffles otherwise — Catalyst picks
    * from stats. */
  def refIntegrityCheck(df: DataFrame, name: String, fk: Column,
                        ref: DataFrame, pk: Column): DataFrame =
    df.join(ref.select(pk.as("__pk")), fk === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"),
        (col("n_violations") === 0L).cast("long").as("pass"))

  /** A full validation report: row-level checks (one scan) plus any
    * uniqueness/referential checks, unioned into one (check, n_violations,
    * pass) table. */
  def report(rowLevel: DataFrame, extra: DataFrame*): DataFrame =
    extra.foldLeft(rowLevel)(_ unionByName _)
}
