package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** GEOID codec: build / parse / coarsen the hierarchical fixed-width key.
  *
  * Census semantics (reference: `src/census_pipeline.py:367-378`,
  * `src/geography.py:219-269`, `src/transformers.py:301-312`):
  * GEOID = state(2) ∥ county(3) ∥ tract(6) ∥ block_group(1). Built by string
  * concatenation (null components propagate null, matching pandas), parsed
  * by fixed-offset substring, coarsened by prefix truncation.
  *
  * Pure `Column` expressions — codegen'd, no UDFs, shuffle-free.
  */
object GeoidOps {
  /** component name -> (1-based start offset, width) */
  val Layout: Seq[(String, Int, Int)] = Seq(
    ("state", 1, 2), ("county", 3, 3), ("tract", 6, 6), ("block_group", 12, 1))

  /** Valid coarsening lengths: state=2, county=5, tract=11, block group=12
    * (reference: `src/transformers.py:301-312`). */
  val LevelLengths: Map[String, Int] =
    Map("state" -> 2, "county" -> 5, "tract" -> 11, "block_group" -> 12)

  /** Zero-pad a (possibly numeric) component to fixed width. */
  def component(c: Column, width: Int): Column =
    lpad(c.cast("string"), width, "0")

  /** E1 — build a GEOID from hierarchical components. Widths are taken
    * positionally from [[Layout]]; pass 1-4 components (state .. block group).
    */
  def buildGeoid(components: Column*): Column = {
    require(components.nonEmpty && components.size <= Layout.size,
      s"1..${Layout.size} components expected")
    concat(components.zip(Layout).map { case (c, (_, _, w)) => component(c, w) }: _*)
  }

  /** E2 — parse a GEOID into its components by fixed offsets. Components past
    * the string's length come back empty (pandas slice semantics). */
  def parseGeoid(geoid: Column): Seq[(String, Column)] =
    Layout.map { case (name, start, width) =>
      name -> substring(geoid, start, width).as(name)
    }

  /** E3 — coarsen by prefix truncation to a named hierarchy level.
    * Unknown level -> IllegalArgumentException (reference raises ValueError,
    * `src/transformers.py:308-312`). */
  def coarsen(geoid: Column, level: String): Column = {
    val len = LevelLengths.getOrElse(level,
      throw new IllegalArgumentException(
        s"unknown geography level '$level'; expected ${LevelLengths.keys.mkString("/")}"))
    substring(geoid, 1, len)
  }

  /** Prefix truncation by explicit length (the groupBy key of hierarchy
    * re-aggregation, SURVEY §2 A1). */
  def prefix(geoid: Column, len: Int): Column = substring(geoid, 1, len)
}
