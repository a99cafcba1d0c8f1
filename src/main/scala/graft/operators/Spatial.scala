package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-partitioned spatial join — the scale-out shape for "which
  * points fall in which boxes" (point-in-polygon's bounding-box
  * prefilter, geofence matching, tile assignment): points key to their
  * integer grid cell, boxes EXPLODE to every cell they overlap, and an
  * equi-join on the cell key replaces the all-pairs containment scan.
  * The same decomposition as [[RangeJoin]] in 2-D.
  *
  * Scale shape: one explode bounded by ⌈w/cell⌉² cells per box (size
  * the grid so typical boxes span 1–4 cells), one cell-keyed shuffle,
  * then the exact containment predicate on co-located candidates only.
  * A point lives in exactly ONE cell, so each (point, box) pair meets
  * at most once — no dedup pass. Cell skew mirrors data skew; resize
  * the grid (or salt the hottest cells) when a city-sized hotspot
  * outgrows a task, exactly like [[Skew]] keyed joins.
  *
  * Determinism: integer coordinates and integer cell arithmetic
  * (floor division toward −∞ so negative coordinates cell correctly);
  * output counts are exact longs.
  */
object Spatial {

  private def cellOf(c: Column, size: Long): Column =
    floor(c.cast("double") / lit(size.toDouble)).cast("long")

  /** Count points inside each axis-aligned box (inclusive bounds).
    * `points` = (id, x, y); `boxes` = (id, xlo, xhi, ylo, yhi); both
    * integer-coordinate. Emits (box_id, n_points) for every box, zero
    * included (left join back onto the box spine). */
  def gridJoinCount(points: DataFrame, boxes: DataFrame,
                    cellSize: Long): DataFrame = {
    require(cellSize >= 1, "cellSize must be >= 1")
    val p = points.select(col("id").as("pid"),
        col("x").cast("long").as("px"), col("y").cast("long").as("py"))
      .where(col("px").isNotNull && col("py").isNotNull)
      .withColumn("cx", cellOf(col("px"), cellSize))
      .withColumn("cy", cellOf(col("py"), cellSize))
    val b = boxes.select(col("id").as("bid"),
        col("xlo").cast("long").as("xlo"), col("xhi").cast("long").as("xhi"),
        col("ylo").cast("long").as("ylo"), col("yhi").cast("long").as("yhi"))
    // box → the cells its envelope overlaps (sequence is inclusive).
    // Degenerate boxes (inverted or NULL bounds) are excluded from the
    // CELL EXPLODE only — the spine below keeps every input box, so they
    // still emit (id, 0) per the every-box contract (and a descending
    // sequence() over inverted bounds would otherwise fabricate cells).
    val bc = b
      .where(col("xlo") <= col("xhi") && col("ylo") <= col("yhi"))
      .withColumn("cx", explode(sequence(cellOf(col("xlo"), cellSize),
        cellOf(col("xhi"), cellSize))))
      .withColumn("cy", explode(sequence(cellOf(col("ylo"), cellSize),
        cellOf(col("yhi"), cellSize))))
    val hits = p.join(bc, Seq("cx", "cy"))
      .where(col("px") >= col("xlo") && col("px") <= col("xhi") &&
        col("py") >= col("ylo") && col("py") <= col("yhi"))
      .groupBy("bid").agg(count(lit(1)).as("n_points"))
    b.select(col("bid")).join(hits, Seq("bid"), "left")
      .select(col("bid"), coalesce(col("n_points"), lit(0L)).as("n_points"))
  }
}
