package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Survey raking (iterative proportional fitting, Deming & Stephan 1940)
  * — the weighting step census/survey pipelines run after sampling: scale
  * unit weights so the weighted sample reproduces known population
  * margins on several dimensions at once, without needing the full joint
  * distribution. The reference pipeline's ACS workflows consume weights
  * produced exactly this way ([/root/reference] publishes MOE columns of
  * raked estimates; this operator is the producer side of that
  * contract).
  */
object Raking {

  /** 2-D IPF over (row, col) cells: start every sampled unit at weight
    * 1, then alternately scale each row stratum to its population total
    * and each column stratum to its — `iters` full (row+col) rounds.
    * Sampling is assumed cell-homogeneous, so state per CELL (count n,
    * weight w), never per unit: the whole iteration runs on an
    * R×C-row table regardless of sample size, and applying the result
    * is one broadcast join.
    *
    * Determinism device: weights are 1e-6 fixed-point longs; each pass
    * computes the stratum factor as ONE double expression
    * (target·10⁶ / weighted-sum) from exact longs, applies it
    * multiplicatively, and re-quantizes with round(,0) — so both
    * engines hold bit-identical integer state between passes and the
    * plan is a fixed unrolled chain (no data-dependent loop). Cells
    * whose row/col key is missing from the population margins are
    * dropped by the inner joins (a sample drawn from the population
    * never loses cells).
    *
    * Scale: margins and cells are hash aggregations over the raw
    * tables (map-side combinable); the iteration itself touches only
    * the cell table. 100 TB of sample rows → R×C longs of state. */
  def rake2d(sample: DataFrame, population: DataFrame, row: Column,
             colKey: Column, iters: Int = 2): DataFrame = {
    require(iters >= 1, "at least one row+col round")
    def cellsOf(df: DataFrame) = df.select(row.as("r"), colKey.as("c"))
      .where(col("r").isNotNull && col("c").isNotNull)
    val tr = cellsOf(population).groupBy("r").agg(count(lit(1)).as("tr"))
    val tc = cellsOf(population).groupBy("c").agg(count(lit(1)).as("tc"))
    var cells = cellsOf(sample).groupBy("r", "c")
      .agg(count(lit(1)).as("n"))
      .withColumn("w6", lit(1000000L))
      .localCheckpoint() // R×C rows; the fixed iteration chain re-reads it
    def pass(key: String, target: DataFrame, tname: String): Unit = {
      val s = cells.groupBy(key).agg(sum(col("n") * col("w6")).as("s"))
      cells = cells.join(s, key).join(target, key)
        .select(col("r"), col("c"), col("n"),
          round(col("w6").cast("double") *
            (col(tname).cast("double") * lit(1000000.0) /
              col("s").cast("double")), 0).cast("long").as("w6"))
    }
    (1 to iters).foreach { _ =>
      pass("r", tr, "tr")
      pass("c", tc, "tc")
    }
    cells.select(col("r"), col("c"), col("n").as("n_sample"), col("w6"),
        (col("w6").cast("double") / lit(1000000.0)).as("weight"))
      .orderBy("r", "c")
  }
}
