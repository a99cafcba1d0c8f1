package graft

import org.apache.spark.sql.functions._

/** Pins for the graph-structure / long-memory / ridge batch. */
class GraphTsSpec extends SparkSpec {
  import spark.implicits._

  test("clusteringCoefficient: triangle + pendant, hand-computed locals") {
    // K3 on {1,2,3} plus pendant 4–3: one triangle, one oriented wedge,
    // locals 1, 1, 1/3 (deg-1 vertex excluded) → avg 0.7778
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("u", "v")
    val r = Graph.clusteringCoefficient(e, col("u"), col("v")).collect()(0)
    assert(r.getAs[Long]("n_vertices") == 4L)
    assert(r.getAs[Long]("n_wedges") == 1L)
    assert(r.getAs[Long]("n_triangles") == 1L)
    assert(r.getAs[Long]("n_closable") == 3L)
    assert(r.getAs[Double]("oriented_wedge_closure") == 1.0)
    assert(r.getAs[Double]("avg_local_cc") == 0.7778)
  }

  test("clusteringCoefficient: triangle-free graph → zero wedge closure") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val r = Graph.clusteringCoefficient(e, col("u"), col("v")).collect()(0)
    assert(r.getAs[Long]("n_triangles") == 0L)
    assert(r.getAs[Double]("oriented_wedge_closure") == 0.0)
    assert(r.getAs[Double]("avg_local_cc") == 0.0)
  }

  test("degreeAssortativity: star graph is perfectly disassortative") {
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("u", "v")
    val r = Graph.degreeAssortativity(e, col("u"), col("v")).collect()(0)
    assert(r.getAs[Long]("n_endpoints") == 6L)
    assert(r.getAs[Double]("assortativity") == -1.0)
  }

  test("degreeAssortativity: regular graph has zero degree variance → NULL") {
    // 4-cycle: every degree 2 → zero variance → SQL-NULL r
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("u", "v")
    val r = Graph.degreeAssortativity(e, col("u"), col("v")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("assortativity")))
  }

  test("hurstRs: hand-computed two-size ladder on the ramp series") {
    // x = 1..8: every size-2 chunk has R/S = 1 (ln 0); size-4 chunks both
    // give ln(8/√20) → 0.5816; slope = 581575/693147 → 0.8390
    val df = (1 to 8).map(i => (i, i.toLong)).toDF("day", "x")
    val rows = Timeseries.hurstRs(df, col("day"), col("x"), Seq(2, 4))
      .collect()
    assert(rows.length == 2)
    val bySize = rows.map(r => r.getAs[Long]("size") ->
      (r.getAs[Long]("n_chunks"), r.getAs[Double]("mean_ln_rs"),
        r.getAs[Double]("hurst"))).toMap
    assert(bySize(2L) == ((4L, 0.0, 0.8390)))
    assert(bySize(4L) == ((2L, 0.5816, 0.8390)))
  }

  test("hurstRs: constant series → every chunk degenerate → no rows") {
    val df = (1 to 32).map(i => (i, 7L)).toDF("day", "x")
    assert(Timeseries.hurstRs(df, col("day"), col("x"), Seq(4, 8))
      .count() == 0L)
  }

  test("hurstRs: incomplete tail chunks are dropped") {
    // 10 points, size 4 → chunks of 4,4,2: only 2 complete
    val df = (1 to 10).map(i => (i, (i * i).toLong)).toDF("day", "x")
    val r = Timeseries.hurstRs(df, col("day"), col("x"), Seq(4)).collect()
    assert(r.length == 1 && r(0).getAs[Long]("n_chunks") == 2L)
  }

  test("ridge2: λ=0 recovers exact OLS on a noiseless plane") {
    // y = 5 + 2·x1 + 3·x2
    val df = Seq((0L, 0L, 5L), (1L, 0L, 7L), (0L, 1L, 8L), (1L, 1L, 10L))
      .toDF("x1", "x2", "y")
    val r = Trend.ridge2(df, col("x1"), col("x2"), col("y"), lambda = 0.0)
      .collect()(0)
    assert(r.getAs[Double]("beta1") == 2.0)
    assert(r.getAs[Double]("beta2") == 3.0)
    assert(r.getAs[Double]("intercept") == 5.0)
  }

  test("ridge2: huge λ shrinks betas to 0, intercept to the mean") {
    val df = Seq((0L, 0L, 5L), (1L, 0L, 7L), (0L, 1L, 8L), (1L, 1L, 10L))
      .toDF("x1", "x2", "y")
    val r = Trend.ridge2(df, col("x1"), col("x2"), col("y"), lambda = 1e15)
      .collect()(0)
    assert(r.getAs[Double]("beta1") == 0.0 && r.getAs[Double]("beta2") == 0.0)
    assert(r.getAs[Double]("intercept") == 7.5)
  }

  test("ridge2: collinear features with λ=0 → singular → NULL betas") {
    val df = Seq((1L, 2L, 3L), (2L, 4L, 6L), (3L, 6L, 9L))
      .toDF("x1", "x2", "y")
    val r = Trend.ridge2(df, col("x1"), col("x2"), col("y"), lambda = 0.0)
      .collect()(0)
    assert(r.isNullAt(r.fieldIndex("beta1")))
  }
}
