package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA, split the way Spark wants it: the covariance matrix
  * is a ONE-PASS map-side outer-product aggregation (the d(d+1)/2 upper
  * triangle of Σxxᵀ plus the d column sums — data-sized input, d²-sized
  * output, nothing quadratic ever shuffles), the eigen-decomposition of
  * that d×d matrix runs on the driver (d = 64 → a 64×64 symmetric
  * problem, microseconds — parallelizing it would be theater), and the
  * projection back over the corpus is a broadcast of the eigenvector
  * literals into a codegen dot product.
  *
  * Exactness: embedding floats quantize to 1e-6 fixed-point longs, so
  * every cross-row sum is an exact integer and the centered covariance
  * derives algebraically: Σ(xᵢ−μᵢ)(xⱼ−μⱼ) = (n·Sᵢⱼ − Sᵢ·Sⱼ)/n, combined
  * in decimal(38,0) (HUGEINT on the oracle side) so the identity holds
  * bit-exactly at any n. The 4-decimal seal then runs ENTIRELY in
  * integer space — round(num/den, 4) as the exact rational
  * (2·|num|·10⁴ + den) div (2·den), sign re-applied — because the
  * double spelling round(num.toDouble/den, 4) provably diverges
  * cross-engine when the true quotient lands on a .00005 boundary no
  * double can represent (the q231 failure mode; q219 hit it too).
  */
object Pca {

  /** Upper-triangle sample covariance entries (i ≤ j, 0-based dims) of
    * an array<float> column: (i, j, n, cov). NULL vectors drop; ragged
    * lengths would misalign dims, so the operator requires (and the
    * fixture guarantees) fixed-length vectors — enforce upstream. */
  def covarianceMatrix(df: DataFrame, emb: Column): DataFrame = {
    val base = df.select(emb.as("v")).where(col("v").isNotNull)
      .withColumn("xq", expr(
        "transform(v, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0, 0) AS BIGINT))"))
      .localCheckpoint() // pair sums + dim sums + n share one scan
    val n = base.count()
    require(n >= 2, "covariance needs at least 2 vectors")
    // map-side pair explode: d(d+1)/2 structs per row, hash-agg collapses
    // to d(d+1)/2 groups before any exchange (partial aggregation)
    val pairSums = base.select(explode(expr(
        """flatten(transform(xq, (a, i) ->
          |  transform(slice(xq, i + 1, size(xq) - i), (b, jj) ->
          |    named_struct('i', i, 'j', i + jj, 'p', a * b))))""".stripMargin))
        .as("t"))
      .groupBy(col("t.i").as("i"), col("t.j").as("j"))
      .agg(sum(col("t.p")).as("sab"))
    val dimSums = base.select(posexplode(col("xq")).as(Seq("i", "x")))
      .groupBy("i").agg(sum("x").as("si"))
    val d38 = "decimal(38,0)"
    // den = n·(n−1)·10¹² computed driver-side as an exact decimal literal
    // (no plan-side decimal multiplication precision games)
    val den = BigInt(n) * BigInt(n - 1) * BigInt(10).pow(12)
    val denLit = lit(new java.math.BigDecimal(den.bigInteger)).cast(d38)
    pairSums
      .join(broadcast(dimSums.select(col("i"), col("si"))), Seq("i"))
      .join(broadcast(dimSums.select(col("i").as("j"), col("si").as("sj"))),
        Seq("j"))
      .withColumn("num", lit(n).cast(d38) * col("sab").cast(d38) -
        col("si").cast(d38) * col("sj").cast(d38))
      .withColumn("den", denLit)
      .select(col("i"), col("j"), lit(n).as("n"),
        // integer-space round-half-away-from-zero: both engines divide
        // positive integers only, so floor-vs-truncate can't differ
        (when(col("num") < 0,
            -expr("(2 * (-num) * 10000 + den) div (2 * den)"))
          .otherwise(expr("(2 * num * 10000 + den) div (2 * den)"))
          .cast("double") / lit(1e4)).as("cov"))
  }

  /** Cyclic-Jacobi eigendecomposition of a symmetric matrix — driver
    * side, deterministic (fixed sweep order, fixed sweep count;
    * convergence is quadratic, 12 sweeps ≫ enough at d ≤ 1024).
    * Returns (eigenvalues desc, eigenvectors as rows) with each
    * vector's sign canonicalized (largest-|component| positive) so the
    * decomposition is unique up to the sign convention. */
  def eigenJacobi(a0: Array[Array[Double]], sweeps: Int = 12)
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < sweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val sgn = if (theta >= 0) 1.0 else -1.0
            val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val col = Array.tabulate(d)(k => v(k)(i))
      val m = col.indices.maxBy(k => (math.abs(col(k)), -k))
      if (col(m) < 0) col.map(-_) else col
    }.toArray
    (vals, vecs)
  }

  /** Project an array<float> embedding onto driver-computed component
    * row-vectors (literal broadcast into the plan; the dot is the
    * codegen [[org.apache.spark.sql.graft.DotProduct]] — no UDF). */
  def project(df: DataFrame, emb: Column, components: Array[Array[Double]])
      : DataFrame = {
    val asD = transform(emb, x => x.cast("double"))
    val cols = components.zipWithIndex.map { case (c, k) =>
      org.apache.spark.sql.graft.VectorExprs.dot(asD,
        array(c.map(lit(_)): _*)).as(s"pc${k + 1}")
    }
    df.select(col("*") +: cols: _*)
  }
}
