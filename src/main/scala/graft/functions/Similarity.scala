package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector-similarity operators over embedding columns (array<float|double>).
  *
  * Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
  * variant is the 100 TB path: random-hyperplane signatures turn the
  * quadratic cross join into an equi-join on bucket id, and the exact
  * distance only runs inside buckets.
  */
object Similarity {
  /** Dot product via the native codegen expression ([[org.apache.spark.sql.graft.VectorExprs.dot]]):
    * identical values (same ascending-index summation) to the
    * aggregate(zip_with(...)) composition, but it stays inside whole-stage
    * codegen instead of interpreted per-element lambdas. */
  def dot(a: Column, b: Column): Column = org.apache.spark.sql.graft.VectorExprs.dot(a, b)

  def l2(a: Column): Column = sqrt(org.apache.spark.sql.graft.VectorExprs.dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2(a) * l2(b))

  /** Brute-force cosine top-k of `df` rows against one query vector.
    * Scale shape: the query side is a broadcast of one row; the big side
    * streams through a single narrow pass, and TakeOrderedAndProject keeps
    * only k rows per partition before the final merge. */
  def bruteForceTopK(df: DataFrame, emb: Column, id: Column,
                     query: DataFrame, queryEmb: Column, k: Int): DataFrame =
    df.select(id.as("id"), emb.cast("array<double>").as("__e"))
      .crossJoin(broadcast(query.select(queryEmb.cast("array<double>").as("__q"))))
      .select(col("id"), cosine(col("__e"), col("__q")).as("cos_sim"))
      .orderBy(desc("cos_sim"), col("id"))
      .limit(k)

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a fixed-seed hash mapped to [-1, 1]. Reproducible across runs/engines. */
  private def planeComponent(plane: Int, dim: Int): Double = {
    val h = scala.util.hashing.MurmurHash3.productHash((plane, dim, 42))
    h.toDouble / Int.MaxValue
  }

  /** Random-hyperplane LSH bucket id: one sign bit per plane. `planeOffset`
    * selects a disjoint plane range, giving independent hash tables. */
  def lshBucket(emb: Column, numPlanes: Int, dim: Int, planeOffset: Int = 0): Column = {
    val bits = (0 until numPlanes).map { p =>
      val plane = array((0 until dim).map(d => lit(planeComponent(planeOffset + p, d))): _*)
      when(dot(emb, plane) >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** LSH-bucketed approximate top-k: candidates = rows in the query's bucket
    * (across `numTables` independent hash tables to boost recall), exact
    * cosine within candidates only. Bucket ids are tagged with the table
    * index so the equi-join never mixes tables. */
  def lshTopK(df: DataFrame, emb: Column, id: Column,
              query: DataFrame, queryEmb: Column, k: Int,
              numPlanes: Int = 8, numTables: Int = 4, dim: Int = 64): DataFrame = {
    def tables(e: Column): Column = array((0 until numTables).map(t =>
      concat_ws(":", lit(t),
        lshBucket(e, numPlanes, dim, planeOffset = t * numPlanes))): _*)
    val cand = df.select(id.as("id"), emb.cast("array<double>").as("__e"),
        explode(tables(emb.cast("array<double>"))).as("__bucket"))
    val q = query.select(queryEmb.cast("array<double>").as("__q"),
        explode(tables(queryEmb.cast("array<double>"))).as("__bucket"))
    cand.join(broadcast(q), Seq("__bucket"))
      .select(col("id"), cosine(col("__e"), col("__q")).as("cos_sim"))
      .groupBy("id").agg(max("cos_sim").as("cos_sim")) // dedup multi-table hits
      .orderBy(desc("cos_sim"), col("id"))
      .limit(k)
  }
}
