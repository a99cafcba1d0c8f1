package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Similarity, Tables}

/** Scratch profiler for kmeansCentroids phases (dev tool, not a query). */
object ProfileKmeans {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[prof] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val e = Tables.t(spark, dir, "embeddings")
    e.count()
    // phase breakdown (mirrors kmeansCentroids internals)
    val q = t("quantize+checkpoint")(e.select(col("vec_id").cast("long").as("id"),
        transform(col("embedding").cast("array<double>"),
          x => round(x * 10000).cast("long")).as("q"))
      .localCheckpoint())
    var cents: Seq[(Long, Array[Double])] = t("init collect")(
      q.orderBy("id").limit(16).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).map(_.toDouble).toArray)).toSeq)
    for (it <- 1 to 2) {
      val cell = element_at(Similarity.nearestCells(
        col("q").cast("array<double>"), cents, 1), 1)
      val aggs = (0 until 64).map(i => sum(element_at(col("q"), i + 1)).as(s"s$i"))
      val plan = t(s"iter$it plan+opt")(q.groupBy(cell.as("__cell")).agg(aggs.head, aggs.tail: _*))
      val sums = t(s"iter$it execute+collect")(plan.collect())
      val byCell = sums.map(r =>
        r.getLong(0) -> Array.tabulate(64)(i => r.getLong(i + 1).toDouble)).toMap
      cents = cents.map { case (cid, old) => (cid, byCell.getOrElse(cid, old)) }
    }

    for (i <- 1 to 3) {
      val cents = t(s"kmeans full #$i")(
        Similarity.kmeansCentroids(e, col("embedding"), col("vec_id"), 16, 2))
      val q = e.orderBy("vec_id").limit(1)
      t(s"serve ivfTopK #$i")(
        Similarity.ivfTopK(e, col("embedding"), col("vec_id"), q, col("embedding"),
          10, cents, 4).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
