package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (not a query): same-session A/B of the q350 cluster-safe
  * split census — the r10 NAIVE composition (Dedup.minhashCandidates →
  * connectedComponents → splitAssign → crossSplitNearDupLeak, which
  * tokenizes + signs the corpus TWICE) vs the r11 fused
  * [[graft.Dedup.clusterSafeSplitCensus]] (ONE tokenize/signature
  * checkpoint feeding spine, census candidates, and verify arrays).
  * Asserts result equality, prints min-of-2 wall per path.
  *
  * Usage: runMain graft.tools.FusedSplitProbe [dir ...]
  * (default: sf0.1 and, when present, the ScaleProbe's target/sf1)
  */
object FusedSplitProbe {
  private val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  private def naive(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.Tables.t(spark, dir, "documents")
    val pairs = graft.Dedup.minhashCandidates(d, col("text"), col("doc_id"),
      shingleSize = 1, numPerm = 16, bands = 4).select("id_a", "id_b")
    val labels = graft.Dedup.connectedComponents(pairs)
      .withColumnRenamed("id", "doc_id")
    val withSplit = d.join(labels, Seq("doc_id"), "left")
      .withColumn("comp", coalesce(col("comp"), col("doc_id")))
      .withColumn("split", graft.Sampling.splitAssign(col("comp"), fracs, "csp"))
    graft.Dedup.crossSplitNearDupLeak(withSplit, col("text"), col("doc_id"),
      col("split"), shingleSize = 1, numPerm = 16, bands = 4, minBin10 = 7)
  }

  private def fused(spark: SparkSession, dir: String): DataFrame =
    graft.Dedup.clusterSafeSplitCensus(graft.Tables.t(spark, dir, "documents"),
      col("text"), col("doc_id"),
      comp => graft.Sampling.splitAssign(comp, fracs, "csp"),
      shingleSize = 1, numPerm = 16, bands = 4, minBin10 = 7)

  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")) ++
        Some(sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "target/sf1"))
          .filter(d => new java.io.File(s"$d/documents.parquet").isFile)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def drop(): Unit = spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    def time(f: => DataFrame): (Double, Seq[String]) = {
      drop(); System.gc()
      val t0 = System.nanoTime()
      val rows = f.collect().map(_.toString).toSeq.sorted
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    dirs.foreach { dir =>
      // warmup both paths once, then min of 2 timed passes each
      time(naive(spark, dir)); time(fused(spark, dir))
      val (n1, rN) = time(naive(spark, dir))
      val (f1, rF) = time(fused(spark, dir))
      val (n2, _) = time(naive(spark, dir))
      val (f2, _) = time(fused(spark, dir))
      assert(rN == rF, s"result mismatch on $dir")
      println(f"$dir%-24s naive=${math.min(n1, n2)}%6.2fs " +
        f"fused=${math.min(f1, f2)}%6.2fs " +
        f"speedup=${math.min(n1, n2) / math.min(f1, f2)}%5.2fx rows=${rN.size}")
    }
    spark.stop()
  }
}
