package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B for the q353 staged LSH index (dev tool, not a query): the
  * ingestion-time cost model says [[graft.Dedup.minhashAgainst]]
  * run daily pays O(corpus) signatures + a corpus-side shuffle EVERY
  * batch, while [[graft.Dedup.minhashAgainstIndex]] pays the
  * corpus cost once at staging and each batch then costs O(batch)
  * signatures + one batch-side shuffle + a bucketed index read. This
  * probe measures both paths deduping the SAME fixed batch against a
  * growing corpus (sf0.1, then the synthetic 10× sf1 built by
  * [[ScaleProbe]]), reporting staging cost separately — the claim to
  * verify is that the per-batch staged cost grows far slower than the
  * inline cost as the corpus scales. Results → PLANS.md §r11 staged
  * index. */
object StagedIndexProbe {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dst = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "target/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.{Dedup, Staging, Tables}

    // fixed ingest batch: the sf0.1 docs tail (same rows at both scales)
    val batch = Tables.t(spark, src, "documents")
      .where(col("doc_id") % 10 === 9)
    def corpusOf(dir: String) = Tables.t(spark, dir, "documents")
      .where(col("doc_id") % 10 =!= 9)

    def t[A](f: => A): (A, Double) = {
      System.gc()
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    println(f"${"corpus"}%-12s ${"stage_s"}%8s ${"staged_s"}%9s " +
      f"${"inline_s"}%9s ${"rows"}%8s")
    // 100× leg (r11 directive 5): present only when the SCALE_COPIES=100
    // fixture was generated (SPARK_GRAFT_SF100_DIR, default target/sf10);
    // the inline arm is skipped there — it is the O(corpus)-per-batch
    // path the staged index exists to avoid, and at 100× it is also the
    // disk-full risk the probe protocol retired in r11
    val d100 = sys.env.getOrElse("SPARK_GRAFT_SF100_DIR", "target/sf10")
    val dirs = Seq("sf0.1" -> src, "sf1" -> dst) ++
      (if (new java.io.File(s"$d100/documents.parquet").isFile)
        Seq("sf10" -> d100) else Nil)
    dirs.foreach { case (tag, dir) =>
      if (!new java.io.File(s"$dir/documents.parquet").isFile)
        sys.error(s"missing fixture $dir — run ScaleProbe first")
      val skipInline = tag == "sf10"
      val corpus = corpusOf(dir)
      val table = s"probe_lsh_${tag.replaceAll("[^A-Za-z0-9]", "_")}"
      val (_, stageS) = t {
        Staging.stageBucketed(
          Dedup.lshIndexFrame(corpus, col("text"), col("doc_id")),
          table, "lsh_key", 32)
      }
      def staged() = Dedup.minhashAgainstIndex(batch,
        Staging.load(spark, table), col("text"), col("doc_id")).count()
      def inline() = Dedup.minhashAgainst(batch, corpus, col("text"),
        col("doc_id")).count()
      // warm + two-pass min, the Bench convention
      staged()
      val (r1, s1) = t(staged()); val (_, s2) = t(staged())
      if (skipInline)
        println(f"$tag%-12s $stageS%8.2f ${math.min(s1, s2)}%9.2f " +
          f"${"skipped"}%9s $r1%8d")
      else {
        inline()
        val (r2, i1) = t(inline()); val (_, i2) = t(inline())
        require(r1 == r2, s"staged/inline disagree: $r1 vs $r2")
        println(f"$tag%-12s $stageS%8.2f ${math.min(s1, s2)}%9.2f " +
          f"${math.min(i1, i2)}%9.2f $r1%8d")
      }
    }
    spark.stop()
  }
}
