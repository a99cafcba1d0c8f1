package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B for q355 incremental connected components (dev tool, not a
  * query): the ingest-time cost model says a full dedup-cluster
  * recompute pays O(corpus) signatures + the whole CC fixpoint EVERY
  * batch, while [[graft.Dedup.ccIncremental]] pays O(batch) — batch
  * signatures, a probe of the staged LSH index, CC over the
  * batch-sized contracted quotient, and two broadcast-joined corpus
  * label scans. This probe merges the SAME fixed batch into a growing
  * corpus (sf0.1, then the synthetic 10× sf1 built by [[ScaleProbe]]),
  * timing the incremental path (given staged index + existing labels,
  * the steady-state daily position) against the full recompute, and
  * requiring the two label sets agree exactly (count + id/comp sums).
  * Results → PLANS.md §r11 incremental CC. */
object IncrementalCCProbe {
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
      .where(col("doc_id") % 10 === 9).localCheckpoint()
    def corpusOf(dir: String) = Tables.t(spark, dir, "documents")
      .where(col("doc_id") % 10 =!= 9)

    def t[A](f: => A): (A, Double) = {
      System.gc()
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def sig(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)), sum("id"), sum("comp")).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    println(f"${"corpus"}%-8s ${"prep_s"}%8s ${"incr_s"}%8s ${"full_s"}%8s " +
      f"${"labels"}%9s")
    Seq("sf0.1" -> src, "sf1" -> dst).foreach { case (tag, dir) =>
      if (!new java.io.File(s"$dir/documents.parquet").isFile)
        sys.error(s"missing fixture $dir — run ScaleProbe first")
      val corpus = corpusOf(dir)
      val table = s"probe_icc_${tag.replaceAll("[^A-Za-z0-9]", "_")}"
      // steady-state prep (the once-per-corpus cost, reported separately):
      // staged band index + existing cluster labels
      val (labels0, prepS) = t {
        Staging.stageBucketed(
          Dedup.lshIndexFrame(corpus, col("text"), col("doc_id")),
          table, "lsh_key", 32)
        Dedup.connectedComponents(
          Dedup.minhashStarEdges(corpus, col("text"), col("doc_id")))
          .localCheckpoint()
      }
      def incr() = sig(Dedup.ccIncremental(labels0,
        Dedup.batchIngestEdges(batch, Staging.load(spark, table),
          col("text"), col("doc_id"))))
      def full() = sig(Dedup.connectedComponents(
        Dedup.minhashStarEdges(corpus.select("doc_id", "text")
          .unionByName(batch.select("doc_id", "text")),
          col("text"), col("doc_id"))))
      // warm + two-pass min, the Bench convention
      incr(); full()
      val (r1, a1) = t(incr()); val (_, a2) = t(incr())
      val (r2, b1) = t(full()); val (_, b2) = t(full())
      require(r1 == r2, s"incremental/full disagree: $r1 vs $r2")
      println(f"$tag%-8s $prepS%8.2f ${math.min(a1, a2)}%8.2f " +
        f"${math.min(b1, b2)}%8.2f ${r1._1}%9d")
    }
    spark.stop()
  }
}
