package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-trigger cost of the ACTUAL streaming cluster-maintenance loop
  * (q364) under corpus scale (dev tool, not a query; r11 directive 5):
  * [[graft.streaming.IngestStreams.clusterLoop]] drives two fixed-size
  * arrival days against a 1×/10×/100× corpus (the ScaleProbe fixtures;
  * modular cuts keep the batch the same rows at every scale, the
  * IncrementalCCProbe convention) and reports each micro-batch body's
  * wall separately from the one-time prep (index staging + day-0 CC +
  * state bootstrap).
  *
  * What to expect — and what this probe exists to make honest: the
  * COMPUTE per batch is O(batch) (the q355 contract, measured flat in
  * IncrementalCCProbe), but since r12 each trigger also pays the
  * durable-state swap — a labels-table-sized parquet write
  * ([[graft.streaming.DurableState]]) — which is O(corpus) I/O. The
  * per-batch wall therefore grows with corpus scale by exactly the
  * state write; the state row count is printed so PLANS.md can
  * attribute it. The `patch` mode rows run the SAME loop on the
  * deferred-relabel patch-log state
  * ([[graft.streaming.IngestStreams.clusterLoopDeferred]], q368) whose
  * per-trigger durable I/O is batch-bounded — the claim those rows
  * exist to verify is eager growing with corpus, patch staying flat. */
object IngestStreamProbe {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dst = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "target/sf1")
    val d100 = sys.env.getOrElse("SPARK_GRAFT_SF100_DIR", "target/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Tables
    import graft.streaming.{DurableState, IngestStreams}

    // fixed arrival days: the sf0.1 docs' 8- and 9-tails (key shifts are
    // multiples of 10, so the corpus filter excludes every copy's tails
    // and the batch rows exist verbatim at every scale)
    val day1 = Tables.t(spark, src, "documents")
      .where(col("doc_id") % 10 === 8).localCheckpoint()
    val day2 = Tables.t(spark, src, "documents")
      .where(col("doc_id") % 10 === 9).localCheckpoint()
    val dirs = Seq("sf0.1" -> src) ++
      (if (new java.io.File(s"$dst/documents.parquet").isFile)
        Seq("sf1" -> dst) else Nil) ++
      (if (new java.io.File(s"$d100/documents.parquet").isFile)
        Seq("sf10" -> d100) else Nil)
    println(f"${"corpus"}%-8s ${"mode"}%-8s ${"prep_s"}%8s " +
      f"${"batch1_s"}%9s ${"batch2_s"}%9s ${"state_rows"}%11s")
    // one JIT warmup pass on the small corpus, then one measured pass
    // per (scale, mode) — the stream includes staging; two-pass min
    // would double the 100× wall for no extra signal
    def run(tag: String, dir: String, deferred: Boolean): Unit = {
      val corpus = Tables.t(spark, dir, "documents")
        .where(col("doc_id") % 10 < 8)
      val mode = if (deferred) "patch" else "eager"
      val buf = scala.collection.mutable.Buffer.empty[Double]
      val t0 = System.nanoTime()
      val name = s"probe_ism_${mode}_${tag.replaceAll("[^A-Za-z0-9]", "_")}"
      val statePath =
        if (deferred) IngestStreams.clusterLoopDeferred(spark, corpus,
          Seq(day1, day2), name, killBetweenDays = false,
          batchSeconds = Some(buf))
        else IngestStreams.clusterLoop(spark, corpus,
          Seq(day1, day2), name, killBetweenDays = false,
          batchSeconds = Some(buf))
      val total = (System.nanoTime() - t0) / 1e9
      val n = (if (deferred) IngestStreams.patchLogLabels(spark, statePath)
        else DurableState.load(spark, statePath)).count()
      println(f"$tag%-8s $mode%-8s ${total - buf.sum}%8.2f " +
        f"${buf(0)}%9.2f ${buf(1)}%9.2f $n%11d")
    }
    run("warmup", src, deferred = false)
    run("warmup", src, deferred = true)
    dirs.foreach { case (tag, dir) =>
      run(tag, dir, deferred = false)
      run(tag, dir, deferred = true)
    }
    spark.stop()
  }
}
