package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-trigger cost + durable write volume of the 10-DAY soak (dev
  * tool, not a query; r12 directive 2's measurement leg — the
  * correctness pins live in SoakSpec): the cluster-maintenance loop in
  * both state modes over TEN modular-cut arrival days on sf0.1, with
  * stream kills after days 2/5/8, a VStage index compaction after day
  * 5, and the size-triggered auto-fold live in the patch mode. Prints
  * each trigger's wall and durable rows — the claim the table exists
  * to verify: the eager swap's write volume grows with the corpus
  * (state-sized every trigger) while the patch log's stays
  * batch-bounded across all ten triggers, folds included. Results →
  * PLANS.md §r13. */
object SoakProbe {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.{Tables, VStage}
    import graft.streaming.IngestStreams
    val docs = Tables.t(spark, src, "documents").localCheckpoint()
    val corpus = docs.where(col("doc_id") % 12 === 0 ||
      col("doc_id") % 12 === 11)
    val days = (1 to 10).map(i => docs.where(col("doc_id") % 12 === i))
    val kills = Set(2, 5, 8)
    def compactAt(name: String)(day: Int): Unit =
      if (day == 5)
        VStage.compact(spark, name + "_idx", "lsh_key", 8,
          df => df.dropDuplicates("lsh_key", "corpus_id")
            .repartition(8, col("lsh_key")))
    def run(mode: String): Unit = {
      val secs = scala.collection.mutable.Buffer.empty[Double]
      val rows = scala.collection.mutable.Buffer.empty[Long]
      val name = s"probe_soak_$mode"
      val t0 = System.nanoTime()
      if (mode == "patch")
        IngestStreams.clusterLoopDeferred(spark, corpus, days, name,
          killBetweenDays = false, batchSeconds = Some(secs),
          foldFactor = 0.05, killAfterDays = kills,
          afterSegment = compactAt(name), writeRows = Some(rows))
      else
        IngestStreams.clusterLoop(spark, corpus, days, name,
          killBetweenDays = false, batchSeconds = Some(secs),
          killAfterDays = kills, afterSegment = compactAt(name),
          writeRows = Some(rows))
      val total = (System.nanoTime() - t0) / 1e9
      println(f"$mode%-6s prep=${total - secs.sum}%6.2f s  " +
        "per-trigger wall_s: " +
        secs.map(s => f"$s%5.2f").mkString(" ") +
        "  durable_rows: " + rows.mkString(" "))
    }
    run("eager") // also the JIT warmup for the patch row
    run("patch")
    spark.stop()
  }
}
