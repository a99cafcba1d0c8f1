package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: measure the `truthSample` scale path of the LSH
  * calibration devices (q334/q335) — exact quadratic truth vs the
  * hash-band-sampled truth at a rate that holds pair volume roughly
  * constant across a 10× corpus (rate 1/√10 ⇒ pairs ×10/10 ≈ ×1).
  * Evidence for the PLANS.md claim that the 100 TB spelling of the
  * calibrators costs fixture money, not corpus money.
  *
  * Usage: runMain graft.tools.SampledTruthProbe [sfDir] [sf1Dir] [rate]
  */
object SampledTruthProbe {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val big = if (args.length > 1) args(1) else "target/sf1"
    val rate = if (args.length > 2) args(2).toDouble else 0.3162
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def docs(dir: String) = graft.Tables.t(spark, dir, "documents")
    def time(tag: String)(body: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-42s ${ts.min}%7.2f s (min of 2)")
    }
    def run(dir: String, tag: String, s: Double): Unit = {
      time(s"bandPlan $tag truthSample=$s") {
        graft.Dedup.bandPlanCapture(docs(dir), col("text"), col("doc_id"),
            col("source"), shingleSize = 1, numPerm = 16,
            plans = Seq(2, 4, 8), minBin10 = 5, truthSample = s)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"lshEval  $tag truthSample=$s") {
        graft.Dedup.lshPlanEval(docs(dir), col("text"), col("doc_id"),
            col("source"), shingleSize = 1, numPerm = 16, bands = 4,
            minBin10 = 6, truthSample = s)
          .write.format("noop").mode("overwrite").save()
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    // warmup on the small side
    run(src, "warmup/sf0.1", 1.0)
    run(src, "sf0.1", 1.0)
    run(big, "sf1  ", 1.0)
    run(big, "sf1  ", rate)
    spark.stop()
  }
}
