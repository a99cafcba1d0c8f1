package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B for q362's `panelFrac` knob (dev tool, not a query): the recall
  * calibration's cost is truth-bound (exact brute-force over
  * queries × corpus — 63× wall at 10× data, where both sides grow
  * 10×), and the query panel is the natural sampling unit (each query
  * is an independent recall observation; s.e. ∝ 1/√n). This probe
  * measures the full curve vs panelFrac ∈ {0.3, 0.1} on the sf1
  * fixture and prints the recall estimates side by side — the claim is
  * near-linear cost cut with the estimate inside the binomial error
  * bar. Results → PLANS.md §r11 ANN rows. */
object RecallPanelProbe {
  def main(args: Array[String]): Unit = {
    val dst = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "target/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.{Similarity, Tables}
    val e = Tables.t(spark, dst, "embeddings")
    val q = e.filter(col("label") === 1)
    val cents = Similarity.kmeansCentroids(e, col("embedding"),
      col("vec_id"), c = 16, iters = 2)
    def t[A](f: => A): (A, Double) = {
      System.gc()
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def run(frac: Double) = Similarity.ivfRecallCurve(e, col("embedding"),
        col("vec_id"), q, col("embedding"), col("vec_id"), k = 10,
        centroids = cents, probes = Seq(1, 2, 4, 8), panelFrac = frac)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(3))).toSeq
    run(1.0) // warm
    println(f"${"frac"}%-6s ${"wall_s"}%8s  recall@10 per nProbe (n_queries)")
    Seq(1.0, 0.3, 0.1).foreach { frac =>
      val (r1, w1) = t(run(frac)); val (_, w2) = t(run(frac))
      val cells = r1.map { case (np, nq, rc) => f"p$np=$rc%.4f" }.mkString(" ")
      println(f"$frac%-6.1f ${math.min(w1, w2)}%8.2f  $cells (n=${r1.head._2})")
    }
    spark.stop()
  }
}
