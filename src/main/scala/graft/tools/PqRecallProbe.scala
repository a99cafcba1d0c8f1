package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PQ recall CALIBRATION (dev tool, not a query; r12 directive 5):
  * q348's product-quantization serving path was the one ANN member
  * without a measured recall row. This probe runs the q362-style sweep
  * on the JITTERED sf1 panel: measured recall@10 of
  * [[graft.Similarity.pqTopKBatch]] against exact brute-force truth
  * across (subspaces m × codebook size), next to the int8 two-pass
  * (q72's quantizedTopK shape, batched the same way) — recall-vs-cost
  * for the whole quantization ladder. Results → PLANS.md §r13.
  *
  * The exact-truth side cross-joins the broadcast query panel —
  * quadratic BY DESIGN (the calibration-truth device, q335 precedent);
  * `SPARK_GRAFT_PANEL_MOD` hash-samples the panel (each query is an
  * independent recall observation). */
object PqRecallProbe {
  def main(args: Array[String]): Unit = {
    val dst = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "target/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val panelMod = sys.env.getOrElse("SPARK_GRAFT_PANEL_MOD", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.{Similarity, Tables}
    import org.apache.spark.sql.expressions.Window
    val k = 10
    val e = Tables.t(spark, dst, "embeddings").localCheckpoint()
    val panel = e.filter(col("label") === 1 &&
      pmod(col("vec_id"), lit(panelMod)) === 0).localCheckpoint()
    val nq = panel.count()
    val n = e.count()
    println(s"corpus=$n, panel=$nq (label=1, vec_id%$panelMod=0), k=$k")

    def t[A](f: => A): (A, Double) = {
      System.gc()
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // exact truth: brute-force cosine top-k per panel query (the
    // calibration-truth cross join)
    val wq = Window.partitionBy("qid").orderBy(desc("__cos"), col("id"))
    def exactTop(): org.apache.spark.sql.DataFrame =
      e.select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("__v"))
        .crossJoin(broadcast(panel.select(col("vec_id").as("qid"),
          col("embedding").cast("array<double>").as("__q"))))
        .select(col("qid"), col("id"),
          Similarity.cosine(col("__v"), col("__q")).as("__cos"))
        .withColumn("rank", row_number().over(wq))
        .where(col("rank") <= k)
        .select("qid", "id")
    val (truth, truthWall) = t(exactTop().localCheckpoint())
    println(f"exact truth pass: $truthWall%.2f s (the 1.0-recall baseline cost)")

    def recallOf(res: org.apache.spark.sql.DataFrame): Double = {
      val hits = res.select("qid", "id").join(truth, Seq("qid", "id"))
        .count()
      hits.toDouble / (k * nq)
    }
    println(f"${"config"}%-14s ${"wall_s"}%8s ${"recall@10"}%10s")
    // int8 two-pass (q72's shape, batched): quantized coarse shortlist
    // + exact re-rank
    def int8Top(): org.apache.spark.sql.DataFrame = {
      val c = e.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("__v"))
        .withColumn("__qv", Similarity.quantizeVec(col("__v")))
      val q = panel.select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("__q"))
        .withColumn("__qq", Similarity.quantizeVec(col("__q")))
      val wS = Window.partitionBy("qid").orderBy(desc("__coarse"), col("id"))
      val sl = c.crossJoin(broadcast(q))
        .select(col("qid"), col("id"), col("__v"), col("__q"),
          Similarity.cosine(col("__qv"), col("__qq")).as("__coarse"))
        .withColumn("__r", row_number().over(wS))
        .where(col("__r") <= 50)
      sl.select(col("qid"), col("id"),
          Similarity.cosine(col("__v"), col("__q")).as("__cos"))
        .withColumn("rank", row_number().over(wq))
        .where(col("rank") <= k)
        .select("qid", "id")
    }
    val (i8, i8w) = t(int8Top().localCheckpoint())
    println(f"${"int8+rerank"}%-14s $i8w%8.2f ${recallOf(i8)}%10.4f")
    // PQ sweep: train per-config codebooks on the corpus, serve the
    // whole panel through the batched ADC path
    Seq((4, 8), (4, 16), (8, 8), (8, 16), (16, 16)).foreach {
      case (m, codes) =>
        val (res, w) = t {
          val books = Similarity.pqCodebooks(e, col("embedding"),
            col("vec_id"), dim = 64, m = m, codes = codes)
          Similarity.pqTopKBatch(e, col("embedding"), col("vec_id"),
            panel, col("embedding"), col("vec_id"), dim = 64, k = k,
            shortlist = 50, m = m, codes = codes, books = books)
            .localCheckpoint()
        }
        val bits = m * (math.log(codes) / math.log(2)).round
        println(f"${s"pq m=$m c=$codes"}%-14s $w%8.2f " +
          f"${recallOf(res)}%10.4f   ($bits bits/vector)")
    }
    spark.stop()
  }
}
