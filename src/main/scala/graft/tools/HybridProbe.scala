package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B for q380's IVF vector leg (dev tool, not a query): how much of
  * q378's EXACT hybrid answer does the staged-index serving shape keep,
  * per nProbe? The lexical leg is shared (identical in both), so any
  * fused-list divergence is the vector leg's approximation alone. For
  * each nProbe ∈ {1, 2, 4, 8} the probe fuses the staged IVF leg with
  * the exact lexical leg and reports (a) mean overlap@10 of the fused
  * list vs the exact-fused truth, (b) vector-leg recall@20 vs the
  * brute-force leg, (c) serving wall per leg. Results → PLANS.md §r13
  * hybrid rows; the claim q380 rides on is the q362 IVF recall curve
  * carrying through fusion roughly undamped (the lexical leg anchors
  * half of every fused score). */
object HybridProbe {
  def main(args: Array[String]): Unit = {
    val dst = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/hybrid_probe_wh")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.{Curate, Similarity, Staging, Tables}
    def t[A](f: => A): (A, Double) = {
      System.gc()
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val docs = Tables.t(spark, dst, "documents")
    val e = Tables.t(spark, dst, "embeddings")
    val isQ = col("doc_id") % 50 === 0

    val (lex, wLex) = t(Curate.tfidfQueryTopK(docs, col("doc_id"),
      col("text"), isQ, kLex = 20).localCheckpoint())
    val (vecExact, wVec) = t(Similarity.bruteKnnJoin(e, col("embedding"),
        col("vec_id"), e.where(col("vec_id") % 50 === 0), col("embedding"),
        col("vec_id"), k = 20, excludeSelf = true)
      .select(col("qid"), col("id"), col("rank")).localCheckpoint())
    val truth = Similarity.rrfFuseGroupedTopK(lex, vecExact, 60, 10)
      .select(col("qid"), col("id")).localCheckpoint()
    val nQ = truth.select("qid").distinct().count()
    println(f"sf_dir=$dst n_queries=$nQ lex_wall=$wLex%.2fs exact_vec_wall=$wVec%.2fs")

    val cents = Similarity.kmeansCentroids(e, col("embedding"),
      col("vec_id"), c = 16, iters = 2)
    Staging.stageBucketed(Similarity.ivfIndexFrame(e, col("embedding"),
      col("vec_id"), cents), "graft_hyb_probe_idx", "cell", 8)
    val idx = Staging.load(spark, "graft_hyb_probe_idx")
    val exactVecSet = vecExact.select(col("qid"), col("id"))
    println(f"${"nProbe"}%-7s ${"vec_wall_s"}%10s ${"leg_recall@20"}%14s ${"fused_overlap@10"}%17s")
    for (np <- Seq(1, 2, 4, 8)) {
      val (ivfLeg, wIvf) = t(Similarity.ivfKnnJoinIndex(idx,
          e.where(col("vec_id") % 50 === 0), col("embedding"), col("vec_id"),
          k = 20, centroids = cents, nProbe = np, excludeSelf = true)
        .select(col("qid"), col("id"), col("rank")).localCheckpoint())
      val legHit = ivfLeg.join(exactVecSet, Seq("qid", "id"), "left_semi").count()
      val fused = Similarity.rrfFuseGroupedTopK(lex, ivfLeg, 60, 10)
        .select(col("qid"), col("id"))
      val fusedHit = fused.join(truth, Seq("qid", "id"), "left_semi").count()
      println(f"$np%-7d $wIvf%10.2f ${legHit.toDouble / (nQ * 20)}%14.4f " +
        f"${fusedHit.toDouble / (nQ * 10)}%17.4f")
    }
    spark.stop()
  }
}
