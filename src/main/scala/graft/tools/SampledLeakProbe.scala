package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q352 vs q349 at scale (dev tool, not a query): the sampled leak
  * census exists so a 100 TB audit can trade verify cost for a
  * rate-estimate with known error — this probe measures BOTH sides of
  * the trade on the dup-rich synthetic sf1 (where q349's exact verify
  * is pair-bound at ×10,229 candidates): wall-clock exact vs sampled
  * (frac = 0.5 and 0.1), and the estimate's accuracy (est_leaked vs the
  * exact n_leaked per split pair). Results → PLANS.md §r11 q352. */
object SampledLeakProbe {
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
    import graft.{Dedup, Sampling, Tables}
    require(new java.io.File(s"$dst/documents.parquet").isFile,
      s"missing fixture $dst — run ScaleProbe first")

    def docs = Tables.t(spark, dst, "documents")
      .withColumn("split", Sampling.splitAssign(col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "sp"))
    def t[A](f: => A): (A, Double) = {
      System.gc()
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // warm the session once (codegen/JIT + file listing), then
    // two-pass min per config — the Bench convention
    Dedup.crossSplitNearDupLeak(docs, col("text"), col("doc_id"),
      col("split")).collect()
    val (exact, te1) = t {
      Dedup.crossSplitNearDupLeak(docs, col("text"), col("doc_id"),
        col("split")).collect()
    }
    val (_, te2) = t {
      Dedup.crossSplitNearDupLeak(docs, col("text"), col("doc_id"),
        col("split")).collect()
    }
    println(f"exact census: ${math.min(te1, te2)}%.1f s")
    exact.foreach(r => println(s"  $r"))
    Seq(0.5, 0.1).foreach { frac =>
      val (s, ts1) = t {
        Dedup.crossSplitNearDupLeakSampled(docs, col("text"), col("doc_id"),
          col("split"), frac = frac).collect()
      }
      val (_, ts2) = t {
        Dedup.crossSplitNearDupLeakSampled(docs, col("text"), col("doc_id"),
          col("split"), frac = frac).collect()
      }
      val ts = math.min(ts1, ts2)
      println(f"sampled frac=$frac%.1f: $ts%.1f s")
      s.foreach { r =>
        val key = (r.getString(0), r.getString(1))
        val ex = exact.find(e => (e.getString(0), e.getString(1)) == key).get
        val est = r.getLong(6)
        val truth = ex.getLong(3)
        val err = if (truth > 0) (est - truth).toDouble / truth else 0.0
        println(f"  $key cand=${r.getLong(2)} sampled=${r.getLong(3)} " +
          f"est=$est truth=$truth rel_err=$err%+.4f")
      }
    }
    spark.stop()
  }
}
