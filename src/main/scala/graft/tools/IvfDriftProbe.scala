package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Codebook DRIFT under IVF index ingest (dev tool, not a query; r11
  * directive 4): q361 appends new mass under FIXED centroids and names
  * re-clustering "the periodic compaction analog" — this probe measures
  * the decay that makes the compaction worth paying for, and the
  * recovery ([[graft.Similarity.ivfRecluster]], oracle-gated as q367).
  *
  * Setup: the staged corpus is the sf0.1 embeddings; the appended mass
  * is 3× of it, distribution-SHIFTED (each copy's vectors blend toward
  * a rotation of themselves — deterministic, norm-preserving-ish, and
  * guaranteed to move probability mass off the original centroids; an
  * unshifted append would flatter the fixed codebook, since same-
  * distribution mass fits it fine). Both recall curves run over the
  * grown index with the SAME query panel (the original corpus's
  * label=1 rows), exact brute-force truth:
  *
  *   - `stale`: centroids trained on the original corpus only (what
  *     the q361 loop serves after 3× ingest without compaction)
  *   - `retrained`: centroids re-trained on the grown corpus (what
  *     [[graft.Similarity.ivfRecluster]] installs)
  *
  * Results → PLANS.md §r12 IVF drift. */
object IvfDriftProbe {
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
    import graft.{Similarity, Tables}
    val e = Tables.t(spark, src, "embeddings").localCheckpoint()
    val dim = e.select(size(col("embedding"))).first().getInt(0)
    // drifted append copies: vectors blend half-and-half with a rotation
    // of themselves (rotation offset grows per copy → three distinct
    // shifted modes), ids key-shifted off the originals
    val appends = (1 to 3).map { i =>
      val k = 8 * i
      e.select((col("vec_id") + lit(i.toLong * 10000000000L)).as("vec_id"),
        zip_with(
          concat(slice(col("embedding"), k + 1, dim - k),
            slice(col("embedding"), 1, k)),
          col("embedding"),
          (r, o) => (lit(0.5f) * r + lit(0.5f) * o).cast("float"))
          .as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
    val grown = e.unionByName(appends).localCheckpoint()
    val queries = e.filter(col("label") === 1)
    val stale = Similarity.kmeansCentroids(e, col("embedding"),
      col("vec_id"), c = 16, iters = 2)
    val retrained = Similarity.kmeansCentroids(grown, col("embedding"),
      col("vec_id"), c = 16, iters = 2)
    def curve(cents: Seq[(Long, Array[Double])]) =
      Similarity.ivfRecallCurve(grown, col("embedding"), col("vec_id"),
        queries, col("embedding"), col("vec_id"), k = 10,
        centroids = cents, probes = Seq(1, 2, 4, 8))
        .collect().map(r => (r.getInt(0), r.getDouble(3))).toMap
    val cs = curve(stale)
    val cr = curve(retrained)
    val nq = queries.count()
    val n = grown.count()
    println(s"corpus=$n (1x staged + 3x drifted appends), panel=$nq, k=10")
    println(f"${"nProbe"}%-7s ${"stale"}%8s ${"retrained"}%10s ${"delta"}%8s")
    Seq(1, 2, 4, 8).foreach { np =>
      println(f"$np%-7d ${cs(np)}%8.4f ${cr(np)}%10.4f ${cr(np) - cs(np)}%+8.4f")
    }
    spark.stop()
  }
}
