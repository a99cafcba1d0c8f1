package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Companion to [[ScaleProbe]]: counts the TRUE near-dup pair output of
  * the pair-emitting dedup queries at sf0.1 vs the synthetic sf1, to
  * separate "superlinear plan" from "superlinear OUTPUT" — the salted
  * 10-copy corpus gives every doc 9 near-identical clones (one extra
  * prefix token on a ~10²-token doc ⇒ wj ≈ 0.99), so the qualifying
  * pair set itself grows ~C(10,2)·n + 100·(original pairs), and a pair
  * join whose wall-clock tracks OUTPUT is behaving exactly as its
  * candidates-∝-true-dups contract says. */
object PairGrowthProbe {
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
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q305_weighted_jaccard_banded", "q61_dedup_ngram_prefix")
    names.foreach { q =>
        val fn = graft.SparkEntry.queries(q)
        val a = fn(spark, src).count()
        val b = fn(spark, dst).count()
        println(f"$q%-30s pairs sf0.1=$a%8d sf1=$b%10d growth=${
          b.toDouble / math.max(a, 1)}%8.1f")
      }
    spark.stop()
  }
}
