package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main for q25 (delete before final). */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables.t(spark, dir, "documents")
    // warm parquet read
    time("scan")(docs.write.format("noop").mode("overwrite").save())
    time("shingles+explode") {
      docs.select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("__sh"))
        .write.format("noop").mode("overwrite").save()
    }
    time("hash28") {
      docs.select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("__sh"))
        .select(col("doc_id"), Dedup.hash28(col("__sh")).as("__x"))
        .write.format("noop").mode("overwrite").save()
    }
    time("signatures") {
      Dedup.minhashSignatures(docs, col("text"), col("doc_id"), 3, 16)
        .write.format("noop").mode("overwrite").save()
    }
    time("signatures again") {
      Dedup.minhashSignatures(docs, col("text"), col("doc_id"), 3, 16)
        .write.format("noop").mode("overwrite").save()
    }
    time("candidates full") {
      Dedup.minhashCandidates(docs, col("text"), col("doc_id"), 3, 16, 4)
        .write.format("noop").mode("overwrite").save()
    }
    time("candidates+orderBy (q25)") {
      SparkEntry.queries("q25_dedup_minhash")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
