package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Dedup

/** Dev probe: stage-level wall-clock breakdown of q61
  * (`Dedup.ngramJaccardPairsPrefix`) at sf0.1, to target the next
  * constant-factor trim. Not part of the bench or the correctness
  * gate. Warm pass reported (the Bench convention). */
object StageProbe3 {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[stage] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docsDf = spark.read.parquet(s"$sfDir/documents.parquet")

    def full(label: String): Unit = time(label) {
      Dedup.ngramJaccardPairsPrefix(docsDf, col("text"), col("doc_id"),
        col("source"), n = 1, minJ = 0.6)
        .write.format("noop").mode("overwrite").save()
    }
    full("q61 full (cold)")
    full("q61 full (warm)")
    full("q61 full (warm2)")

    // stage splits, warm
    val minJ = 0.6
    println("== q61 stages (warm) ==")
    val t = docsDf.select(col("doc_id").as("__id"), col("source").as("__blk"),
      array_distinct(transform(array_distinct(split(col("text"), " ")),
        g => xxhash64(g))).as("__g"))
    time("t count") { println("  t rows = " + t.count()) }
    val tok = t.select(col("__id"), col("__blk"), size(col("__g")).as("__sz"),
      explode(col("__g")).as("__t"))
    val freq = tok.groupBy("__blk", "__t").agg(count(lit(1)).as("__df"))
    val prefix = tok.join(freq, Seq("__blk", "__t"))
      .groupBy("__blk", "__id", "__sz")
      .agg(slice(array_sort(collect_list(struct(col("__df"), col("__t")))),
        lit(1), (floor((lit(1.0) - lit(minJ)) * col("__sz")) + 1).cast("int"))
        .as("__p"))
      .select(col("__blk"), col("__id"), col("__sz"), posexplode(col("__p")))
      .select(col("__blk"), col("col.__t").as("__t"), col("__id"),
        col("__sz"), (col("pos") + 1).as("__rank"))
      .repartition(32, col("__blk"), col("__t"))
    time("prefix count") { println("  prefix rows = " + prefix.count()) }
    val eps = 1e-9
    val reachable = least(col("a.__sz") - col("a.__rank"),
      col("b.__sz") - col("b.__rank")) + 1
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.__blk") === col("b.__blk") && col("a.__t") === col("b.__t") &&
          col("a.__id") < col("b.__id") &&
          least(col("a.__sz"), col("b.__sz")) + eps >=
            lit(minJ) * greatest(col("a.__sz"), col("b.__sz")) &&
          reachable + eps >=
            lit(minJ / (1.0 + minJ)) * (col("a.__sz") + col("b.__sz")))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b")).distinct()
    time("cand count") { println("  cand rows = " + cand.count()) }
    val candC = time("cand checkpoint") {
      cand.repartition(32, col("id_a")).localCheckpoint()
    }
    val tC = time("t checkpoint") {
      t.repartition(32, col("__id")).localCheckpoint()
    }
    time("verify from checkpoints") {
      candC
        .join(tC.select(col("__id").as("id_a"), col("__g").as("g_a")),
          Seq("id_a"))
        .join(tC.select(col("__id").as("id_b"), col("__g").as("g_b")),
          Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("g_a"), col("g_b"))).cast("long")
            .as("__i"),
          (size(col("g_a")) + size(col("g_b"))).cast("long").as("__ab"))
        .where(col("__i").cast("double") / (col("__ab") - col("__i"))
          >= minJ)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
