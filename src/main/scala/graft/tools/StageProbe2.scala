package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object StageProbe2 {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[stage] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docsDf = spark.read.parquet(s"$sfDir/documents.parquet")
    val para = 32; val minW = 0.6
    def run(tag: String): Unit = {
      println(s"== $tag: q305 STRING baseline decomposition ==")
      val tok = time("tok checkpoint") {
        docsDf.select(col("doc_id").as("id"), col("source").as("blk"),
            explode(split(col("text"), " ")).as("term"))
          .where(col("id").isNotNull && col("blk").isNotNull)
          .groupBy("id", "blk", "term").agg(count(lit(1)).as("tf"))
          .repartition(para, col("id")).localCheckpoint()
      }
      println("  tok rows = " + tok.count())
      val dfT = tok.groupBy("term").agg(count(lit(1)).as("df"))
      println("  vocab = " + dfT.count())
      val wdf = tok.join(broadcast(dfT), "term")
      val byDoc = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(col("df").desc, col("term").desc)
      val docAll = org.apache.spark.sql.expressions.Window.partitionBy("id")
      val prefix = wdf
        .withColumn("tail_tf", sum("tf").over(byDoc.rowsBetween(Long.MinValue, 0)))
        .withColumn("tt", sum("tf").over(docAll))
        .where(col("tail_tf").cast("double") >=
          lit(minW / (1 + minW) * (1 - 1e-9)) * col("tt").cast("double"))
        .select("id", "blk", "term", "tt")
      val totalsB = tok.groupBy("id").agg(sum("tf").as("tta"))
      val rawJoin = tok.select(col("blk"), col("term"), col("id").as("ia"))
        .join(totalsB.select(col("id").as("ia"), col("tta")), Seq("ia"))
        .join(prefix.select(col("blk"), col("term"), col("id").as("ib"),
          col("tt").as("ttb")), Seq("blk", "term"))
        .where(col("ia") =!= col("ib") &&
          col("tta").cast("double") >= lit(minW * (1 - 1e-9)) * col("ttb").cast("double") &&
          col("ttb").cast("double") >= lit(minW * (1 - 1e-9)) * col("tta").cast("double"))
      time("raw emission count") { println("  raw rows = " + rawJoin.count()) }
      time("cand (distinct) count") {
        println("  cand rows = " + rawJoin
          .select(least(col("ia"), col("ib")).as("id_a"),
            greatest(col("ia"), col("ib")).as("id_b")).distinct().count())
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

      println(s"== $tag: q305 HASHED + tt-in-tok variant ==")
      val tokH = time("tokH checkpoint") {
        docsDf.select(col("doc_id").as("id"), col("source").as("blk"),
            explode(split(col("text"), " ")).as("term"))
          .where(col("id").isNotNull && col("blk").isNotNull)
          .groupBy("id", "blk", "term").agg(count(lit(1)).as("tf"))
          .select(col("id"), col("blk"), xxhash64(col("term")).as("term"), col("tf"))
          .repartition(para, col("id"))
          .withColumn("tt", sum("tf").over(
            org.apache.spark.sql.expressions.Window.partitionBy("id")))
          .localCheckpoint()
      }
      println("  tokH rows = " + tokH.count())
      val dfTH = tokH.groupBy("term").agg(count(lit(1)).as("df"))
      val byDocH = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(col("df").desc, col("term").desc)
      val prefixH = tokH.join(broadcast(dfTH), "term")
        .withColumn("tail_tf", sum("tf").over(byDocH.rowsBetween(Long.MinValue, 0)))
        .where(col("tail_tf").cast("double") >=
          lit(minW / (1 + minW) * (1 - 1e-9)) * col("tt").cast("double"))
        .select("id", "blk", "term", "tt")
      val rawH = tokH.select(col("blk"), col("term"), col("id").as("ia"), col("tt").as("tta"))
        .join(prefixH.select(col("blk"), col("term"), col("id").as("ib"),
          col("tt").as("ttb")), Seq("blk", "term"))
        .where(col("ia") =!= col("ib") &&
          col("tta").cast("double") >= lit(minW * (1 - 1e-9)) * col("ttb").cast("double") &&
          col("ttb").cast("double") >= lit(minW * (1 - 1e-9)) * col("tta").cast("double"))
      time("rawH emission count") { println("  rawH rows = " + rawH.count()) }
      val candH = rawH.select(least(col("ia"), col("ib")).as("id_a"),
          greatest(col("ia"), col("ib")).as("id_b")).distinct()
      time("candH count") { println("  candH rows = " + candH.count()) }
      val candP = time("candH checkpoint") {
        candH.repartition(para, col("id_a")).localCheckpoint() }
      val docsH = tokH.groupBy("id")
        .agg(array_sort(collect_list(struct(col("term"), col("tf")))).as("ps"),
          first("tt").as("tt"))
        .select(col("id"), expr("transform(ps, p -> p.term)").as("ks"),
          expr("transform(ps, p -> p.tf)").as("vs"), col("tt"))
      val candIds = candP.select(col("id_a").as("id"))
        .union(candP.select(col("id_b"))).distinct()
      val cdocs = time("cdocs checkpoint") {
        docsH.join(candIds, Seq("id"), "left_semi")
          .repartition(para, col("id")).localCheckpoint() }
      time("verifyH") {
        candP
          .join(cdocs.select(col("id").as("id_a"), col("ks").as("ka"),
            col("vs").as("va"), col("tt").as("ta")), Seq("id_a"))
          .join(cdocs.select(col("id").as("id_b"), col("ks").as("kb"),
            col("vs").as("vb"), col("tt").as("tb")), Seq("id_b"))
          .select(col("id_a"), col("id_b"),
            org.apache.spark.sql.graft.SparseExprs.sparseMinSumLong(
              col("ka"), col("va"), col("kb"), col("vb")).as("smin"),
            col("ta"), col("tb"))
          .withColumn("wden", col("ta") + col("tb") - col("smin"))
          .withColumn("__raw", col("smin").cast("double") / col("wden"))
          .where(col("__raw") >= minW)
          .select(col("id_a"), col("id_b"))
          .write.format("noop").mode("overwrite").save()
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    run("cold"); run("warm")
    spark.stop()
  }
}
