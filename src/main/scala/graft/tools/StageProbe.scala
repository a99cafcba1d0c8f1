package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Dedup

/** Dev probe: stage-level wall-clock breakdown of the two banded dedup
  * scale twins (q305 / q326), to target constant-factor trims at the
  * actual hot stage instead of guessing. Not part of the bench or the
  * correctness gate. Run twice internally, second pass reported (warm
  * codegen/JIT, the Bench convention). */
object StageProbe {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[stage] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
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

    def pass(label: String): Unit = {
      println(s"== $label ==")
      // q305 full
      time("q305 full") {
        Dedup.weightedJaccardPairsBanded(docsDf, col("text"), col("doc_id"),
          col("source"), minW = 0.6)
          .write.format("noop").mode("overwrite").save()
      }
      // q326 full
      time("q326 full") {
        Dedup.ngramContainmentPairsBanded(docsDf, col("text"), col("doc_id"),
          col("source"), n = 1, minC = 0.9)
          .write.format("noop").mode("overwrite").save()
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    pass("cold")
    pass("warm")

    // stage splits, warm
    val para = 32
    println("== q305 stages (warm) ==")
    val tok = time("tok checkpoint") {
      docsDf.select(col("doc_id").as("id"), col("source").as("blk"),
          explode(split(col("text"), " ")).as("term"))
        .where(col("id").isNotNull && col("blk").isNotNull)
        .groupBy("id", "blk", "term").agg(count(lit(1)).as("tf"))
        .repartition(para, col("id"))
        .localCheckpoint()
    }
    val minW = 0.6
    val dfT = tok.groupBy("term").agg(count(lit(1)).as("df"))
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
    time("prefix count") { println("  prefix rows = " + prefix.count()) }
    val totalsB = tok.groupBy("id").agg(sum("tf").as("tta"))
    val cand = tok.select(col("blk"), col("term"), col("id").as("ia"))
      .join(totalsB.select(col("id").as("ia"), col("tta")), Seq("ia"))
      .join(prefix.select(col("blk"), col("term"), col("id").as("ib"),
        col("tt").as("ttb")), Seq("blk", "term"))
      .where(col("ia") =!= col("ib") &&
        col("tta").cast("double") >= lit(minW * (1 - 1e-9)) * col("ttb").cast("double") &&
        col("ttb").cast("double") >= lit(minW * (1 - 1e-9)) * col("tta").cast("double"))
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"))
      .distinct()
    time("cand count") { println("  cand rows = " + cand.count()) }
    val docs = time("docs checkpoint") {
      tok.groupBy("id")
        .agg(array_sort(collect_list(struct(col("term"), col("tf")))).as("ps"),
          sum("tf").as("tt"))
        .select(col("id"), expr("transform(ps, p -> p.term)").as("ks"),
          expr("transform(ps, p -> p.tf)").as("vs"), col("tt"))
        .repartition(para, col("id"))
        .localCheckpoint()
    }
    time("verify from checkpoints") {
      val candIds = cand.select(col("id_a").as("id"))
        .union(cand.select(col("id_b").as("id"))).distinct()
      val cdocs = docs.join(candIds, Seq("id"), "left_semi")
      val mins = cand
        .join(cdocs.select(col("id").as("id_a"), col("ks").as("ka"),
          col("vs").as("va")), Seq("id_a"))
        .join(cdocs.select(col("id").as("id_b"), col("ks").as("kb"),
          col("vs").as("vb")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          org.apache.spark.sql.graft.SparseExprs.sparseMinSum(
            col("ka"), col("va"), col("kb"), col("vb")).as("smin"))
      val totals = docs.select(col("id"), col("tt"))
      mins
        .join(totals.select(col("id").as("id_a"), col("tt").as("ta")), "id_a")
        .join(totals.select(col("id").as("id_b"), col("tt").as("tb")), "id_b")
        .withColumn("wden", col("ta") + col("tb") - col("smin"))
        .withColumn("__raw", col("smin").cast("double") / col("wden"))
        .where(col("__raw") >= minW)
        .select(col("id_a"), col("id_b"))
        .write.format("noop").mode("overwrite").save()
    }

    println("== q326 stages (warm) ==")
    val minC = 0.9
    val t = time("t checkpoint") {
      docsDf.select(col("doc_id").as("id"), col("source").as("blk"),
          array_distinct(split(col("text"), " ")).as("g0"))
        .where(col("id").isNotNull && col("blk").isNotNull)
        .select(col("id"), col("blk"),
          array_distinct(transform(col("g0"), g => xxhash64(g))).as("g"),
          size(col("g0")).cast("long").as("sz"))
        .repartition(para, col("id"))
        .localCheckpoint()
    }
    val tok2 = t.select(col("id"), col("blk"), col("sz"),
      explode(col("g")).as("tm"))
    val dfT2 = tok2.groupBy("tm").agg(count(lit(1)).as("df"))
    val prefix2 = tok2.join(broadcast(dfT2), "tm")
      .groupBy("blk", "id", "sz")
      .agg(collect_list(struct(col("df"), col("tm"))).as("ps"))
      .select(col("blk"), col("id").as("ib"), col("sz").as("szb"),
        explode(expr("slice(array_sort(ps), 1, CAST(sz - ceil(sz * " +
          (minC * (1 - 1e-9)) + ") + 1 AS INT))")).as("p"))
      .select(col("blk"), col("p.tm").as("tm"), col("ib"), col("szb"))
    time("prefix2 count") { println("  prefix2 rows = " + prefix2.count()) }
    val cand2 = tok2
      .select(col("blk"), col("tm"), col("id").as("ia"), col("sz").as("sza"))
      .join(prefix2, Seq("blk", "tm"))
      .where(col("ia") =!= col("ib") && col("szb") <= col("sza"))
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"))
      .distinct()
    time("cand2 count") { println("  cand2 rows = " + cand2.count()) }
    time("verify2 from checkpoints") {
      val candIds = cand2.select(col("id_a").as("id"))
        .union(cand2.select(col("id_b"))).distinct()
      val cdocs = t.join(candIds, Seq("id"), "left_semi")
      cand2
        .join(cdocs.select(col("id").as("id_a"), col("g").as("ga"),
          col("sz").as("n_a")), Seq("id_a"))
        .join(cdocs.select(col("id").as("id_b"), col("g").as("gb"),
          col("sz").as("n_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"),
          size(array_intersect(col("ga"), col("gb"))).cast("long").as("__i"))
        .withColumn("__mn", least(col("n_a"), col("n_b")))
        .withColumn("__raw", col("__i").cast("double") / col("__mn"))
        .where(col("__raw") >= minC)
        .select(col("id_a"), col("id_b"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
