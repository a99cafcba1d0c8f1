package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf0.1 → "sf1" scale probe (dev tool, not a query): measures how the
  * suite's most expensive queries behave under a 10× data scale-up, to
  * convert plan-reading "sound at scale" claims into measurements
  * (VERDICT r8 directive 9).
  *
  * The synthetic sf1 is 10 key-remapped copies of the sf0.1 fixtures
  * written under target/sf1 (the driver owns /root/testdata, so the
  * probe never writes there): every per-copy key shifts by i·10¹⁰ so
  * joins stay consistent and key cardinalities scale ×10, while the
  * fixed-cardinality dimensions (nation, region) keep ONE copy — the
  * TPC-H scaling law. Document text is salted with a per-copy prefix
  * token so copies are near- but not exact-duplicates: the dedup
  * families see a 10× corpus whose clone groups add C(10,2) true
  * near-dup pairs per original doc — a dup-rich regime that stresses
  * the candidate generation exactly where a bigger crawl would.
  * Timestamps keep their span (10× event density), so streaming state
  * bounds and watermarks are unchanged.
  *
  * Numbers land in PLANS.md §sf1-probe. Linear-ish scaling (≤ ~10×
  * wall on 10× rows for the corpus-bound queries, ≪ 10× for the
  * fixed-iteration graph/stream queries whose cost is job overhead) is
  * the pass criterion; anything superlinear gets a plan audit.
  */
object ScaleProbe {
  private val Off = 10000000000L

  private def gen(spark: SparkSession, src: String, dst: String,
                  copies: Int): Unit = {
    def shifted(table: String, keys: Seq[String],
                salt: Option[String] = None,
                perturb: Option[String] = None): DataFrame = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      (0 until copies).map { i =>
        val off = i.toLong * Off
        val keyed = keys.foldLeft(base)((d, k) =>
          d.withColumn(k, col(k) + lit(off)))
        val salted = salt match {
          case Some(c) if i > 0 =>
            keyed.withColumn(c, concat(lit(s"zq$i "), col(c)))
          case _ => keyed
        }
        perturb match {
          // deterministic hash-seeded jitter per (clone, vector, dim):
          // the embedding analog of the text-prefix salt — clones stay
          // NEAR the original (ANN cell structure survives) but stop
          // being verbatim, so sf1 recall curves measure something
          // (verbatim clones tie every top-k with the original and the
          // fixed-seed recall reads 1.0 at every nProbe — r11 directive)
          case Some(c) if i > 0 =>
            salted.withColumn(c, transform(col(c), (x, j) =>
              (x + lit(0.05f) *
                ((pmod(hash(keys.map(col): _*).cast("long") * lit(31L) +
                  j.cast("long") * lit(7L) + lit(i * 13L), lit(1000L))
                  .cast("float") / lit(1000f))
                  - lit(0.5f))).cast("float")))
          case _ => salted
        }
      }.reduce(_ unionByName _)
    }
    val plans: Seq[(String, DataFrame)] = Seq(
      "region" -> spark.read.parquet(s"$src/region.parquet"),
      "nation" -> spark.read.parquet(s"$src/nation.parquet"),
      "customer" -> shifted("customer", Seq("c_custkey")),
      "supplier" -> shifted("supplier", Seq("s_suppkey")),
      "part" -> shifted("part", Seq("p_partkey")),
      "orders" -> shifted("orders", Seq("o_orderkey", "o_custkey")),
      "lineitem" -> shifted("lineitem",
        Seq("l_orderkey", "l_partkey", "l_suppkey")),
      "events" -> shifted("events", Seq("event_id", "user_id")),
      "documents" -> shifted("documents", Seq("doc_id"), salt = Some("text")),
      "embeddings" -> shifted("embeddings", Seq("vec_id"),
        perturb = Some("embedding")))
    plans.foreach { case (t, df) =>
      // mirror the fixture layout exactly: one flat FILE per table
      // (the streaming sources glob-filter on the file name
      // "events.parquet", which a directory layout would never match)
      val tmp = s"$dst/__tmp_$t"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file for $t"))
      val target = new java.io.File(s"$dst/$t.parquet")
      if (target.exists()) target.delete()
      java.nio.file.Files.move(part.toPath, target.toPath)
      def rm(p: java.io.File): Unit = {
        if (p.isDirectory) p.listFiles().foreach(rm)
        p.delete(); ()
      }
      rm(new java.io.File(tmp))
    }
  }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dst = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "target/sf1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!new java.io.File(s"$dst/embeddings.parquet").isFile) {
      System.err.println(s"[probe] generating $dst (${copies}x $src)")
      gen(spark, src, dst, copies)
    }
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q284_dag_layers", "q174_xsplit_contamination",
      "q305_weighted_jaccard_banded", "q140_pagerank",
      "q78_stream_conversion_join", "q61_dedup_ngram_prefix",
      "q49_training_prep", "q217_interval_overlap",
      "q221_poisson_bootstrap", "q178_kcore")
    def dropLeftoverBlocks(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    def time(name: String, dir: String): Double = {
      System.gc()
      val t0 = System.nanoTime()
      // q78's memory sink collects the (density-quadratic) pair output
      // to the driver -- overflows maxResultSize at sf1. Probe it via
      // the parquet spill sink (same result set, executor-side writes).
      if (name == "q78_stream_conversion_join")
        graft.EventStreams.runConversionJoin(spark, dir,
            name = s"probe_conv_${dir.hashCode.abs}", sink = "parquet")
          .write.format("noop").mode("overwrite").save()
      else if (name == "q346_stream_outer_join")
        graft.EventStreams.runConversionJoinOuter(spark, dir,
            name = s"probe_convo_${dir.hashCode.abs}", sink = "parquet")
          .write.format("noop").mode("overwrite").save()
      else SparkEntryAccess.run(name)(spark, dir)
      val dt = (System.nanoTime() - t0) / 1e9
      dropLeftoverBlocks()
      dt
    }
    // warmup (codegen/JIT) on the small side, then two timed passes per
    // dir with min — the Bench convention
    names.foreach { n =>
      try time(n, src) catch { case e: Throwable =>
        System.err.println(s"[probe] warmup $n failed: $e") }
    }
    println(f"${"query"}%-30s ${"sf0.1"}%8s ${"sf1"}%8s ${"ratio"}%6s")
    names.foreach { n =>
      try {
        val a = math.min(time(n, src), time(n, src))
        val b = math.min(time(n, dst), time(n, dst))
        println(f"$n%-30s $a%8.2f $b%8.2f ${b / a}%6.2f")
      } catch { case e: Throwable =>
        println(s"$n FAILED: $e")
      }
    }
    spark.stop()
  }
}

/** Indirection so the probe fails loudly on an unknown query name. */
private object SparkEntryAccess {
  def run(name: String): (SparkSession, String) => Unit = { (s, dir) =>
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))
    fn(s, dir).write.format("noop").mode("overwrite").save()
  }
}
