package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r13 optimization scratch probe (dev tool, not a query): time named
  * sub-stages of the expensive queries in isolation (noop sink, min of
  * `reps` warm runs) to attribute their bench seconds to scan / per-row
  * expression / shuffle / sort before changing anything — guide §1
  * "measure first". Stages are added/removed freely during the round;
  * nothing here is part of the driver contract. */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft._

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(mk: => DataFrame): Unit = {
      if (args.nonEmpty && !args.exists(name.startsWith)) return
      // one untimed warm run, then min of reps
      try {
        noop(mk)
        val ts = (1 to reps).map { _ =>
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          val t0 = System.nanoTime(); noop(mk); (System.nanoTime() - t0) / 1e9
        }
        println(f"[opt] $name%-40s min=${ts.min}%7.3f  all=${ts.map(t => f"$t%.3f").mkString(",")}")
      } catch { case e: Throwable =>
        println(s"[opt] $name FAILED: ${e.getMessage}")
      }
    }

    val docs = Tables.t(spark, sfDir, "documents")
    val li = Tables.t(spark, sfDir, "lineitem")

    // ---- q01 decomposition ----
    time("q01_full") {
      SparkEntry.queries("q01_scan_project_rename")(spark, sfDir)
    }
    time("q01_scan_only") { li.select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity") }
    time("q01_project_nosort") {
      li.select(
        col("l_orderkey").as("order_id"), col("l_linenumber").as("line_no"),
        col("l_returnflag").as("flag"),
        expr("try_cast(CAST(CAST(l_quantity AS BIGINT) AS STRING) AS DOUBLE)").as("quantity"),
        expr("try_cast(l_returnflag AS DOUBLE)").as("bad_parse"))
    }
    time("q01_sort_after_project") {
      li.select(
        col("l_orderkey").as("order_id"), col("l_linenumber").as("line_no"),
        col("l_returnflag").as("flag"),
        expr("try_cast(CAST(CAST(l_quantity AS BIGINT) AS STRING) AS DOUBLE)").as("quantity"),
        expr("try_cast(l_returnflag AS DOUBLE)").as("bad_parse"))
        .orderBy("order_id", "line_no")
    }
    time("q01_project_after_sort") {
      li.select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
        .select(
          col("l_orderkey").as("order_id"), col("l_linenumber").as("line_no"),
          col("l_returnflag").as("flag"),
          expr("try_cast(CAST(CAST(l_quantity AS BIGINT) AS STRING) AS DOUBLE)").as("quantity"),
          expr("try_cast(l_returnflag AS DOUBLE)").as("bad_parse"))
    }
    time("q01_repart_project_after_sort") {
      li.select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
        .repartition(cpus.toInt)
        .orderBy("l_orderkey", "l_linenumber")
        .select(
          col("l_orderkey").as("order_id"), col("l_linenumber").as("line_no"),
          col("l_returnflag").as("flag"),
          expr("try_cast(CAST(CAST(l_quantity AS BIGINT) AS STRING) AS DOUBLE)").as("quantity"),
          expr("try_cast(l_returnflag AS DOUBLE)").as("bad_parse"))
    }

    // ---- documents per-row expression cost: single-task vs fanned ----
    time("docs_scan") { docs.select("doc_id", "text") }
    time("docs_minhash_1task") {
      docs.select(col("doc_id"),
        org.apache.spark.sql.graft.MinhashExprs.signature(col("text"), 3, 16).as("sig"))
    }
    time("docs_minhash_fanned") {
      docs.repartition(cpus.toInt).select(col("doc_id"),
        org.apache.spark.sql.graft.MinhashExprs.signature(col("text"), 3, 16).as("sig"))
    }
    time("docs_gates_1task") {
      docs.where(TextAnalysis.langId(col("text")) === lit("en") &&
        round(TextAnalysis.qualityScore(col("text")), 4) >= 0.5)
    }
    time("docs_gates_fanned") {
      docs.repartition(cpus.toInt)
        .where(TextAnalysis.langId(col("text")) === lit("en") &&
          round(TextAnalysis.qualityScore(col("text")), 4) >= 0.5)
    }

    // ---- flagship ----
    time("q49_full") { SparkEntry.queries("q49_training_prep")(spark, sfDir) }
    time("q351_full") { SparkEntry.queries("q351_training_prep_v3")(spark, sfDir) }

    // ---- tokenize fan-out (single-task scan -> explode -> partial agg) ----
    def fan(df: DataFrame): DataFrame =
      if (df.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
        df.repartition(spark.sparkContext.defaultParallelism) else df
    time("tok_1task") {
      docs.select(col("doc_id").as("id"), col("source").as("blk"),
          explode(split(col("text"), " ")).as("term0"))
        .groupBy("id", "blk", "term0").agg(count(lit(1)).as("tf"))
    }
    time("tok_fanned") {
      fan(docs).select(col("doc_id").as("id"), col("source").as("blk"),
          explode(split(col("text"), " ")).as("term0"))
        .groupBy("id", "blk", "term0").agg(count(lit(1)).as("tf"))
    }
    time("q305_full") { SparkEntry.queries("q305_weighted_jaccard_banded")(spark, sfDir) }
    time("q331_full") { SparkEntry.queries("q331_tfidf_cosine_banded")(spark, sfDir) }
    time("q326_full") { SparkEntry.queries("q326_ngram_containment_banded")(spark, sfDir) }
    time("q174_full") { SparkEntry.queries("q174_xsplit_contamination")(spark, sfDir) }
    time("q284_full") { SparkEntry.queries("q284_dag_layers")(spark, sfDir) }
    time("q140_full") { SparkEntry.queries("q140_pagerank")(spark, sfDir) }
    time("q346_full") { SparkEntry.queries("q346_stream_outer_join")(spark, sfDir) }
    time("q78_full") { SparkEntry.queries("q78_stream_conversion_join")(spark, sfDir) }

    // ---- q49 decomposition ----
    time("q49_gates_exact") {
      Dedup.exact(docs.where(TextAnalysis.langId(col("text")) === lit("en") &&
        round(TextAnalysis.qualityScore(col("text")), 4) >= 0.5),
        col("text"), col("doc_id"))
    }
    time("q49_stars") {
      val filtered = docs.where(TextAnalysis.langId(col("text")) === lit("en") &&
        round(TextAnalysis.qualityScore(col("text")), 4) >= 0.5)
      val deduped = Dedup.exact(filtered, col("text"), col("doc_id")).localCheckpoint()
      Dedup.minhashStarEdges(deduped, col("text"), col("doc_id"), 3, 16, 4)
    }
    time("q49_cc") {
      val filtered = docs.where(TextAnalysis.langId(col("text")) === lit("en") &&
        round(TextAnalysis.qualityScore(col("text")), 4) >= 0.5)
      val deduped = Dedup.exact(filtered, col("text"), col("doc_id")).localCheckpoint()
      val stars = Dedup.minhashStarEdges(deduped, col("text"), col("doc_id"), 3, 16, 4)
      Dedup.connectedComponents(stars)
    }

    // ---- r14: q379 decon-prep decomposition ----
    if (args.isEmpty || args.exists("q379".startsWith)) {
      val day1 = docs.where(col("doc_id") >= 300 && col("doc_id") < 450)
      val bg = Decontaminate.benchGramSet(
        docs.where(col("doc_id") % 25 === 0), col("text"), n = 5)
        .localCheckpoint()
      def gated(df: DataFrame) =
        df.where(TextAnalysis.langId(col("text")) === lit("en") &&
          round(TextAnalysis.qualityScore(col("text")), 4) >= 0.5)
      time("q379_benchgrams") {
        Decontaminate.benchGramSet(
          docs.where(col("doc_id") % 25 === 0), col("text"), n = 5)
      }
      time("q379_gates_day1") { gated(day1) }
      time("q379_decon_day1") {
        Decontaminate.decontaminateAgainst(gated(day1), col("text"),
          col("doc_id"), bg, n = 5)
      }
      time("q379_prep_day1") {
        Dedup.exact(Decontaminate.decontaminateAgainst(gated(day1),
          col("text"), col("doc_id"), bg, n = 5), col("text"), col("doc_id"))
      }
      time("q379_full") { SparkEntry.queries("q379_stream_ingest_decon")(spark, sfDir) }
      time("q374_full") { SparkEntry.queries("q374_stream_autofold_patchlog")(spark, sfDir) }
      time("q368_full") { SparkEntry.queries("q368_stream_cluster_patchlog")(spark, sfDir) }
      time("q369_full") { SparkEntry.queries("q369_stream_split_patchlog")(spark, sfDir) }
      time("q364_full") { SparkEntry.queries("q364_stream_cluster_maintenance")(spark, sfDir) }
      time("q365_full") { SparkEntry.queries("q365_stream_split_stable")(spark, sfDir) }
    }

    // ---- r14: append decomposition ----
    if (args.exists("append".startsWith)) {
      def phase[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[opt] append_phase $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.3f")
        r
      }
      val day1 = docs.where(col("doc_id") >= 300 && col("doc_id") < 450)
      val frame = Dedup.lshIndexFrame(day1, col("text"), col("doc_id"))
        .localCheckpoint()
      phase("init") {
        VStage.init(Dedup.lshIndexFrame(docs.where(col("doc_id") < 300),
          col("text"), col("doc_id")), "graft_opt_probe_app", "lsh_key", 8)
      }
      (1 to 4).foreach { i =>
        phase(s"append_$i") {
          VStage.append(frame, "graft_opt_probe_app", "lsh_key", 8)
        }
      }
      (1 to 3).foreach { i =>
        phase(s"plain_parquet_$i") {
          frame.write.mode("overwrite").parquet(s"target/opt_probe_plain_$i")
        }
      }
      (1 to 3).foreach { i =>
        phase(s"load_count_$i") {
          VStage.load(spark, "graft_opt_probe_app").count()
        }
      }
    }

    // ---- r14: retrieval-stack staging fixed costs ----
    if (args.isEmpty || args.exists("stage".startsWith)) {
      def phase[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[opt] stage_phase $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.3f")
        r
      }
      val postings = graft.Curate.tokenPostings(docs, col("doc_id"), col("text"))
      phase("stage_postings_1") {
        Staging.stageBucketed(postings, "graft_opt_probe_post", "term", 8)
      }
      phase("stage_postings_2") {
        Staging.stageBucketed(postings, "graft_opt_probe_post", "term", 8)
      }
      println(s"[opt] staged file count = " +
        new java.io.File(new java.net.URI(
          spark.conf.get("spark.sql.warehouse.dir")).getPath,
          "graft_opt_probe_post").listFiles().count(_.getName.endsWith(".parquet")))
      time("q385_full") { SparkEntry.queries("q385_lexical_index_staged")(spark, sfDir) }
      time("q380_full") { SparkEntry.queries("q380_hybrid_retrieval_ivf")(spark, sfDir) }
    }

    // ---- streaming loop decomposition (q368 shape: runClusterPatchLog) ----
    if (args.isEmpty || args.exists("stream".startsWith)) {
      import graft.streaming.{DurableState, IngestStreams}
      val d = docs
      val corpus = d.where(col("doc_id") < 300)
      val days = Seq(d.where(col("doc_id") >= 300 && col("doc_id") < 450),
        d.where(col("doc_id") >= 450))
      def phase[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[opt] stream_phase $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.3f")
        r
      }
      // piecewise costs of the loop's fixed overheads
      phase("vstage_init") {
        VStage.init(Dedup.lshIndexFrame(corpus, col("text"), col("doc_id")),
          "graft_opt_probe_idx", "lsh_key", 8)
      }
      val scope0 = CkptScope()
      val labels0 = phase("bootstrap_cc") {
        Dedup.connectedComponents(
          Dedup.starEdgesFromIndex(VStage.load(spark, "graft_opt_probe_idx")),
          scope = scope0)
      }
      phase("bootstrap_commit") {
        DurableState.commit(labels0, "target/opt_probe_state_base", -1L)
      }
      scope0.freeAll()
      // body-piece costs against the staged probe index
      val day1 = days.head
      phase("body_append") {
        VStage.append(Dedup.lshIndexFrame(day1, col("text"), col("doc_id")),
          "graft_opt_probe_idx", "lsh_key", 8)
      }
      phase("body_append2") {
        VStage.append(Dedup.lshIndexFrame(day1, col("text"), col("doc_id")),
          "graft_opt_probe_idx", "lsh_key", 8)
      }
      val scope1 = CkptScope()
      val edges = phase("body_edges") {
        val e = Dedup.batchIngestEdges(day1,
          Dedup.indexWithoutIds(VStage.load(spark, "graft_opt_probe_idx"),
            day1.select(col("doc_id").as("id"))),
          col("text"), col("doc_id"), scope = scope1)
        noop(e); e
      }
      val lab = DurableState.load(spark, "target/opt_probe_state_base")
      phase("body_ccIncPatch") {
        val (p, f) = Dedup.ccIncrementalPatch(lab, edges, scope = scope1)
        noop(p); noop(f)
      }
      phase("body_label_append_write") {
        val (_, f) = Dedup.ccIncrementalPatch(lab, edges, scope = scope1)
        f.write.mode("overwrite").parquet("target/opt_probe_labels/ingest_batch=0")
      }
      phase("body_patch_commit") {
        val (p, _) = Dedup.ccIncrementalPatch(lab, edges, scope = scope1)
        DurableState.commit(p, "target/opt_probe_state_patch", 0L)
      }
      scope1.freeAll()
      // end-to-end loop with per-body seconds + job census
      val nJobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val jobNanos = new java.util.concurrent.atomic.AtomicLong(0L)
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          nJobs.incrementAndGet(); starts.put(j.jobId, System.nanoTime()); ()
        }
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = starts.remove(j.jobId)
          if (s != null) { jobNanos.addAndGet(System.nanoTime() - s); () }
        }
      })
      (1 to 2).foreach { rep =>
        val bs = scala.collection.mutable.Buffer[Double]()
        nJobs.set(0); jobNanos.set(0L)
        val t0 = System.nanoTime()
        IngestStreams.clusterLoopDeferred(spark, corpus, days,
          s"graft_opt_probe_loop$rep", killBetweenDays = false,
          batchSeconds = Some(bs))
        val tot = (System.nanoTime() - t0) / 1e9
        println(f"[opt] stream_loop_total rep$rep  $tot%7.3f  bodies=${bs.map(t => f"$t%.3f").mkString(",")} residual=${tot - bs.sum}%7.3f jobs=${nJobs.get()} jobWall=${jobNanos.get() / 1e9}%7.3f")
      }
    }

    spark.stop()
  }
}
