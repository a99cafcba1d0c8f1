package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.{Dedup, Staging, Tables}

/** The ingestion trilogy (q353 staged index, q354 append loop, q355
  * incremental clusters) run as an actual STREAMING job — the shape a
  * 100 TB daily-crawl pipeline deploys: a file-source stream delivers
  * each arriving batch as its own micro-batch, and `foreachBatch`
  * dedups the batch against the staged LSH index (zero corpus-side
  * exchange — the q353 property) then APPENDS the survivors'
  * signatures to the index (new bucket files only, never a rebuild),
  * so batch N+1 dedups against corpus ∪ all prior survivors. Per
  * trigger the cost is O(batch) — the stream never rescans the
  * corpus. Results spill to parquet executor-side (the q346
  * convention: a memory sink would collect data-sized output to the
  * driver). */
object IngestStreams {

  private def rm(f: java.io.File): Unit = Staging.deleteRecursively(f)

  /** Spool one parquet FILE per arrival day under
    * `target/ingest_spool_<name>`: the file stream source orders by
    * (modification time, path), so explicit mtimes make the
    * micro-batch order deterministic. Returns the spool dir. */
  private def spoolDays(name: String, days: Seq[DataFrame]): java.io.File = {
    val spool = new java.io.File(s"target/ingest_spool_$name")
    if (spool.exists()) rm(spool)
    spool.mkdirs()
    days.zipWithIndex.foreach { case (d, i0) =>
      val i = i0 + 1
      val tmp = new java.io.File(spool, s"__tmp_$i")
      d.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file for day $i"))
      val target = new java.io.File(spool, f"day_$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, target.toPath)
      target.setLastModified(1000000000000L + i * 60000L)
      rm(tmp)
    }
    spool
  }

  /** Stage docs `< cut0` as the corpus index, spool docs `[cut0, cut1)`
    * and `[cut1, ∞)` as two "daily" arrival files, then run the
    * streaming ingest-dedup loop over them (one micro-batch per day —
    * `maxFilesPerTrigger = 1`, arrival order pinned by explicit file
    * mtimes). Output: each day's survivors tagged by ingest day —
    * exactly the q354 inline two-step semantics, which the oracle
    * replays. */
  def runIngestDedup(spark: SparkSession, dir: String, name: String,
                     cut0: Long = 300, cut1: Long = 450): DataFrame = {
    val docs = Tables.t(spark, dir, "documents")
    val idx = name + "_idx"
    Staging.stageBucketed(
      Dedup.lshIndexFrame(docs.where(col("doc_id") < cut0),
        col("text"), col("doc_id")),
      idx, "lsh_key", 8)
    val spool = spoolDays(name,
      Seq(docs.where(col("doc_id") >= cut0 && col("doc_id") < cut1),
        docs.where(col("doc_id") >= cut1)))
    val outDir = new java.io.File(s"target/ingest_out_$name")
    val ckpt = new java.io.File(s"target/ingest_ckpt_$name")
    Seq(outDir, ckpt).foreach(f => if (f.exists()) rm(f))
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(spool.getPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // resolve the index through the STREAMING session (foreachBatch
        // frames live on a cloned session): the append below invalidates
        // that session's relation cache, so the next micro-batch re-lists
        // the table and sees the new bucket files — loading through the
        // outer session would read a stale file index and silently skip
        // prior survivors
        val ss = batch.sparkSession
        // survivors MUST materialize before the index append below —
        // localCheckpoint is eager, so the anti-join reads the index
        // state as of this batch's start
        val surv = Dedup.minhashAgainstIndex(batch,
          Staging.load(ss, idx), col("text"), col("doc_id"))
          .localCheckpoint()
        Staging.appendBucketed(
          Dedup.lshIndexFrame(surv, col("text"), col("doc_id")),
          idx, "lsh_key", 8)
        surv.select(col("doc_id"), col("source"))
          .withColumn("ingest_day",
            when(col("doc_id") < cut1, 1).otherwise(2))
          .write.mode("append").parquet(outDir.getPath)
        ()
      }
      .option("checkpointLocation", ckpt.getPath)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(outDir.getPath)
      .select("ingest_day", "doc_id", "source")
      .orderBy("ingest_day", "doc_id")
  }

  /** STREAMING dedup-cluster maintenance — q355's incremental CC
    * driven by the stream: each arriving day's micro-batch probes the
    * staged index for cross edges + its own star edges
    * ([[Dedup.batchIngestEdges]], one signature scan), merges them
    * into the running labels via [[Dedup.ccIncremental]] (CC over the
    * batch-sized quotient only), and appends ALL its signatures to the
    * index so later days can connect to it. Per-trigger cost is
    * O(batch); the corpus is never rescanned and the labels are never
    * recomputed. Cluster structure is ORDER-INDEPENDENT (CC over the
    * union of all discovered edges, which equals the full collision
    * graph: every colliding pair meets through the index), so the
    * oracle is simply the full-recompute cluster census — the green
    * row proves streaming-incremental ≡ batch-full end-to-end. */
  def runClusterMaintenance(spark: SparkSession, dir: String, name: String,
                            cut0: Long = 300, cut1: Long = 450): DataFrame = {
    val docs = Tables.t(spark, dir, "documents")
    val idx = name + "_idx"
    Staging.stageBucketed(
      Dedup.lshIndexFrame(docs.where(col("doc_id") < cut0),
        col("text"), col("doc_id")),
      idx, "lsh_key", 8)
    val spool = spoolDays(name,
      Seq(docs.where(col("doc_id") >= cut0 && col("doc_id") < cut1),
        docs.where(col("doc_id") >= cut1)))
    val ckpt = new java.io.File(s"target/ingest_ckpt_$name")
    if (ckpt.exists()) rm(ckpt)
    // running labels, carried across micro-batches on the driver as a
    // localCheckpoint handle; superseded rounds free deterministically
    var state = Dedup.connectedComponents(
      Dedup.minhashStarEdges(docs.where(col("doc_id") < cut0),
        col("text"), col("doc_id")))
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(spool.getPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ss = batch.sparkSession // cloned session: see runIngestDedup
        val edges = Dedup.batchIngestEdges(batch, Staging.load(ss, idx),
          col("text"), col("doc_id"))
        val next = Dedup.ccIncremental(state, edges).localCheckpoint()
        org.apache.spark.sql.graft.CheckpointUtils.unpersistCheckpoint(state)
        state = next
        // ALL batch signatures append (cluster maintenance keeps every
        // doc, unlike the dedup loop's survivors-only append)
        Staging.appendBucketed(
          Dedup.lshIndexFrame(batch, col("text"), col("doc_id")),
          idx, "lsh_key", 8)
        ()
      }
      .option("checkpointLocation", ckpt.getPath)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    state.groupBy(col("comp").as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("id") >= cut0, 1)).as("n_new"),
        max("id").as("max_doc_id"))
      .orderBy("cluster_id")
  }

  /** The ingest END-STATE: split-stable assignment maintained under a
    * STREAM of arriving days. Day 0 assigns cluster-safely; each
    * micro-batch then merges into the cluster structure and assigns
    * splits via [[Dedup.splitStableAssign]] (old docs never move, new
    * docs inherit their merged component's min-old-member split,
    * fresh components hash), with the day's signatures appended so
    * later days connect. The final census reports, per declared
    * split: doc mass and the irreducible legacy conflicts (components
    * whose members span ≥ 2 splits — merges forced them, history
    * can't be reassigned). The oracle replays the SEQUENTIAL chain —
    * three CC stages (corpus, corpus∪day1, all) and both inheritance
    * steps — so the green row proves the day-after-day state
    * composition equals the from-scratch sequential analysis. */
  def runSplitStableIngest(spark: SparkSession, dir: String, name: String,
                           cut0: Long = 300, cut1: Long = 450,
                           salt: String = "sss"): DataFrame = {
    val docs = Tables.t(spark, dir, "documents")
    val idx = name + "_idx"
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val corpus = docs.where(col("doc_id") < cut0)
    Staging.stageBucketed(
      Dedup.lshIndexFrame(corpus, col("text"), col("doc_id")),
      idx, "lsh_key", 8)
    val labels0 = Dedup.connectedComponents(
      Dedup.minhashStarEdges(corpus, col("text"), col("doc_id")))
    var state = corpus.select(col("doc_id").cast("long").as("id"))
      .join(labels0.withColumnRenamed("id", "__lid"),
        col("id") === col("__lid"), "left")
      .select(col("id"),
        graft.Sampling.splitAssign(coalesce(col("comp"), col("id")), fr,
          salt).as("split"),
        col("comp"))
      .localCheckpoint()
    val spool = spoolDays(name,
      Seq(docs.where(col("doc_id") >= cut0 && col("doc_id") < cut1),
        docs.where(col("doc_id") >= cut1)))
    val ckpt = new java.io.File(s"target/ingest_ckpt_$name")
    if (ckpt.exists()) rm(ckpt)
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(spool.getPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ss = batch.sparkSession // cloned session: see runIngestDedup
        val next = Dedup.splitStableAssign(state, Staging.load(ss, idx),
            batch, col("text"), col("doc_id"),
            c => graft.Sampling.splitAssign(c, fr, salt))
          .localCheckpoint()
        org.apache.spark.sql.graft.CheckpointUtils.unpersistCheckpoint(state)
        state = next
        Staging.appendBucketed(
          Dedup.lshIndexFrame(batch, col("text"), col("doc_id")),
          idx, "lsh_key", 8)
        ()
      }
      .option("checkpointLocation", ckpt.getPath)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val fin = state.select(col("split"),
      coalesce(col("comp"), col("id")).as("comp"))
    val nsp = fin.groupBy("comp").agg(countDistinct("split").as("__nsp"))
    val confm = fin.select("comp", "split").distinct()
      .join(nsp.where(col("__nsp") >= 2).select("comp"), Seq("comp"),
        "left_semi")
    val spine = spark.range(1)
      .select(explode(array(Seq("test", "train", "val").map(lit): _*))
        .as("split"))
    spine
      .join(fin.groupBy("split").agg(count(lit(1)).as("__nd")),
        Seq("split"), "left")
      .join(confm.groupBy("split").agg(count(lit(1)).as("__nc")),
        Seq("split"), "left")
      .select(col("split"), coalesce(col("__nd"), lit(0L)).as("n_docs"),
        coalesce(col("__nc"), lit(0L)).as("n_conflict_components"))
      .orderBy("split")
  }
}
