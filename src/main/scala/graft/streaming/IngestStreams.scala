package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import graft.{CkptScope, Dedup, Staging, Tables, VStage}

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
  * driver).
  *
  * DEPLOYMENT SEMANTICS (r12): every loop here survives a driver
  * restart and a micro-batch retry —
  *
  *  - Cross-batch state (q364's running labels, q365's split
  *    assignment) lives in a [[DurableState]] parquet dir maintained
  *    by the q327 crash-safe three-step rename swap, NOT in a
  *    driver-held var: each micro-batch reads the state fresh from
  *    disk and swaps the successor in, so a restarted driver resumes
  *    from the last committed state, keyed to the streaming
  *    checkpoint's batch numbering (kill-and-resume ≡ uninterrupted
  *    is pinned in the unit suite for both the order-independent and
  *    order-dependent loops).
  *  - Micro-batch RETRIES are exactly-once: stateful loops gate on
  *    the [[DurableState]] commit marker (`batchId ≤ committed` →
  *    skip); the dedup loop needs no marker — its output writes
  *    idempotently to a per-batch directory and its index probe
  *    excludes the batch's own ids ([[Dedup.indexWithoutIds]]), so a
  *    replay reads the same pre-batch index state even when the
  *    crashed attempt's append survived.
  *  - Index appends are NOT rolled back on retry. Every LSH loop
  *    (dedup AND the stateful cluster/split loops) probes the index
  *    through [[Dedup.indexWithoutIds]] so a replay reads exactly the
  *    pre-batch index state. The exclusion is NOT optional for the
  *    stateful loops: duplicate signature rows are inert for collision
  *    EXISTENCE (dedup), but a replayed batch's own rows in the index
  *    can win the cross-edge representative min(corpus_id) whenever
  *    batch ids undercut corpus ids (modular-cut drives), silently
  *    dropping the corpus-connecting edge (pinned). For the ANN loop
  *    (q372) duplicates are NOT inert for top-k serving, so serving
  *    collapses duplicate candidates (`dedupCandidates`) and the
  *    recluster compaction ([[graft.Similarity.ivfRecluster]])
  *    physically drops them (both pinned).
  *
  * Per-batch checkpoint blocks are freed via a [[CkptScope]] once the
  * batch's durable output is committed — a long-running stream holds
  * O(1) checkpoint state, not O(days). */
object IngestStreams {

  private def rm(f: java.io.File): Unit = Staging.deleteRecursively(f)

  /** Spool ONE parquet file as arrival day `i` under `spool`: the file
    * stream source orders by (modification time, path), so explicit
    * mtimes make the micro-batch order deterministic. Incremental —
    * later days can be spooled after earlier ones were processed (the
    * kill-and-resume path). */
  private def spoolDay(spool: java.io.File, i: Int, d: DataFrame): Unit = {
    spool.mkdirs()
    val tmp = new java.io.File(spool, s"__tmp_$i")
    d.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file for day $i"))
    val target = new java.io.File(spool, f"day_$i%03d.parquet")
    java.nio.file.Files.move(part.toPath, target.toPath)
    target.setLastModified(1000000000000L + i * 60000L)
    rm(tmp)
  }

  /** One bounded streaming run over the spool: processes every
    * not-yet-committed file (one micro-batch each, unless
    * `maxFilesPerTrigger` is None — the coarser-batching pin), then
    * terminates. Each call constructs a FRESH query from the same
    * checkpoint — so two calls with a day spooled in between ARE a
    * driver restart: nothing carries over but the checkpoint and the
    * durable state. */
  private def runAvailable(spark: SparkSession, schema: StructType,
                           spool: java.io.File, ckpt: java.io.File,
                           body: (DataFrame, Long) => Unit,
                           maxFilesPerTrigger: Option[Int] = Some(1))
      : Unit = {
    val src = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n =>
      src.option("maxFilesPerTrigger", n.toString))
    val q = src.parquet(spool.getPath)
      .writeStream
      .foreachBatch(body)
      .option("checkpointLocation", ckpt.getPath)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Spool + process the arrival days. `killBetweenDays = false` spools
    * everything and runs ONE streaming query (the production shape);
    * `true` restarts the stream from its checkpoint after every day —
    * the recovery drill the durability pins compare against the
    * uninterrupted run. The soak drill's finer controls:
    * `killAfterDays` restarts the stream after the NAMED days only
    * (kills at chosen points, ignored when `killBetweenDays` already
    * restarts everywhere); `afterSegment(lastDay)` runs between stream
    * incarnations (the mid-run index-compaction hook — compaction
    * between segments is exactly where a production job schedules it);
    * `maxFilesPerTrigger = None` lets one micro-batch carry several
    * spooled days (the q364 coarser-batching pin — the order-dependent
    * loops ASSERT one file per trigger instead, see
    * [[assertSingleFile]]). */
  private[graft] def driveDays(spark: SparkSession, schema: StructType,
                        spool: java.io.File, ckpt: java.io.File,
                        days: Seq[DataFrame], killBetweenDays: Boolean,
                        body: (DataFrame, Long) => Unit,
                        killAfterDays: Set[Int] = Set.empty,
                        afterSegment: Int => Unit = _ => (),
                        maxFilesPerTrigger: Option[Int] = Some(1)): Unit = {
    val kills =
      if (killBetweenDays) days.indices.map(_ + 1).toSet else killAfterDays
    days.zipWithIndex.foreach { case (d, i0) =>
      val i = i0 + 1
      spoolDay(spool, i, d)
      if (kills(i) || i == days.size) {
        runAvailable(spark, schema, spool, ckpt, body, maxFilesPerTrigger)
        afterSegment(i)
      }
    }
  }

  /** The one-day-per-trigger CONTRACT assertion for the ORDER-DEPENDENT
    * loops (q365/q369): their oracles replay a per-DAY sequential
    * chain, so a micro-batch that carried two spooled days would apply
    * a COARSER state transition than the oracle models (day 2 would
    * merge before day 1's assignment was inherited from). The file
    * source is configured with maxFilesPerTrigger=1, but a contract
    * this load-bearing is asserted, not assumed — one distinct-count
    * over the batch-bounded frame per trigger. The order-INDEPENDENT
    * loops (q358/q364/q368 — CC over the union of all discovered
    * edges) need no such contract: the multi-day-batch pin in the unit
    * suite proves their census is unchanged under coarser batching. */
  private def assertSingleFile(batch: DataFrame): Unit = {
    // Dataset.inputFiles reads the micro-batch scan's file index on the
    // driver — no Spark job (r14, guide §1.2: the distinct-count spelling
    // scanned the whole batch once per trigger). Fall back to the scan
    // only when the plan exposes no file-source leaf.
    val files = batch.inputFiles
    val n: Long =
      if (files.nonEmpty) files.distinct.length.toLong
      else batch.select(input_file_name()).distinct().count()
    require(n <= 1,
      s"order-dependent ingest loop requires one spooled day per " +
        s"micro-batch, got $n files — the per-day sequential semantics " +
        "would be coarsened")
  }

  private def freshPaths(name: String): (java.io.File, java.io.File) = {
    val spool = new java.io.File(s"target/ingest_spool_$name")
    val ckpt = new java.io.File(s"target/ingest_ckpt_$name")
    Seq(spool, ckpt).foreach(f => if (f.exists()) rm(f))
    (spool, ckpt)
  }

  /** The dedup-ingest loop core shared by [[runIngestDedup]] (q358,
    * `prep` = identity) and [[runIngestPrep]] (q370, `prep` = gates +
    * within-batch exact dedup): stage the PREPPED docs `< cut0` as the
    * corpus index, spool docs `[cut0, cut1)` and `[cut1, ∞)` as two
    * "daily" arrival files, then per micro-batch prep the batch, drop
    * its near-dups against the index, append the survivors'
    * signatures, and write the survivors to a per-batch output
    * directory. Retry-idempotent without a commit marker: the
    * per-batch output overwrites (a replay never doubles) and the
    * probe excludes the batch's own ids ([[Dedup.indexWithoutIds]]),
    * so a replay after a surviving append still reads the pre-batch
    * index state. */
  private[graft] def dedupLoop(spark: SparkSession, corpus: DataFrame,
      days: Seq[DataFrame], name: String, killBetweenDays: Boolean,
      prep: DataFrame => DataFrame,
      batchSeconds: Option[scala.collection.mutable.Buffer[Double]] = None,
      survRows: Option[scala.collection.mutable.Buffer[Long]] = None,
      compactAfterDay: Option[Int] = None)
      : DataFrame = {
    val idx = name + "_idx"
    VStage.init(
      Dedup.lshIndexFrame(prep(corpus), col("text"), col("doc_id")),
      idx, "lsh_key", 8)
    val (spool, ckpt) = freshPaths(name)
    val outDir = new java.io.File(s"target/ingest_out_$name")
    if (outDir.exists()) rm(outDir)
    val body = (batch: DataFrame, batchId: Long) => {
      // resolve the index through the STREAMING session (foreachBatch
      // frames live on a cloned session): the append below invalidates
      // that session's relation cache, so the next micro-batch re-lists
      // the table and sees the new bucket files — loading through the
      // outer session would read a stale file index and silently skip
      // prior survivors
      val ss = batch.sparkSession
      val t0 = System.nanoTime()
      val scope = CkptScope()
      try {
        val kept = prep(batch)
        val idxSnap = Dedup.indexWithoutIds(VStage.load(ss, idx),
          batch.select(col("doc_id").as("id")))
        // survivors MUST materialize before the index append below —
        // the checkpoint is eager, so the anti-join reads the index
        // state as of this batch's start
        val surv = scope.ckpt(Dedup.minhashAgainstIndex(kept, idxSnap,
          col("text"), col("doc_id")))
        VStage.append(
          Dedup.lshIndexFrame(surv, col("text"), col("doc_id")),
          idx, "lsh_key", 8)
        surv.select(col("doc_id"), col("source"))
          // the arrival-day tag IS the micro-batch ordinal (one spooled
          // day per trigger; ids continue across restarts via the
          // checkpoint, so kill-and-resume tags identically)
          .withColumn("ingest_day", lit((batchId + 1).toInt))
          .write.mode("overwrite")
          .parquet(new java.io.File(outDir, s"ingest_batch=$batchId").getPath)
        survRows.foreach(_ += surv.count())
      } finally scope.freeAll()
      batchSeconds.foreach(_ += (System.nanoTime() - t0) / 1e9)
      ()
    }
    driveDays(spark, days.head.schema, spool, ckpt, days,
      killBetweenDays, body,
      // the LSH index compaction runs BETWEEN stream segments: one
      // generation-swap re-stage (dedup rows, one file per bucket) —
      // content-preserving, so the survivor semantics are unchanged
      // (q377 oracle-gates exactly that under live ingest)
      killAfterDays = compactAfterDay.toSet,
      afterSegment = day =>
        if (compactAfterDay.contains(day))
          VStage.compact(spark, idx, "lsh_key", 8,
            df => df.dropDuplicates("lsh_key", "corpus_id")
              .repartition(8, col("lsh_key"))))
    // partition discovery re-adds ingest_batch; the select drops it
    spark.read.parquet(outDir.getPath)
      .select("ingest_day", "doc_id", "source")
      .orderBy("ingest_day", "doc_id")
  }

  private def ingestDedupLoop(spark: SparkSession, dir: String,
      name: String, cut0: Long, cut1: Long, killBetweenDays: Boolean,
      prep: DataFrame => DataFrame,
      compactAfterDay: Option[Int] = None): DataFrame = {
    val docs = Tables.t(spark, dir, "documents")
    dedupLoop(spark, docs.where(col("doc_id") < cut0),
      Seq(docs.where(col("doc_id") >= cut0 && col("doc_id") < cut1),
        docs.where(col("doc_id") >= cut1)), name, killBetweenDays, prep,
      compactAfterDay = compactAfterDay)
  }

  /** The streaming ingest-dedup loop (q358): each day\u0027s survivors
    * tagged by ingest day — exactly the q354 inline two-step
    * semantics, which the oracle replays. See [[ingestDedupLoop]] for
    * the retry-idempotency contract. */
  def runIngestDedup(spark: SparkSession, dir: String, name: String,
                     cut0: Long = 300, cut1: Long = 450,
                     killBetweenDays: Boolean = false): DataFrame =
    ingestDedupLoop(spark, dir, name, cut0, cut1, killBetweenDays,
      identity)

  /** q377: [[runIngestDedup]] with the LSH index COMPACTION run
    * mid-stream after day 1 — the VStage generation swap under live
    * dedup ingest. The compaction is content-preserving (distinct
    * signature rows, one file per bucket), so day 2's survivor set —
    * and therefore the whole output — is EXACTLY q358's: the shared
    * oracle proves the compaction is semantically invisible to the
    * loop it maintains, while physically re-bounding the bucket file
    * count the appends fragment (the LSM trade's both halves under one
    * stream). */
  def runIngestDedupCompact(spark: SparkSession, dir: String, name: String,
                            cut0: Long = 300, cut1: Long = 450,
                            killBetweenDays: Boolean = false): DataFrame =
    ingestDedupLoop(spark, dir, name, cut0, cut1, killBetweenDays,
      identity, compactAfterDay = Some(1))

  /** The FULL training-prep front under the stream (q370): q358\u0027s
    * loop with `prep` = the q49/q351 gates + within-batch exact dedup
    * (min-id per text; exact dups AGAINST the corpus need no separate
    * pass — identical text collides in every LSH band, so the near-dup
    * probe subsumes them). The corpus index holds only GATED docs (a
    * real pipeline indexes what it would keep); the oracle replays the
    * gated two-day sequential chain. */
  def runIngestPrep(spark: SparkSession, dir: String, name: String,
                    cut0: Long = 300, cut1: Long = 450,
                    killBetweenDays: Boolean = false): DataFrame =
    ingestDedupLoop(spark, dir, name, cut0, cut1, killBetweenDays,
      df => Dedup.exact(
        df.where(graft.TextAnalysis.langId(col("text")) === lit("en") &&
          round(graft.TextAnalysis.qualityScore(col("text")), 4) >= 0.5),
        col("text"), col("doc_id")))

  /** q379: [[runIngestPrep]] with DECONTAMINATION in the gate — the
    * missing production leg of the streaming prep front: every arriving
    * day is screened against a FIXED benchmark n-gram set
    * ([[graft.Decontaminate.decontaminate]], 5-gram hashes, the q63
    * semantics) between the quality gates and the dedup probe, so
    * benchmark-contaminated docs never reach the corpus index OR the
    * training output. The benchmark is external and known up front (no
    * time-travel: eval sets exist before training data arrives), here
    * the doc_id % 25 fixture slice of the FULL table — benchmark text
    * is never itself gated. Per batch the decon cost is one
    * batch-sized shingle pass joined against the benchmark gram set
    * (at scale: stage the benchmark grams once, or the q90 Bloom
    * variant — the gram table is benchmark-sized, a broadcast). The
    * oracle replays the gated + decontaminated two-day sequential
    * chain. */
  def runIngestPrepDecon(spark: SparkSession, dir: String, name: String,
                         cut0: Long = 300, cut1: Long = 450,
                         killBetweenDays: Boolean = false): DataFrame = {
    // the benchmark gram set builds ONCE, before the stream starts — a
    // benchmark is immutable during ingest, so re-deriving its distinct
    // 5-gram hashes per micro-batch (the pre-r13c shape) paid an
    // O(benchmark) scan per trigger for identical results; pinned as an
    // RDD (localCheckpoint) and re-wrapped on each batch's cloned
    // session (an RDD-backed frame has no relation cache to go stale —
    // the q358 hazard is table reads, not checkpointed plans)
    val bg = graft.Decontaminate.benchGramSet(
      Tables.t(spark, dir, "documents").where(col("doc_id") % 25 === 0),
      col("text"), n = 5).localCheckpoint()
    ingestDedupLoop(spark, dir, name, cut0, cut1, killBetweenDays,
      df => {
        val ss = df.sparkSession
        Dedup.exact(
          graft.Decontaminate.decontaminateAgainst(
            df.where(graft.TextAnalysis.langId(col("text")) === lit("en") &&
              round(graft.TextAnalysis.qualityScore(col("text")), 4) >= 0.5),
            col("text"), col("doc_id"),
            ss.createDataFrame(bg.rdd, bg.schema), n = 5),
          col("text"), col("doc_id"))
      })
  }

  /** STREAMING LEXICAL INDEX ingest (q388) — the postings family's
    * streaming leg (staged q385 → this), completing the streaming
    * symmetry with the LSH (q358) and IVF (q372) indexes: each arriving
    * day's documents tokenize-and-count into posting rows
    * ([[graft.Curate.tokenPostings]] — O(batch), tf is per-document)
    * and APPEND to the [[graft.VStage]] postings index; the serve after
    * the stream reads the grown index with FRESH df/N (one term-local
    * agg — staleness is a policy choice priced by q386, not a
    * correctness one). Retry tolerance is the q372 shape, not the
    * dedup loops': a replayed append leaves EXACT-DUPLICATE posting
    * rows, which are NOT inert for tf-idf (df counts rows and dots sum
    * them — a duplicated doc would double its df contributions and
    * norms), so serving collapses (id, term) duplicates FIRST with a
    * groupBy whose clustering the term-bucketed layout already
    * satisfies (term ⊆ {id, term} — zero extra Exchange, plan-pinned
    * in the unit suite). Append ≡ rebuild exactly, so the oracle is
    * q385's inline chain over the full corpus. */
  def runLexicalIngest(spark: SparkSession, dir: String, name: String,
                       cut0: Long = 300, cut1: Long = 450,
                       killBetweenDays: Boolean = false): DataFrame = {
    val docs = Tables.t(spark, dir, "documents")
    lexicalLoop(spark, docs.where(col("doc_id") < cut0),
      Seq(docs.where(col("doc_id") >= cut0 && col("doc_id") < cut1),
        docs.where(col("doc_id") >= cut1)),
      name, maintainStats = false, killBetweenDays)
  }

  /** [[runLexicalIngest]] / [[runLexicalIngestStats]]'s core over
    * EXPLICIT corpus/day frames (the 100× probe drives it with modular
    * cuts, the annLoop convention): stage day-0 postings, append each
    * arriving day's postings (plus, with `maintainStats`, the q389
    * day-tagged df/N delta), then serve panel top-k from the grown
    * index. `appendRows` observes the per-trigger durable write volume
    * (posting rows — batch-bounded by construction: tf is a pure
    * per-document function). */
  private[graft] def lexicalLoop(spark: SparkSession, corpus: DataFrame,
      days: Seq[DataFrame], name: String, maintainStats: Boolean,
      killBetweenDays: Boolean,
      batchSeconds: Option[scala.collection.mutable.Buffer[Double]] = None,
      appendRows: Option[scala.collection.mutable.Buffer[Long]] = None,
      killAfterDays: Set[Int] = Set.empty,
      compactAfterDay: Option[Int] = None)
      : DataFrame = {
    val idx = name + "_idx"
    val st = name + "_stats"
    val p0 = graft.Curate.tokenPostings(corpus, col("doc_id"), col("text"))
    if (maintainStats) {
      val pinned = p0.localCheckpoint()
      VStage.init(pinned, idx, "term", 8)
      VStage.init(statsDelta(pinned, -1L), st, "term", 8)
    } else VStage.init(p0, idx, "term", 8)
    val (spool, ckpt) = freshPaths(name)
    val body = (batch: DataFrame, bid: Long) => {
      val t0 = System.nanoTime()
      if (maintainStats) {
        // one tokenize pass feeds both appends
        val p = graft.Curate.tokenPostings(batch, col("doc_id"), col("text"))
          .localCheckpoint()
        VStage.append(p, idx, "term", 8)
        VStage.append(statsDelta(p, bid), st, "term", 8)
        appendRows.foreach(_ += p.count())
      } else {
        // pin only when the probe observes the write volume — the
        // production body appends the lazy plan directly
        val p0b = graft.Curate.tokenPostings(batch, col("doc_id"), col("text"))
        val p = if (appendRows.isDefined) p0b.localCheckpoint() else p0b
        VStage.append(p, idx, "term", 8)
        appendRows.foreach(_ += p.count())
      }
      batchSeconds.foreach(_ += (System.nanoTime() - t0) / 1e9)
      ()
    }
    driveDays(spark, days.head.schema, spool, ckpt, days,
      killBetweenDays, body,
      // postings compaction runs BETWEEN stream segments: collapse the
      // exact-duplicate rows replayed appends left and re-bucket one
      // file per term bucket — content ≡ collapsePostings, so serving
      // semantics are unchanged (the retrieval soak pins exactly that)
      killAfterDays = killAfterDays ++ compactAfterDay.toSet,
      afterSegment = day =>
        if (compactAfterDay.contains(day))
          VStage.compact(spark, idx, "term", 8,
            df => collapsePostings(df).repartition(8, col("term"))))
    if (maintainStats) {
      val (dfT, nd) = readStats(VStage.load(spark, st, refresh = true))
      graft.Curate.tfidfTopKWithStats(
          collapsePostings(VStage.load(spark, idx, refresh = true)),
          col("id") % 50 === 0, kLex = 10, dfT, nd)
        .orderBy("qid", "rank")
    } else
      graft.Curate.tfidfTopKFromPostings(
          collapsePostings(VStage.load(spark, idx, refresh = true)),
          col("id") % 50 === 0, kLex = 10)
        .orderBy("qid", "rank")
  }

  /** Replay-tolerant postings read: collapse the exact-duplicate
    * (id, term, tf) rows a crashed-and-replayed append leaves behind.
    * The rows are identical by construction (tf is a pure function of
    * the document), so max(tf) = tf; the grouping's clustering is
    * satisfied by the term bucketing (grouping keys ⊇ bucket key), so
    * this adds NO Exchange over the bucketed scan. */
  private[graft] def collapsePostings(postings: DataFrame): DataFrame =
    postings.groupBy("id", "term").agg(max(col("tf")).as("tf"))

  /** q389: [[runLexicalIngest]] with the df/N statistics MAINTAINED
    * INCREMENTALLY instead of recomputed from the postings at serve
    * time — the resolution of the tension q386 priced: df and N are
    * ADDITIVE over day-disjoint ingest (a doc arrives exactly once, so
    * per-day distinct-doc term counts sum to the corpus df), which
    * makes the maintained stats EXACTLY equal to recomputed ones — no
    * staleness, at a per-trigger cost of one batch-vocabulary-sized
    * delta append instead of an index-wide aggregation per serve. The
    * stats table is a patch log in the q368 sense (base + per-day
    * deltas, read = sum), with each delta tagged by its micro-batch id:
    * Structured Streaming REPLAYS a crashed batch under the SAME id, so
    * a replayed append writes exact-duplicate (day, term, df) rows that
    * the serve-side (day, term) collapse removes — the hazard is pinned
    * both ways in the unit suite (stats deltas are NOT inert without
    * the day tag: two days can legitimately contribute identical
    * (term, df) rows). Shares q385's oracle: streaming + maintained
    * stats ≡ the inline chain over the full corpus. */
  def runLexicalIngestStats(spark: SparkSession, dir: String, name: String,
                            cut0: Long = 300, cut1: Long = 450,
                            killBetweenDays: Boolean = false): DataFrame = {
    val docs = Tables.t(spark, dir, "documents")
    lexicalLoop(spark, docs.where(col("doc_id") < cut0),
      Seq(docs.where(col("doc_id") >= cut0 && col("doc_id") < cut1),
        docs.where(col("doc_id") >= cut1)),
      name, maintainStats = true, killBetweenDays)
  }

  /** One day's stats delta from its postings: per-term distinct-doc
    * count plus the distinct-doc total as a NULL-term sentinel row,
    * tagged with the micro-batch id (replay collapse key). */
  private[graft] def statsDelta(p: DataFrame, day: Long): DataFrame =
    p.groupBy("term").agg(count(lit(1)).as("df"))
      .select(lit(day).as("day"), col("term"), col("df"))
      .unionByName(p.agg(countDistinct("id").as("df"))
        .select(lit(day).as("day"), lit(null).cast("string").as("term"),
          col("df")))

  /** Serve-side read of the maintained stats log: collapse replayed
    * duplicate deltas on (day, term) — max(df) since replay rows are
    * exact duplicates — then fold the additive deltas with one sum.
    * Both aggregations are stats-log-sized (vocabulary × days), never
    * corpus-sized. */
  private[graft] def readStats(statsLog: DataFrame)
      : (DataFrame, DataFrame) = {
    val s = statsLog.groupBy("day", "term").agg(max(col("df")).as("df"))
    (s.where(col("term").isNotNull)
      .groupBy("term").agg(sum(col("df")).as("df")),
      s.where(col("term").isNull)
        .agg(sum(col("df")).as("nd")))
  }

  /** STREAMING ANN index ingest (q372) — the IVF family's streaming
    * leg (staged q357 → batch ingest q361 → recluster compaction q367
    * → this): each arriving day's embeddings assign to their cells
    * under the FIXED serving codebook and APPEND to the staged index
    * (new bucket files only — the q361 maintenance trade; codebook
    * drift is q367's business). Append ≡ rebuild exactly (per-row
    * assignment under fixed centroids), so the oracle is the
    * from-scratch q357 chain. Retry tolerance differs from the dedup
    * loops: a replayed append leaves EXACT-DUPLICATE index rows, which
    * are NOT inert for top-k serving (a duplicated neighbor would take
    * two ranks) — serving therefore collapses duplicate (qid, id)
    * candidates before ranking (`dedupCandidates`, candidate-set-sized,
    * never an index-side shuffle), and the recluster compaction
    * physically drops the duplicates. */
  /** [[runAnnIngest]]'s core over EXPLICIT corpus/day frames (the 100×
    * probe drives it with modular cuts): stages the day-0 IVF index
    * under a codebook trained on the day-0 slice, appends each arriving
    * day's cell assignments. Returns the serving codebook; the staged
    * index is `name + "_idx"` (a [[graft.VStage]] logical table). */
  /** `reclusterAfterDay`: run the crash-safe IVF recluster compaction
    * ([[graft.Similarity.ivfRecluster]]) between stream segments after
    * the named day — the codebook RETRAINS on the index's own content
    * and every later day assigns under the retrained codebook (the
    * serving layer must switch codebooks atomically with the index,
    * which is exactly what the returned centroids are). */
  private[graft] def annLoop(spark: SparkSession, corpusVecs: DataFrame,
      days: Seq[DataFrame], name: String, killBetweenDays: Boolean,
      batchSeconds: Option[scala.collection.mutable.Buffer[Double]] = None,
      appendRows: Option[scala.collection.mutable.Buffer[Long]] = None,
      reclusterAfterDay: Option[Int] = None,
      killAfterDays: Set[Int] = Set.empty)
      : Seq[(Long, Array[Double])] = {
    // the serving codebook trains on the DAY-0 slice only — the shape
    // an actual deployment has available before the stream starts (a
    // full-table codebook would time-travel: it would see day-1/day-2
    // rows that have not arrived yet). The q372 oracle replays the
    // same sliced training; drift of this frozen codebook as days
    // accumulate is exactly what the recluster compaction (q367/q373)
    // exists to heal
    // the live serving codebook: batches assign under whatever codebook
    // is current — the initial day-0 training, then the retrained one
    // once the mid-stream recluster swaps it in with the index
    @volatile var cents = graft.Similarity.kmeansCentroids(
      corpusVecs, col("embedding"), col("vec_id"), c = 16, iters = 2)
    val idx = name + "_idx"
    VStage.init(
      graft.Similarity.ivfIndexFrame(corpusVecs,
        col("embedding"), col("vec_id"), cents),
      idx, "cell", 8)
    val (spool, ckpt) = freshPaths(name)
    val body = (batch: DataFrame, _: Long) => {
      val t0 = System.nanoTime()
      VStage.append(
        graft.Similarity.ivfIndexFrame(batch, col("embedding"),
          col("vec_id"), cents),
        idx, "cell", 8)
      appendRows.foreach(_ += batch.count())
      batchSeconds.foreach(_ += (System.nanoTime() - t0) / 1e9)
      ()
    }
    driveDays(spark, days.head.schema, spool, ckpt, days,
      killBetweenDays, body,
      // the recluster runs BETWEEN stream segments, so its day must be
      // a segment boundary
      killAfterDays = killAfterDays ++ reclusterAfterDay.toSet,
      afterSegment = day =>
        if (reclusterAfterDay.contains(day))
          cents = graft.Similarity.ivfRecluster(spark, idx, c = 16,
            iters = 2, buckets = 8))
    cents
  }

  def runAnnIngest(spark: SparkSession, dir: String, name: String,
                   cut0: Long = 300, cut1: Long = 400,
                   killBetweenDays: Boolean = false): DataFrame =
    annIngest(spark, dir, name, cut0, cut1, killBetweenDays,
      reclusterAfterDay = None)

  /** q376: [[runAnnIngest]] with the RECLUSTER COMPACTION run
    * mid-stream after day 1 — the full IVF lifecycle under one stream:
    * day-0 staging (day-0-slice codebook) → day-1 appends under it →
    * crash-safe generation-swap recluster (retrain on corpus ∪ day 1,
    * reassign, one file/bucket) → day-2 appends under the RETRAINED
    * codebook → serve. Because the recluster reassigns everything it
    * holds and day 2 assigns under the same retrained codebook, the
    * final index ≡ a from-scratch build with the `< cut1` codebook —
    * the oracle replays exactly that (q357's chain, training sliced at
    * cut1). Green = the compaction composes with LIVE ingest on both
    * sides of it, with the codebook switched atomically with the
    * index. */
  def runAnnIngestRecluster(spark: SparkSession, dir: String, name: String,
                            cut0: Long = 300, cut1: Long = 400,
                            killBetweenDays: Boolean = false): DataFrame =
    annIngest(spark, dir, name, cut0, cut1, killBetweenDays,
      reclusterAfterDay = Some(1))

  private def annIngest(spark: SparkSession, dir: String, name: String,
                        cut0: Long, cut1: Long, killBetweenDays: Boolean,
                        reclusterAfterDay: Option[Int]): DataFrame = {
    val e = Tables.t(spark, dir, "embeddings")
    val idx = name + "_idx"
    val cents = annLoop(spark, e.where(col("vec_id") < cut0),
      Seq(e.where(col("vec_id") >= cut0 && col("vec_id") < cut1),
        e.where(col("vec_id") >= cut1)), name, killBetweenDays,
      reclusterAfterDay = reclusterAfterDay)
    // the appends ran through the CLONED batch sessions; refresh = true
    // drops the outer session's cached relation so the serve re-lists
    graft.Similarity.ivfKnnJoinIndex(VStage.load(spark, idx, refresh = true),
      e.filter(col("label") === 1), col("embedding"), col("vec_id"),
      k = 3, centroids = cents, nProbe = 4, dedupCandidates = true)
      .select(col("qid"), col("rank"), col("id"),
        round(col("cos_sim"), 4).as("cos_sim"))
      .orderBy("qid", "rank")
  }

  /** STREAMING dedup-cluster maintenance — q355's incremental CC
    * driven by the stream: each arriving day's micro-batch probes the
    * staged index for cross edges + its own star edges
    * ([[Dedup.batchIngestEdges]], one signature scan), merges them
    * into the running labels via [[Dedup.ccIncremental]] (CC over the
    * batch-sized quotient only), and appends ALL its signatures to the
    * index so later days can connect to it. Per-trigger cost is
    * O(batch) compute plus one state-sized swap write (the durability
    * price — measured in PLANS.md; at 100 TB the deferred-relabel
    * patch log noted in [[Dedup.ccIncremental]]'s scaladoc amortizes
    * it). The corpus is never rescanned and the labels are never
    * recomputed. Cluster structure is ORDER-INDEPENDENT (CC over the
    * union of all discovered edges, which equals the full collision
    * graph: every colliding pair meets through the index), so the
    * oracle is simply the full-recompute cluster census — the green
    * row proves streaming-incremental ≡ batch-full end-to-end. */
  /** The cluster-maintenance loop over EXPLICIT corpus/day frames — the
    * core [[runClusterMaintenance]] (threshold cuts) and the 100×
    * streaming probe (modular cuts, so the batch stays fixed-size while
    * the corpus scales) share. Stages the corpus index, bootstraps the
    * durable labels, drives the days, returns the state path.
    * `batchSeconds` (probe hook) collects the wall of each APPLIED
    * micro-batch body — the per-trigger cost the O(batch) contract is
    * about. */
  private[graft] def clusterLoop(spark: SparkSession, corpus: DataFrame,
      days: Seq[DataFrame], name: String, killBetweenDays: Boolean,
      batchSeconds: Option[scala.collection.mutable.Buffer[Double]] = None,
      killAfterDays: Set[Int] = Set.empty,
      afterSegment: Int => Unit = _ => (),
      maxFilesPerTrigger: Option[Int] = Some(1),
      writeRows: Option[scala.collection.mutable.Buffer[Long]] = None)
      : String = {
    val idx = name + "_idx"
    val statePath = s"target/ingest_state_$name"
    VStage.init(
      Dedup.lshIndexFrame(corpus, col("text"), col("doc_id")),
      idx, "lsh_key", 8)
    val (spool, ckpt) = freshPaths(name)
    // day-0 bootstrap: commit the corpus labels as the initial durable
    // state (marker -1, so streaming batch 0 still applies)
    DurableState.destroy(statePath)
    val scope0 = CkptScope()
    // day-0 star edges come from the index just staged, not a second
    // corpus tokenize (Dedup.starEdgesFromIndex — the q350 one-scan
    // lesson; zero-Exchange on the bucketed layout)
    try DurableState.commit(
      Dedup.connectedComponents(
        Dedup.starEdgesFromIndex(VStage.load(spark, idx)),
        scope = scope0),
      statePath, -1L)
    finally scope0.freeAll()
    val body = (batch: DataFrame, batchId: Long) => {
      val ss = batch.sparkSession // cloned session: see runIngestDedup
      DurableState.recover(statePath)
      // exactly-once across retries: a re-delivered batch whose state
      // swap already committed skips cleanly (its index append also
      // already ran; see the class doc for why an append replay on a
      // NOT-committed batch is inert)
      if (batchId > DurableState.committedBatch(statePath)) {
        val t0 = System.nanoTime()
        val scope = CkptScope()
        try {
          val state = DurableState.load(ss, statePath)
          // edges materialize (checkpoint) inside ccIncremental BEFORE
          // the append below, so they read the pre-batch index state.
          // The probe EXCLUDES the batch's own ids: a replay after a
          // surviving append would otherwise see the batch's own
          // signatures in the index, and the cross-edge representative
          // min(corpus_id) could pick a batch doc over the corpus doc
          // whenever batch ids undercut corpus ids (modular-cut
          // drives), dropping the connecting edge — pinned in
          // DurabilitySpec; a semantic no-op on first delivery
          val next = Dedup.ccIncremental(state,
            Dedup.batchIngestEdges(batch,
              Dedup.indexWithoutIds(VStage.load(ss, idx),
                batch.select(col("doc_id").as("id"))),
              col("text"), col("doc_id"), scope = scope), scope = scope)
          // ALL batch signatures append (cluster maintenance keeps every
          // doc, unlike the dedup loop's survivors-only append)
          VStage.append(
            Dedup.lshIndexFrame(batch, col("text"), col("doc_id")),
            idx, "lsh_key", 8)
          // probe hook rides the commit's own observed count — the eager
          // swap rewrites the WHOLE state (no extra re-read job, r14)
          val stateRows = DurableState.commit(next, statePath, batchId)
          writeRows.foreach(_ += stateRows)
        } finally scope.freeAll()
        batchSeconds.foreach(_ += (System.nanoTime() - t0) / 1e9)
      }
      ()
    }
    driveDays(spark, days.head.schema, spool, ckpt, days,
      killBetweenDays, body, killAfterDays, afterSegment,
      maxFilesPerTrigger)
    statePath
  }

  def runClusterMaintenance(spark: SparkSession, dir: String, name: String,
                            cut0: Long = 300, cut1: Long = 450,
                            killBetweenDays: Boolean = false): DataFrame = {
    val docs = Tables.t(spark, dir, "documents")
    val statePath = clusterLoop(spark, docs.where(col("doc_id") < cut0),
      Seq(docs.where(col("doc_id") >= cut0 && col("doc_id") < cut1),
        docs.where(col("doc_id") >= cut1)), name, killBetweenDays)
    clusterCensus(DurableState.load(spark, statePath), cut0)
  }

  private def clusterCensus(labels: DataFrame, cut0: Long): DataFrame =
    labels.groupBy(col("comp").as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("id") >= cut0, 1)).as("n_new"),
        max("id").as("max_doc_id"))
      .orderBy("cluster_id")

  // ------------------------------------------------------- patch-log state

  /** Resolved view of a patch-log cluster state: base labels ∪ the
    * COMMITTED per-batch label appends, with comps re-pointed through
    * the folded patch map ([[Dedup.applyPatch]] — one broadcast join).
    * The append window is bounded on BOTH sides (partition-pruned on
    * the `ingest_batch` directory key):
    *  - `> base fold marker` makes [[foldPatchLog]] crash-safe —
    *    appends the base already folded are ignored even if their
    *    cleanup didn't run;
    *  - `≤ patch commit marker` makes the micro-batch REPLAY window
    *    safe — a crashed attempt that wrote its label append but died
    *    before the patch commit left an UNCOMMITTED dir, and reading it
    *    back during the replay would make the batch's own docs look
    *    already-labeled (their recompute would then drop or mislabel
    *    them; the replay instead recomputes from the exact pre-batch
    *    view and overwrites the leftover dir — pinned). */
  private[graft] def patchLogLabels(spark: SparkSession, statePath: String)
      : DataFrame = {
    val base = DurableState.load(spark, statePath + "_base")
    val labs = committedAppends(spark, statePath, "_labels") match {
      case Some(app) => base.unionByName(app.select("id", "comp"))
      case None => base
    }
    Dedup.applyPatch(labs, DurableState.load(spark, statePath + "_patch"))
  }

  /** The committed append window of a patch-log state (see
    * [[patchLogLabels]] for the two-sided bound), or None when no
    * appends exist. */
  private def committedAppends(spark: SparkSession, statePath: String,
                               suffix: String): Option[DataFrame] = {
    val appDir = new java.io.File(statePath + suffix)
    if (appDir.isDirectory && appDir.listFiles().nonEmpty) {
      val folded = DurableState.committedBatch(statePath + "_base")
      val committed = DurableState.committedBatch(statePath + "_patch")
      Some(spark.read.parquet(appDir.getPath)
        .where(col("ingest_batch") > folded &&
          col("ingest_batch") <= committed))
    } else None
  }

  /** Fold-into-base compaction for a patch-log state: materialize the
    * resolved view as the new base (one swap, marker = the patch's
    * committed batch), clear the subsumed appends, reset the patch —
    * the LSM compaction leg for the state itself, re-bounding the
    * folded patch map (it grows with total moves). Resolved reads
    * before and after are identical (pinned in DurabilitySpec), and
    * every crash window is benign: appends the new base subsumes are
    * marker-filtered out of reads ([[patchLogLabels]] /
    * [[patchLogAssign]]), and a stale folded patch applied to fully-
    * resolved rows is a no-op (its keys are superseded minima, which
    * never appear as terminal comps) — steps 2 and 3 are size
    * reclamation, not correctness. */
  private def foldPatchState(spark: SparkSession, statePath: String,
                             resolved: DataFrame, appends: String): Unit = {
    val upTo = DurableState.committedBatch(statePath + "_patch")
    DurableState.commit(resolved, statePath + "_base", upTo)
    rm(new java.io.File(statePath + appends))
    DurableState.commit(emptyPatch(spark), statePath + "_patch", upTo)
  }

  private[graft] def foldPatchLog(spark: SparkSession, statePath: String)
      : Unit =
    foldPatchState(spark, statePath, patchLogLabels(spark, statePath),
      "_labels")

  private[graft] def foldPatchAssign(spark: SparkSession, statePath: String)
      : Unit =
    foldPatchState(spark, statePath, patchLogAssign(spark, statePath),
      "_assign")

  /** Resolved view of a patch-log SPLIT-ASSIGNMENT state
    * ([[patchLogLabels]]' 3-column sibling, q369): base assignment ∪
    * COMMITTED appends (two-sided marker bound — see
    * [[patchLogLabels]]), comps re-pointed through the folded patch
    * keyed on coalesce(comp, id) — isolated day-0 docs carry a null
    * comp (their implicit label is their own id), and a patch entry on
    * that id means this batch merged them. Splits pass through
    * untouched — the split-stability contract is exactly what makes
    * the assignment patch-deferrable. */
  private[graft] def patchLogAssign(spark: SparkSession, statePath: String)
      : DataFrame = {
    val base = DurableState.load(spark, statePath + "_base")
    val rows = committedAppends(spark, statePath, "_assign") match {
      case Some(app) => base.unionByName(app.select("id", "split", "comp"))
      case None => base
    }
    val p = DurableState.load(spark, statePath + "_patch")
      .select(col("old").as("__po"), col("new").as("__pn"))
    rows.join(broadcast(p),
        coalesce(rows("comp"), rows("id")) === col("__po"), "left")
      .select(rows("id"), rows("split"),
        coalesce(col("__pn"), rows("comp")).as("comp"))
  }

  private def emptyPatch(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("old"), col("id").as("new"))

  /** [[clusterLoop]]'s DEFERRED-RELABEL twin (q368) — the per-trigger
    * cost shape a 100 TB deployment needs: where the eager loop swaps
    * the full labels table every trigger (O(corpus) durable I/O — the
    * price [[DurableState]] charged q364 for restart safety), this loop
    * persists only the batch-bounded pieces: the new endpoints' label
    * rows APPEND (idempotent per-batch directory) and the label PATCH
    * folds into a terminal patch map ([[Dedup.ccIncrementalPatch]] /
    * [[Dedup.composePatch]]) swapped with the commit marker. State
    * reads resolve lazily ([[patchLogLabels]]); the patch map grows
    * with total moves, never the corpus, and [[foldPatchLog]] re-bounds
    * it periodically. Same recovery story as the eager loop: marker-
    * gated exactly-once, kill-and-resume ≡ uninterrupted (pinned), and
    * the q368 oracle replays the full recompute census. Measured
    * against the eager loop across 1×/10×/100× corpora in
    * IngestStreamProbe. */
  private[graft] def clusterLoopDeferred(spark: SparkSession,
      corpus: DataFrame, days: Seq[DataFrame], name: String,
      killBetweenDays: Boolean,
      batchSeconds: Option[scala.collection.mutable.Buffer[Double]] = None,
      foldFactor: Double = 1.0,
      killAfterDays: Set[Int] = Set.empty,
      afterSegment: Int => Unit = _ => (),
      maxFilesPerTrigger: Option[Int] = Some(1),
      writeRows: Option[scala.collection.mutable.Buffer[Long]] = None)
      : String = {
    val idx = name + "_idx"
    val statePath = s"target/ingest_state_$name"
    VStage.init(
      Dedup.lshIndexFrame(corpus, col("text"), col("doc_id")),
      idx, "lsh_key", 8)
    val (spool, ckpt) = freshPaths(name)
    Seq("_base", "_patch").foreach(s => DurableState.destroy(statePath + s))
    rm(new java.io.File(statePath + "_labels"))
    val scope0 = CkptScope()
    try {
      DurableState.commit(
        Dedup.connectedComponents(
          Dedup.starEdgesFromIndex(VStage.load(spark, idx)),
          scope = scope0),
        statePath + "_base", -1L)
      DurableState.commit(emptyPatch(spark), statePath + "_patch", -1L)
    } finally scope0.freeAll()
    val body = (batch: DataFrame, batchId: Long) => {
      val ss = batch.sparkSession // cloned session: see runIngestDedup
      val patchPath = statePath + "_patch"
      DurableState.recover(patchPath)
      if (batchId > DurableState.committedBatch(patchPath)) {
        val t0 = System.nanoTime()
        val scope = CkptScope()
        try {
          val labels = patchLogLabels(ss, statePath)
          // patch + fresh labels checkpoint inside ccIncrementalPatch
          // (via ccContract) BEFORE the append — pre-batch index state;
          // self-exclusion for replay-after-append (see clusterLoop)
          val (patch, freshLab) = Dedup.ccIncrementalPatch(labels,
            Dedup.batchIngestEdges(batch,
              Dedup.indexWithoutIds(VStage.load(ss, idx),
                batch.select(col("doc_id").as("id"))),
              col("text"), col("doc_id"), scope = scope), scope = scope)
          VStage.append(
            Dedup.lshIndexFrame(batch, col("text"), col("doc_id")),
            idx, "lsh_key", 8)
          // idempotent per-batch label append, then the marker-carrying
          // patch swap as the commit point (replay overwrites the same
          // label dir and recomputes the same fold). Both cardinalities
          // the fold trigger and the probe hook need ride the two writes
          // as Observations (r14, guide §1.2: the separate freshLab
          // count re-ran its plan and the patch count re-read the swap —
          // 3 extra jobs per trigger for numbers the writes already had)
          val labObs = org.apache.spark.sql.Observation()
          freshLab.observe(labObs, count(lit(1)).as("rows"))
            .write.mode("overwrite").parquet(
              s"${statePath}_labels/ingest_batch=$batchId")
          val labRows = labObs.get("rows").asInstanceOf[Long]
          val patchRows = DurableState.commit(
            Dedup.composePatch(DurableState.load(ss, patchPath), patch),
            patchPath, batchId)
          // SIZE-TRIGGERED FOLD (r12 judge directive 2): the folded
          // patch map grows with total moves, never the corpus — but
          // "total moves" is unbounded over a long-running stream, so
          // the loop itself re-bounds it: when the patch outgrows
          // foldFactor × this batch's label rows, fold the resolved
          // view into the base (one corpus-sized swap, the LSM
          // compaction leg — amortized, since the trigger requires the
          // patch to have accumulated a batch's worth of moves first).
          // Both counts are tiny frames (the patch is move-bounded, the
          // label rows batch-bounded); every fold crash window is
          // benign (see foldPatchState)
          maybeFold(ss, statePath, patchRows, labRows,
            foldFactor, foldPatchLog)
          // probe hook: durable rows this trigger (label append + the
          // live patch after compose — the batch-bounded claim)
          writeRows.foreach(_ += labRows + patchRows)
        } finally scope.freeAll()
        batchSeconds.foreach(_ += (System.nanoTime() - t0) / 1e9)
      }
      ()
    }
    driveDays(spark, days.head.schema, spool, ckpt, days,
      killBetweenDays, body, killAfterDays, afterSegment,
      maxFilesPerTrigger)
    statePath
  }

  /** Shared size-trigger for the patch-log loops: fold when the patch
    * map holds more rows than `foldFactor ×` this batch's appended
    * rows. `foldFactor = ∞` disables (the A/B baseline). Both counts
    * arrive observed from the trigger's own writes ([[DurableState.commit]]
    * returns the swapped patch's cardinality) — the check itself runs
    * zero jobs (r14). */
  private def maybeFold(ss: SparkSession, statePath: String,
      patchRows: Long, batchRows: Long, foldFactor: Double,
      fold: (SparkSession, String) => Unit): Unit =
    if (!foldFactor.isPosInfinity &&
        patchRows > foldFactor * math.max(batchRows, 1L)) {
      fold(ss, statePath)
    }

  /** q368: [[runClusterMaintenance]]'s census served from the
    * patch-log state — streaming-incremental ≡ batch-full proven by
    * the same full-recompute oracle, with per-trigger durable I/O
    * independent of corpus size. */
  def runClusterPatchLog(spark: SparkSession, dir: String, name: String,
                         cut0: Long = 300, cut1: Long = 450,
                         killBetweenDays: Boolean = false): DataFrame = {
    val docs = Tables.t(spark, dir, "documents")
    val statePath = clusterLoopDeferred(spark,
      docs.where(col("doc_id") < cut0),
      Seq(docs.where(col("doc_id") >= cut0 && col("doc_id") < cut1),
        docs.where(col("doc_id") >= cut1)), name, killBetweenDays)
    clusterCensus(patchLogLabels(spark, statePath), cut0)
  }

  /** [[runClusterPatchLog]] over an ARBITRARY arrival-day chain (q374):
    * `cuts` bound the corpus (`< cuts.head`) and each day
    * (`[cuts(i), cuts(i+1))`, last day unbounded). The size-triggered
    * auto-fold runs LIVE inside the loop — with more than two days the
    * patch map crosses the fold threshold mid-stream, so the green
    * oracle row proves a mid-run fold composes with later batches
    * (fold → more merges → fold again) to the same full-recompute
    * census. Cluster structure is order-independent, so the oracle is
    * q364's census at `cuts.head`. */
  def runClusterPatchLogMulti(spark: SparkSession, dir: String,
                              name: String, cuts: Seq[Long],
                              foldFactor: Double = 1.0,
                              killBetweenDays: Boolean = false): DataFrame = {
    require(cuts.nonEmpty, "need at least one cut")
    val docs = Tables.t(spark, dir, "documents")
    val days = cuts.sliding(2).collect { case Seq(lo, hi) =>
      docs.where(col("doc_id") >= lo && col("doc_id") < hi) }.toSeq :+
      docs.where(col("doc_id") >= cuts.last)
    val statePath = clusterLoopDeferred(spark,
      docs.where(col("doc_id") < cuts.head), days, name,
      killBetweenDays, foldFactor = foldFactor)
    clusterCensus(patchLogLabels(spark, statePath), cuts.head)
  }

  /** The ingest END-STATE: split-stable assignment maintained under a
    * STREAM of arriving days. Day 0 assigns cluster-safely; each
    * micro-batch then merges into the cluster structure and assigns
    * splits via [[Dedup.splitStableAssign]] (old docs never move, new
    * docs inherit their merged component's min-old-member split,
    * fresh components hash), with the day's signatures appended so
    * later days connect. The assignment state is ORDER-DEPENDENT (day
    * 2's inheritance depends on day 1's merges), which is exactly why
    * it lives in [[DurableState]]: a driver restart that lost it could
    * not reconstruct the sequential history. The final census reports,
    * per declared split: doc mass and the irreducible legacy conflicts
    * (components whose members span ≥ 2 splits — merges forced them,
    * history can't be reassigned). The oracle replays the SEQUENTIAL
    * chain — three CC stages (corpus, corpus∪day1, all) and both
    * inheritance steps — so the green row proves the day-after-day
    * state composition equals the from-scratch sequential analysis. */
  /** The eager split-stable loop over EXPLICIT corpus/day frames (the
    * multi-day core [[runSplitStableIngest]] and the soak drill
    * share). ORDER-DEPENDENT: asserts the one-day-per-trigger contract
    * ([[assertSingleFile]]). Returns the state path. */
  private[graft] def splitLoop(spark: SparkSession, corpus: DataFrame,
      days: Seq[DataFrame], name: String, salt: String,
      killBetweenDays: Boolean,
      batchSeconds: Option[scala.collection.mutable.Buffer[Double]] = None,
      killAfterDays: Set[Int] = Set.empty,
      afterSegment: Int => Unit = _ => (),
      maxFilesPerTrigger: Option[Int] = Some(1)): String = {
    val idx = name + "_idx"
    val statePath = s"target/ingest_state_$name"
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    VStage.init(
      Dedup.lshIndexFrame(corpus, col("text"), col("doc_id")),
      idx, "lsh_key", 8)
    val (spool, ckpt) = freshPaths(name)
    DurableState.destroy(statePath)
    val scope0 = CkptScope()
    try {
      val labels0 = Dedup.connectedComponents(
        Dedup.starEdgesFromIndex(VStage.load(spark, idx)),
        scope = scope0)
      DurableState.commit(
        corpus.select(col("doc_id").cast("long").as("id"))
          .join(labels0.withColumnRenamed("id", "__lid"),
            col("id") === col("__lid"), "left")
          .select(col("id"),
            graft.Sampling.splitAssign(coalesce(col("comp"), col("id")), fr,
              salt).as("split"),
            col("comp")),
        statePath, -1L)
    } finally scope0.freeAll()
    val body = (batch: DataFrame, batchId: Long) => {
      val ss = batch.sparkSession // cloned session: see runIngestDedup
      assertSingleFile(batch)
      DurableState.recover(statePath)
      if (batchId > DurableState.committedBatch(statePath)) {
        val t0 = System.nanoTime()
        val scope = CkptScope()
        try {
          // self-exclusion for replay-after-append (see clusterLoop)
          val next = Dedup.splitStableAssign(
            DurableState.load(ss, statePath),
            Dedup.indexWithoutIds(VStage.load(ss, idx),
              batch.select(col("doc_id").as("id"))),
            batch, col("text"), col("doc_id"),
            c => graft.Sampling.splitAssign(c, fr, salt), scope = scope)
          VStage.append(
            Dedup.lshIndexFrame(batch, col("text"), col("doc_id")),
            idx, "lsh_key", 8)
          DurableState.commit(next, statePath, batchId)
        } finally scope.freeAll()
        batchSeconds.foreach(_ += (System.nanoTime() - t0) / 1e9)
      }
      ()
    }
    driveDays(spark, days.head.schema, spool, ckpt, days,
      killBetweenDays, body, killAfterDays, afterSegment,
      maxFilesPerTrigger)
    statePath
  }

  def runSplitStableIngest(spark: SparkSession, dir: String, name: String,
                           cut0: Long = 300, cut1: Long = 450,
                           salt: String = "sss",
                           killBetweenDays: Boolean = false): DataFrame = {
    val docs = Tables.t(spark, dir, "documents")
    val statePath = splitLoop(spark, docs.where(col("doc_id") < cut0),
      Seq(docs.where(col("doc_id") >= cut0 && col("doc_id") < cut1),
        docs.where(col("doc_id") >= cut1)), name, salt, killBetweenDays)
    splitCensus(spark, DurableState.load(spark, statePath))
  }

  /** The q365/q369 final census: per declared split, doc mass and the
    * irreducible legacy conflicts (components whose members span ≥ 2
    * splits). */
  private def splitCensus(spark: SparkSession, assign: DataFrame)
      : DataFrame = {
    val fin = assign.select(col("split"),
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

  /** q369: [[runSplitStableIngest]] on the PATCH-LOG state — the
    * order-dependent loop gets the same O(batch)-per-trigger durable
    * I/O as q368: splits never move (the operator's contract), so the
    * only corpus-wide effect of a batch is the comp relabel, deferred
    * into the folded patch map; batch assignment rows append
    * idempotently per batch. Same sequential-chain oracle as q365 —
    * the green row proves the deferred composition equals the
    * from-scratch sequential analysis. */
  /** The patch-log split loop over EXPLICIT corpus/day frames
    * ([[splitLoop]]'s deferred twin; the multi-day core
    * [[runSplitStablePatchLog]] and the soak drill share). Same
    * one-day-per-trigger contract; auto-folds on the [[maybeFold]]
    * size trigger. Returns the state path. */
  private[graft] def splitLoopDeferred(spark: SparkSession,
      corpus: DataFrame, days: Seq[DataFrame], name: String, salt: String,
      killBetweenDays: Boolean,
      batchSeconds: Option[scala.collection.mutable.Buffer[Double]] = None,
      foldFactor: Double = 1.0,
      killAfterDays: Set[Int] = Set.empty,
      afterSegment: Int => Unit = _ => ()): String = {
    val idx = name + "_idx"
    val statePath = s"target/ingest_state_$name"
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    VStage.init(
      Dedup.lshIndexFrame(corpus, col("text"), col("doc_id")),
      idx, "lsh_key", 8)
    val (spool, ckpt) = freshPaths(name)
    Seq("_base", "_patch").foreach(s => DurableState.destroy(statePath + s))
    rm(new java.io.File(statePath + "_assign"))
    val scope0 = CkptScope()
    try {
      val labels0 = Dedup.connectedComponents(
        Dedup.starEdgesFromIndex(VStage.load(spark, idx)),
        scope = scope0)
      DurableState.commit(
        corpus.select(col("doc_id").cast("long").as("id"))
          .join(labels0.withColumnRenamed("id", "__lid"),
            col("id") === col("__lid"), "left")
          .select(col("id"),
            graft.Sampling.splitAssign(coalesce(col("comp"), col("id")),
              fr, salt).as("split"),
            col("comp")),
        statePath + "_base", -1L)
      DurableState.commit(emptyPatch(spark), statePath + "_patch", -1L)
    } finally scope0.freeAll()
    val body = (batch: DataFrame, batchId: Long) => {
      val ss = batch.sparkSession // cloned session: see runIngestDedup
      assertSingleFile(batch)
      val patchPath = statePath + "_patch"
      DurableState.recover(patchPath)
      if (batchId > DurableState.committedBatch(patchPath)) {
        val t0 = System.nanoTime()
        val scope = CkptScope()
        try {
          // self-exclusion for replay-after-append (see clusterLoop)
          val (patch, newRows) = Dedup.splitStableAssignPatch(
            patchLogAssign(ss, statePath),
            Dedup.indexWithoutIds(VStage.load(ss, idx),
              batch.select(col("doc_id").as("id"))),
            batch, col("text"), col("doc_id"),
            c => graft.Sampling.splitAssign(c, fr, salt), scope = scope)
          VStage.append(
            Dedup.lshIndexFrame(batch, col("text"), col("doc_id")),
            idx, "lsh_key", 8)
          // counts observed on the trigger's own writes — see
          // clusterLoopDeferred (r14)
          val rowObs = org.apache.spark.sql.Observation()
          newRows.observe(rowObs, count(lit(1)).as("rows"))
            .write.mode("overwrite").parquet(
              s"${statePath}_assign/ingest_batch=$batchId")
          val newRowsN = rowObs.get("rows").asInstanceOf[Long]
          val patchRows = DurableState.commit(
            Dedup.composePatch(DurableState.load(ss, patchPath), patch),
            patchPath, batchId)
          // size-triggered fold — see clusterLoopDeferred
          maybeFold(ss, statePath, patchRows, newRowsN,
            foldFactor, foldPatchAssign)
        } finally scope.freeAll()
        batchSeconds.foreach(_ += (System.nanoTime() - t0) / 1e9)
      }
      ()
    }
    driveDays(spark, days.head.schema, spool, ckpt, days,
      killBetweenDays, body, killAfterDays, afterSegment)
    statePath
  }

  def runSplitStablePatchLog(spark: SparkSession, dir: String, name: String,
                             cut0: Long = 300, cut1: Long = 450,
                             salt: String = "sss",
                             killBetweenDays: Boolean = false): DataFrame = {
    val docs = Tables.t(spark, dir, "documents")
    val statePath = splitLoopDeferred(spark,
      docs.where(col("doc_id") < cut0),
      Seq(docs.where(col("doc_id") >= cut0 && col("doc_id") < cut1),
        docs.where(col("doc_id") >= cut1)), name, salt, killBetweenDays)
    splitCensus(spark, patchLogAssign(spark, statePath))
  }
}
