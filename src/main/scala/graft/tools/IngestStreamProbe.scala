package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-trigger cost of the ACTUAL streaming ingest loops under corpus
  * scale (dev tool, not a query; r11 directive 5 + r12 directive 4):
  * fixed-size arrival days against a 1×/10×/100× corpus (the
  * ScaleProbe fixtures; modular cuts keep the batch the same rows at
  * every scale, the IncrementalCCProbe convention), reporting each
  * micro-batch body's wall separately from the one-time prep (index
  * staging + day-0 state bootstrap) plus the per-trigger DURABLE WRITE
  * VOLUME (state/output rows — the thing that must stay batch-bounded
  * at 100 TB).
  *
  * Modes:
  *  - `eager` (q364) / `patch` (q368): the cluster-maintenance loops.
  *    The eager state swap is O(corpus) I/O per trigger (state_rows
  *    grows with scale); the patch-log rows exist to verify the
  *    deferred twin stays flat.
  *  - `prep` (q370): the full gated training-prep front under the
  *    stream — per-trigger wall + survivor rows (the loop's durable
  *    output + index append volume, both batch-bounded).
  *  - `ann` (q372): streaming IVF index ingest — per-trigger wall +
  *    appended index rows (batch-bounded by construction: one row per
  *    arriving vector).
  *  - `decon` (q379): the prep front WITH benchmark decontamination in
  *    the gate — per-trigger wall + survivor rows. The benchmark gram
  *    set pins ONCE before the stream (the r13c fix this probe
  *    motivated); the per-trigger broadcast of that set grows with the
  *    BENCHMARK (fixed in production, corpus-proportional in this
  *    fixture), not with the corpus scan.
  *  - `lex` (q388) / `lexstats` (q389): streaming lexical (postings)
  *    index ingest, without/with incrementally-maintained df/N stats —
  *    per-trigger wall + appended posting rows (batch-bounded: tf is
  *    per-document); state_rows = grown index size (resp. stats-log
  *    size), which grows with the CORPUS but is only ever read at
  *    serve time, never rewritten per trigger. */
object IngestStreamProbe {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dst = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "target/sf1")
    val d100 = sys.env.getOrElse("SPARK_GRAFT_SF100_DIR", "target/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val modes = sys.env.getOrElse("SPARK_GRAFT_MODES",
      "eager,patch,prep,ann").split(",").toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Tables
    import graft.streaming.{DurableState, IngestStreams}

    // fixed arrival days: the sf0.1 tables' 8- and 9-tails (key shifts
    // are multiples of 10, so the corpus filter excludes every copy's
    // tails and the batch rows exist verbatim at every scale)
    val day1 = Tables.t(spark, src, "documents")
      .where(col("doc_id") % 10 === 8).localCheckpoint()
    val day2 = Tables.t(spark, src, "documents")
      .where(col("doc_id") % 10 === 9).localCheckpoint()
    val vday1 = Tables.t(spark, src, "embeddings")
      .where(col("vec_id") % 10 === 8).localCheckpoint()
    val vday2 = Tables.t(spark, src, "embeddings")
      .where(col("vec_id") % 10 === 9).localCheckpoint()
    val dirs = Seq("sf0.1" -> src) ++
      (if (new java.io.File(s"$dst/documents.parquet").isFile)
        Seq("sf1" -> dst) else Nil) ++
      (if (new java.io.File(s"$d100/documents.parquet").isFile)
        Seq("sf10" -> d100) else Nil)
    println(f"${"corpus"}%-8s ${"mode"}%-8s ${"prep_s"}%8s " +
      f"${"batch1_s"}%9s ${"batch2_s"}%9s ${"w1_rows"}%9s " +
      f"${"w2_rows"}%9s ${"state_rows"}%11s")
    // one JIT warmup pass on the small corpus, then one measured pass
    // per (scale, mode) — the stream includes staging; two-pass min
    // would double the 100× wall for no extra signal
    def run(tag: String, dir: String, mode: String): Unit = {
      val buf = scala.collection.mutable.Buffer.empty[Double]
      val wrote = scala.collection.mutable.Buffer.empty[Long]
      val t0 = System.nanoTime()
      val name = s"probe_ism_${mode}_${tag.replaceAll("[^A-Za-z0-9]", "_")}"
      val stateRows: Long = mode match {
        case "eager" | "patch" =>
          val corpus = Tables.t(spark, dir, "documents")
            .where(col("doc_id") % 10 < 8)
          val statePath =
            if (mode == "patch") IngestStreams.clusterLoopDeferred(spark,
              corpus, Seq(day1, day2), name, killBetweenDays = false,
              batchSeconds = Some(buf))
            else IngestStreams.clusterLoop(spark, corpus,
              Seq(day1, day2), name, killBetweenDays = false,
              batchSeconds = Some(buf))
          // durable write volume per trigger: the eager loop swaps the
          // FULL state (state-size rows each trigger); the patch loop
          // appends only the batch's label rows + the patch
          (if (mode == "patch")
            IngestStreams.patchLogLabels(spark, statePath)
          else DurableState.load(spark, statePath)).count()
        case "prep" =>
          val corpus = Tables.t(spark, dir, "documents")
            .where(col("doc_id") % 10 < 8)
          val out = IngestStreams.dedupLoop(spark,
            corpus, Seq(day1, day2), name, killBetweenDays = false,
            prep = df => graft.Dedup.exact(
              df.where(graft.TextAnalysis.langId(col("text")) === lit("en") &&
                round(graft.TextAnalysis.qualityScore(col("text")), 4) >= 0.5),
              col("text"), col("doc_id")),
            batchSeconds = Some(buf), survRows = Some(wrote))
          out.count()
        case "ann" =>
          val corpus = Tables.t(spark, dir, "embeddings")
            .where(col("vec_id") % 10 < 8)
          IngestStreams.annLoop(spark, corpus, Seq(vday1, vday2), name,
            killBetweenDays = false, batchSeconds = Some(buf),
            appendRows = Some(wrote))
          graft.VStage.load(spark, name + "_idx", refresh = true).count()
        case "decon" =>
          val corpus = Tables.t(spark, dir, "documents")
            .where(col("doc_id") % 10 < 8)
          // benchmark = the q379 fixture convention (doc_id % 25); its
          // gram set pins once, before the stream
          val bg = graft.Decontaminate.benchGramSet(
            Tables.t(spark, dir, "documents").where(col("doc_id") % 25 === 0),
            col("text"), n = 5).localCheckpoint()
          val out = IngestStreams.dedupLoop(spark,
            corpus, Seq(day1, day2), name, killBetweenDays = false,
            prep = df => graft.Dedup.exact(
              graft.Decontaminate.decontaminateAgainst(
                df.where(graft.TextAnalysis.langId(col("text")) === lit("en") &&
                  round(graft.TextAnalysis.qualityScore(col("text")), 4) >= 0.5),
                col("text"), col("doc_id"),
                df.sparkSession.createDataFrame(bg.rdd, bg.schema), n = 5),
              col("text"), col("doc_id")),
            batchSeconds = Some(buf), survRows = Some(wrote))
          out.count()
        case "lex" | "lexstats" =>
          val corpus = Tables.t(spark, dir, "documents")
            .where(col("doc_id") % 10 < 8)
          IngestStreams.lexicalLoop(spark, corpus, Seq(day1, day2), name,
            maintainStats = mode == "lexstats", killBetweenDays = false,
            batchSeconds = Some(buf), appendRows = Some(wrote)).count()
          graft.VStage.load(spark,
            name + (if (mode == "lexstats") "_stats" else "_idx"),
            refresh = true).count()
        case other => sys.error(s"unknown mode $other")
      }
      val total = (System.nanoTime() - t0) / 1e9
      val (w1, w2) =
        (wrote.lift(0).map(_.toString).getOrElse("-"),
          wrote.lift(1).map(_.toString).getOrElse("-"))
      println(f"$tag%-8s $mode%-8s ${total - buf.sum}%8.2f " +
        f"${buf(0)}%9.2f ${buf(1)}%9.2f $w1%9s $w2%9s $stateRows%11d")
    }
    modes.foreach(m => run("warmup", src, m))
    dirs.foreach { case (tag, dir) => modes.foreach(m => run(tag, dir, m)) }
    spark.stop()
  }
}
