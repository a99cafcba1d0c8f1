package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: find (and drop)
  * documents that share a word n-gram with an evaluation/benchmark set —
  * the standard n-gram-overlap decontamination applied to pretraining
  * data before model training. Extension beyond the reference surface
  * (LLM-pipeline ops, SURVEY §2 extension block).
  *
  * Scale shape: a benchmark is SMALL by definition (eval suites, not
  * corpora), so its distinct-gram set builds once and broadcasts; the
  * corpus side is one narrow shingle+explode pass into a broadcast hash
  * join — the corpus never shuffles except the final per-doc count,
  * keyed by doc id. Grams are compared as 64-bit xxhash64 values (same
  * trade as [[Dedup.ngramJaccardPairs]]: long equality beats string
  * equality in the join probe, identical counts modulo ~1e-10/pair
  * collisions, and the hash needs no cross-engine twin since only
  * match COUNTS surface).
  */
object Decontaminate {
  /** Distinct-gram n-gram hash sets per side. */
  private def gramHashes(text: Column, n: Int): Column =
    array_distinct(transform(Dedup.shingles(text, n), g => xxhash64(g)))

  /** 10^(4h−4) as decimal(38,0) for h ∈ [1, maxH] — the varying-scale
    * divisor of [[bloomPlan]]'s inline pow4 seal (a literal CASE chain:
    * the exponent is data-dependent per row, but its domain is the tiny
    * hash-count spine). */
  private def tenPow4hMinus4(h: Column, maxH: Int): Column =
    (1 to maxH).foldLeft(lit(null).cast("decimal(38,0)")) { (acc, i) =>
      when(h === i,
        lit(new java.math.BigDecimal(java.math.BigInteger.TEN.pow(4 * i - 4)))
          .cast("decimal(38,0)")).otherwise(acc)
    }

  /** One row per contaminated document: (doc_id, n_shared) where n_shared
    * counts the distinct word n-grams the document shares with ANY
    * benchmark document. Default n = 5: long enough that chance overlap
    * vanishes and only true (near-)copies of benchmark text match. */
  def overlaps(df: DataFrame, text: Column, id: Column,
               bench: DataFrame, benchText: Column, n: Int = 5): DataFrame =
    overlapsAgainst(df, text, id, benchGramSet(bench, benchText, n), n)

  /** The benchmark side built ONCE: the distinct n-gram hash set as a
    * one-column (`__h`) frame. A STREAMING decontamination gate computes
    * (and pins) this before the stream starts so each micro-batch pays
    * O(batch) probe work — re-deriving it per trigger re-scans the whole
    * benchmark every micro-batch, which the 100× ingest probe showed
    * growing with benchmark size while the batch stays fixed. */
  def benchGramSet(bench: DataFrame, benchText: Column, n: Int = 5): DataFrame =
    bench.select(explode(gramHashes(benchText, n)).as("__h")).distinct()

  /** [[overlaps]] against a prebuilt [[benchGramSet]]. */
  def overlapsAgainst(df: DataFrame, text: Column, id: Column,
                      benchGrams: DataFrame, n: Int = 5): DataFrame = {
    // spread the raw (id, text) rows before shingling: a small corpus often
    // arrives as one file split, and the shingle+explode+probe work — the
    // whole cost of this operator — would otherwise run in a single task
    val parallelism = df.sparkSession.sessionState.conf.numShufflePartitions
    df.select(id.as("doc_id"), text.as("__txt"))
      .repartition(parallelism, col("doc_id"))
      .select(col("doc_id"), explode(gramHashes(col("__txt"), n)).as("__h"))
      .join(broadcast(benchGrams), "__h")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
  }

  /** Bloom-filter sizing table for the [[Dedup.bloomPassageHits]]
    * bitset — the measure-don't-guess companion the LSH family already
    * has (q334/q335): count the corpus's distinct k-token passages
    * (n — the keys the filter must hold), then tabulate, for every
    * (bits-per-key b × hash count h) candidate, the filter size m = n·b
    * and the standard false-positive rate (1 − e^(−h/b))^h, flagging
    * each b's information-optimal h* = round(b·ln 2). The row to pick
    * is the cheapest (m_bits, h) whose fpr clears the pipeline's
    * verify-join budget; q90's shipped 8-bits/key × 6-hash point reads
    * straight off this table.
    *
    * Determinism: n is an exact distinct count; −h/b and e^x are the
    * only transcendental steps and follow the q165 convention (both
    * engines quantize e^(−h/b) to a 1e-8 integer BEFORE the power —
    * double-sealed through the 1e-4 base — so a last-ulp libm
    * disagreement sits 4 decimal orders below the rounding boundary);
    * the power itself is an EXACT decimal(38,0) self-product of the
    * 1e-4 base (h ≤ 8 keeps (10⁴)⁸ inside 38 digits), sealed with the
    * pow4 device. h* = round(b·ln 2) uses the integer literal 693147/10⁶
    * — no runtime ln at all.
    *
    * Scale shape: one distinct-count aggregation over the passage
    * stream (the exact shuffle q64 already pays), then a literal b×h
    * spine cross-joined onto the 1-row count. */
  def bloomPlan(corpus: DataFrame, text: Column, k: Int = 10,
                bitsPerKey: Seq[Int] = Seq(8, 12, 16, 20),
                maxHashes: Int = 8): DataFrame = {
    require(k >= 1, "passage length k must be >= 1")
    require(bitsPerKey.nonEmpty && bitsPerKey.forall(_ >= 1),
      "bits/key must be >= 1")
    require(maxHashes >= 1 && maxHashes <= 8,
      "maxHashes in [1, 8]: (10^4)^h must stay inside decimal(38,0)")
    val t = split(text, " ")
    val nCh = floor(size(t) / k).cast("int")
    val chunks = when(nCh >= 1,
      transform(sequence(lit(0), nCh - 1),
        i => concat_ws(" ", slice(t, i * k + 1, lit(k)))))
      .otherwise(array().cast("array<string>"))
    val nKeys = corpus.select(explode(chunks).as("p"))
      .agg(countDistinct("p").as("n_keys"))
    val spine = nKeys.select(col("n_keys"),
        explode(array(bitsPerKey.distinct.sorted.map(lit(_)): _*)).as("b"))
      .select(col("n_keys"), col("b"),
        explode(sequence(lit(1), lit(maxHashes))).as("h"))
    val e8 = round(exp(-col("h").cast("double") / col("b").cast("double"))
      * lit(1e8), 0).cast("long")
    val base4 = org.apache.spark.sql.graft.VectorExprs.idiv(
      lit(2L) * (lit(100000000L) - e8) + lit(10000L), lit(20000L))
      .cast("decimal(38,0)")
    spine
      .withColumn("base4", base4)
      .withColumn("fprnum",
        (1 until maxHashes).foldLeft(col("base4")) { (acc, i) =>
          when(col("h") > i, acc * col("base4")).otherwise(acc)
        })
      .withColumn("hstar", org.apache.spark.sql.graft.VectorExprs.idiv(
        lit(2L) * col("b") * lit(693147L) + lit(1000000L),
        lit(2000000L)).cast("long"))
      .select(col("n_keys"), col("b").cast("long").as("bits_per_key"),
        col("h").cast("long").as("n_hashes"),
        (col("n_keys") * col("b")).as("m_bits"),
        // fpr = round(base4^h / 10^(4h), 4) — the pow4 seal, spelled
        // inline because the exponent varies by row: num already
        // carries scale 10^(4h); divide down to 4 dp half-up
        (org.apache.spark.sql.graft.VectorExprs.idiv(
          lit(2L).cast("decimal(38,0)") * col("fprnum") +
            tenPow4hMinus4(col("h"), maxHashes),
          lit(2L).cast("decimal(38,0)") * tenPow4hMinus4(col("h"), maxHashes))
          .cast("double") / lit(1e4)).as("fpr"),
        (col("h") === col("hstar")).as("is_optimal_h"))
      .orderBy("bits_per_key", "n_hashes")
  }

  /** The corpus minus every document [[overlaps]] flags (left-anti). */
  def decontaminate(df: DataFrame, text: Column, id: Column,
                    bench: DataFrame, benchText: Column, n: Int = 5): DataFrame =
    df.join(overlaps(df, text, id, bench, benchText, n).select(col("doc_id").as("__cid")),
      id === col("__cid"), "left_anti")

  /** [[decontaminate]] against a prebuilt [[benchGramSet]] — the
    * streaming-gate shape (build the set once, probe it per batch). */
  def decontaminateAgainst(df: DataFrame, text: Column, id: Column,
                           benchGrams: DataFrame, n: Int = 5): DataFrame =
    df.join(overlapsAgainst(df, text, id, benchGrams, n)
        .select(col("doc_id").as("__cid")),
      id === col("__cid"), "left_anti")
}
