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

  /** One row per contaminated document: (doc_id, n_shared) where n_shared
    * counts the distinct word n-grams the document shares with ANY
    * benchmark document. Default n = 5: long enough that chance overlap
    * vanishes and only true (near-)copies of benchmark text match. */
  def overlaps(df: DataFrame, text: Column, id: Column,
               bench: DataFrame, benchText: Column, n: Int = 5): DataFrame = {
    val bg = bench.select(explode(gramHashes(benchText, n)).as("__h")).distinct()
    // spread the raw (id, text) rows before shingling: a small corpus often
    // arrives as one file split, and the shingle+explode+probe work — the
    // whole cost of this operator — would otherwise run in a single task
    val parallelism = df.sparkSession.sessionState.conf.numShufflePartitions
    df.select(id.as("doc_id"), text.as("__txt"))
      .repartition(parallelism, col("doc_id"))
      .select(col("doc_id"), explode(gramHashes(col("__txt"), n)).as("__h"))
      .join(broadcast(bg), "__h")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
  }

  /** The corpus minus every document [[overlaps]] flags (left-anti). */
  def decontaminate(df: DataFrame, text: Column, id: Column,
                    bench: DataFrame, benchText: Column, n: Int = 5): DataFrame =
    df.join(overlaps(df, text, id, bench, benchText, n).select(col("doc_id").as("__cid")),
      id === col("__cid"), "left_anti")
}
