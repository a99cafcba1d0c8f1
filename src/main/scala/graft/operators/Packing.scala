package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batches: lay documents end-to-end in a
  * deterministic order and cut the stream into fixed token-budget chunks
  * (GPT-style concat-then-split packing). A document belongs to the chunk
  * where it STARTS; chunk id = floor(tokens-before-this-doc / budget).
  *
  * Scale shape: packing runs WITHIN a shard key (source, shard id, date …),
  * never globally — the window cumsum partitions by shard, so parallelism
  * is the shard count and there is no global sort. One shuffle, keyed by
  * shard. Extension beyond the reference surface (LLM-pipeline ops).
  */
object Packing {
  /** Whitespace token count — the same cheap tokenizer the text-analysis
    * family uses ([[TextAnalysis]]); swap for a BPE count upstream if the
    * budget must be model-exact. */
  def tokenCount(text: Column): Column = size(split(text, " "))

  /** Per-document chunk assignment: (shard, id, n_tok, chunk_id). */
  def assignChunks(df: DataFrame, text: Column, id: Column, shard: Column,
                   budget: Int): DataFrame = {
    val w = Window.partitionBy("__shard").orderBy("__id")
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(shard.as("__shard"), id.as("__id"), tokenCount(text).as("n_tok"))
      .withColumn("__before", coalesce(sum("n_tok").over(w), lit(0L)))
      .withColumn("chunk_id", floor(col("__before") / budget))
      .select(col("__shard").as("shard"), col("__id").as("id"),
        col("n_tok"), col("chunk_id"))
  }

  /** Chunk-level rollup: docs and token totals per (shard, chunk). */
  def packChunks(df: DataFrame, text: Column, id: Column, shard: Column,
                 budget: Int): DataFrame =
    assignChunks(df, text, id, shard, budget)
      .groupBy("shard", "chunk_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
        min("id").as("first_id"), max("id").as("last_id"))

  /** Document-SPANNING packing — the GPT-pretraining flavor where a long
    * document crosses chunk boundaries instead of bloating the chunk it
    * starts in: doc spanning tokens [before, before+n) contributes the
    * sub-range [max(0, c·B − before), min(n, (c+1)·B − before)) to every
    * chunk c it overlaps. Every chunk except each shard's last holds
    * EXACTLY `budget` tokens (pinned in the unit suite). One row per
    * (doc, chunk) overlap — the explode multiplies rows only for docs
    * longer than the budget; same per-shard window shuffle as
    * [[assignChunks]]. */
  def assignSpans(df: DataFrame, text: Column, id: Column, shard: Column,
                  budget: Int): DataFrame = {
    val w = Window.partitionBy("__shard").orderBy("__id")
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(shard.as("__shard"), id.as("__id"), tokenCount(text).as("n_tok"))
      .withColumn("__before", coalesce(sum("n_tok").over(w), lit(0L)))
      .withColumn("chunk_id", explode(sequence(
        floor(col("__before") / budget),
        floor((col("__before") + col("n_tok") - 1) / budget))))
      .withColumn("tok_start",
        greatest(lit(0L), col("chunk_id") * budget - col("__before")))
      .withColumn("tok_end",
        least(col("n_tok").cast("long"), (col("chunk_id") + 1) * budget - col("__before")))
      .select(col("__shard").as("shard"), col("chunk_id"), col("__id").as("id"),
        col("tok_start"), col("tok_end"))
  }

  /** Chunk-level rollup of [[assignSpans]]: every chunk but each shard's
    * last totals exactly `budget` tokens. */
  def packSpans(df: DataFrame, text: Column, id: Column, shard: Column,
                budget: Int): DataFrame =
    assignSpans(df, text, id, shard, budget)
      .groupBy("shard", "chunk_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok_end") - col("tok_start")).as("n_tokens"),
        min("id").as("first_id"), max("id").as("last_id"))

  /** Sliding-window chunking with overlap — the context-window splitter
    * for long-document training/retrieval: each doc yields windows of
    * `size` tokens advancing by `stride` (< size ⇒ overlap size−stride).
    * The final window starts at the last multiple of stride strictly
    * before n, so every token is covered and short docs yield exactly one
    * (possibly short) chunk. Narrow per-row op: the token array is
    * materialized once as an attribute and each chunk is a `slice` of it —
    * one explode, no shuffle; chunking 100 TB is one scan. */
  def slidingChunks(df: DataFrame, text: Column, id: Column,
                    size: Int, stride: Int): DataFrame = {
    require(size >= 1 && stride >= 1 && stride <= size,
      s"need 1 <= stride <= size, got size=$size stride=$stride")
    val t = df.select(id.as("doc_id"), split(text, " ").as("__t"))
    val nChunks = greatest(
      ceil((org.apache.spark.sql.functions.size(col("__t")) - size)
        .cast("double") / stride).cast("long") + 1, lit(1L))
    t.select(col("doc_id"),
        posexplode(transform(sequence(lit(0L), nChunks - 1),
          i => array_join(slice(col("__t"), (i * stride + 1).cast("int"), lit(size)), " "))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        col("col").as("chunk_text"),
        org.apache.spark.sql.functions.size(split(col("col"), " ")).cast("long")
          .as("n_tokens"))
  }

  /** Padding-waste report for one-document-per-slot batching at a fixed
    * sequence length: per length band (token-count deciles of maxLen),
    * slots = Σ⌈tokens/L⌉, waste = slots·L − tokens, and the packing
    * efficiency tokens/(slots·L) — the number that justifies (or not)
    * building a real packer. Pure integer arithmetic per doc, one
    * band-keyed aggregation, efficiency sealed via [[Seal]]. Documents
    * longer than maxLen split into ⌈n/L⌉ slots (truncation-free). */
  /** Sequence-length budget sweep — the "measure, don't guess" readout
    * behind the [[packChunks]]/[[packSpans]]/[[paddingWaste]] budget
    * knob (the q334/q340/q341 calibration convention): for each
    * candidate budget, BOTH batching disciplines' efficiency from the
    * same corpus scan — one-doc-per-slot padding (slots = Σ⌈nt/b⌉,
    * efficiency = tokens/(slots·b), the [[paddingWaste]] model summed
    * over all bands) and concat-then-split span packing (chunks =
    * Σ_shards ⌈shard_tokens/b⌉, utilization = tokens/(chunks·b), the
    * [[packSpans]] model where only each shard's LAST chunk can pad).
    * The gap between the two columns at a given budget is exactly what
    * building a real packer buys.
    *
    * Scale shape: one doc-level pass exploded ×|budgets| (narrow) into
    * a budget-keyed agg, plus one shard-keyed agg (bounded by shard
    * count) re-exploded over the same budget spine — all sums exact
    * longs, both efficiency columns sealed via ratio4. */
  def packPlanEval(df: DataFrame, tokens: Column, shard: Column,
                   budgets: Seq[Long]): DataFrame = {
    require(budgets.nonEmpty && budgets.forall(_ >= 1),
      "budgets must be positive")
    val bSpine = array(budgets.map(lit): _*)
    val d = df.select(shard.as("sh"), tokens.cast("long").as("nt"))
      .where(col("sh").isNotNull && col("nt").isNotNull && col("nt") > 0)
    val perDoc = d.select(col("nt"), explode(bSpine).as("b"))
      .groupBy("b")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("tokens"),
        sum(expr("(nt + b - 1) div b")).as("slots"))
    val perShard = d.groupBy("sh").agg(sum("nt").as("st"))
      .select(col("st"), explode(bSpine).as("b"))
      .groupBy("b")
      .agg(sum(expr("(st + b - 1) div b")).as("chunks"))
    perDoc.join(perShard, Seq("b"))
      .select(col("b").as("budget"), col("n_docs"), col("tokens"),
        col("slots"),
        Seal.ratio4c(col("tokens"), col("slots") * col("b"))
          .as("pad_efficiency"),
        col("chunks"),
        Seal.ratio4c(col("tokens"), col("chunks") * col("b"))
          .as("span_utilization"))
      .orderBy("budget")
  }

  def paddingWaste(df: DataFrame, tokens: Column, maxLen: Long): DataFrame = {
    require(maxLen >= 1, "maxLen must be positive")
    val d = df.select(tokens.cast("long").as("nt"))
      .where(col("nt").isNotNull && col("nt") > 0)
      .withColumn("slots", expr(s"(nt + ${maxLen - 1}) div $maxLen"))
      .withColumn("band",
        least(expr(s"(nt * 10) div $maxLen"), lit(10L)))
    d.groupBy("band")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("tokens"),
        sum("slots").as("slots"))
      .withColumn("cap", col("slots") * lit(maxLen))
      .select(col("band"), col("n_docs"), col("tokens"), col("slots"),
        (col("cap") - col("tokens")).as("padding"),
        Seal.ratio4("tokens", "cap").as("efficiency"))
      .orderBy("band")
  }
}
