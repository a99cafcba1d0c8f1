package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus language-model statistics: unigram log-probability scoring (the
  * cheap perplexity proxy used as a pretraining quality filter) and PMI
  * collocation mining. Both are corpus-aggregate operators with the same
  * scale shape as [[Curate]]: ONE corpus-token shuffle builds a
  * vocabulary-sized statistics table that broadcasts back onto the token
  * stream — never a second corpus-wide shuffle.
  */
object LanguageModel {
  /** Per-document mean unigram log-probability — the standard "perplexity
    * proxy" quality score: score(d) = (1/|d|) · Σ_t ln p(t), with p(t) the
    * token's corpus relative frequency. Low scores mark documents made of
    * rare/garbage tokens; boilerplate scores artificially high — both ends
    * get clipped in a real curation recipe (the caller filters on the
    * score; this operator just computes it).
    *
    * Scale shape: one (term)-keyed shuffle for corpus counts (map-side
    * combinable), the vocabulary-sized count table broadcast back onto a
    * re-derived token stream, one (doc)-keyed shuffle for the per-doc sum.
    * In production the unigram table is an offline artifact like the ANN
    * codebook — scoring a new shard is then broadcast-join + one doc agg.
    *
    * Determinism: each token's ln p(t) is quantized to a fixed-point long
    * (round(ln(c/N)·1e6)) BEFORE the per-doc sum, so the aggregate is an
    * integer sum — order-independent at any document length, per the
    * integer-cents convention (FIXTURES.md). The final mean divides
    * identical integers in both engines. */
  def unigramLogprob(df: DataFrame, id: Column, text: Column): DataFrame = {
    val tok = df.select(id.as("doc_id"), explode(split(text, " ")).as("term"))
    val counts = tok.groupBy("term").agg(count(lit(1)).as("c"))
    val total = tok.agg(count(lit(1)).as("__n"))
    // the unigram table is vocabulary-sized (unbounded over open text):
    // no broadcast hint — AQE broadcasts while it fits, else shuffle-join
    tok.join(counts, "term")
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        round(log(col("c").cast("double") / col("__n")) * lit(1e6), 0)
          .cast("long").as("__lpq"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_tok"), sum("__lpq").as("slpq"))
      .withColumn("lden", col("n_tok") * lit(1000000L))
      .select(col("doc_id"), col("n_tok"),
        Seal.ratio4("slpq", "lden").as("avg_logprob"))
  }

  /** Top-k adjacent-bigram collocations by pointwise mutual information:
    * PMI(a,b) = ln( p(a,b) / (p(a)·p(b)) ) over ADJACENT token pairs,
    * restricted to pairs seen at least `minCount` times (PMI is noise at
    * low counts). The classic collocation detector ("new york"-style
    * multiword expressions) used to build tokenizer merge candidates and
    * corpus-drift reports.
    *
    *   PMI = ln( (c_ab · N_uni²) / (N_bi · c_a · c_b) )
    *
    * computed as one ln of a ratio of exact integer products, so both
    * engines evaluate the identical double. Scale shape: the bigram count
    * table is one (pair)-keyed corpus shuffle (map-side combinable); the
    * unigram table is vocabulary-sized and broadcast onto it twice (left
    * and right member); the final top-k is a TakeOrdered, never a global
    * sort. Rounded to 4 dp BEFORE ranking; (term_a, term_b) tie-break
    * makes the order total. */
  def pmiCollocations(df: DataFrame, text: Column, minCount: Long,
                      k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val toks = df.select(split(text, " ").as("__t"))
    val uni = toks.select(explode(col("__t")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
    val nUni = toks.select(sum(size(col("__t"))).cast("long").as("__nu"))
    // adjacent pairs via a 1-shifted zip of the token array: a narrow
    // per-row transform, so the only corpus shuffle is the pair count
    val bi = toks.select(explode(zip_with(
        slice(col("__t"), lit(1), greatest(size(col("__t")) - 1, lit(0))),
        slice(col("__t"), lit(2), greatest(size(col("__t")) - 1, lit(0))),
        (a, b) => struct(a.as("ta"), b.as("tb")))).as("p"))
      .select(col("p.ta").as("term_a"), col("p.tb").as("term_b"))
      .groupBy("term_a", "term_b").agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minCount)
    val nBi = toks.select(sum(greatest(size(col("__t")) - 1, lit(0)))
      .cast("long").as("__nb"))
    // the unigram table is vocabulary-sized: hint-free on both joins
    // (AQE decides; the bigram probe side is already post-minCount)
    bi.join(uni.withColumnRenamed("term", "term_a")
        .withColumnRenamed("c", "c_a"), "term_a")
      .join(uni.withColumnRenamed("term", "term_b")
        .withColumnRenamed("c", "c_b"), "term_b")
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
      // cast-then-multiply: the products stay exact doubles below 2^53
      // (ample at fixture scale; a 100 TB deployment moves to the
      // ln-decomposition ln c_ab + 2 ln N_u − ln N_b − ln c_a − ln c_b
      // before the exact-product bound breaks) and never overflow the
      // integer domain the way a long·long·long product would
      .select(col("term_a"), col("term_b"), col("c_ab"), col("c_a"), col("c_b"),
        round(log(col("c_ab").cast("double") * col("__nu") * col("__nu") /
          (col("__nb").cast("double") * col("c_a") * col("c_b"))), 4).as("pmi"))
      .orderBy(desc("pmi"), col("term_a"), col("term_b"))
      .limit(k)
  }

  /** Top adjacent character-pair counts inside whitespace tokens — the
    * statistic behind a BPE tokenizer's FIRST merge decision (Sennrich
    * 2016: the most frequent symbol pair becomes the first merge rule).
    * Tokens shorter than 2 chars carry no pair and are filtered on both
    * engines before the position explode.
    *
    * Scale shape: tokenize → per-token position explode (narrow; output
    * ≈ corpus character count) → ONE pair-keyed count shuffle (map-side
    * combinable: the pair alphabet is tiny) → top-k. Pure integer counts,
    * deterministic tie-break (count desc, pair asc). */
  /** Per-document bigram cross-entropy under the corpus's own add-1
    * (Laplace) smoothed bigram model: avg_logprob = mean ln P(w₂|w₁)
    * with P = (c(w₁w₂)+1)/(c(w₁·)+V), plus the perplexity exp(−avg) —
    * the model-based quality score next to [[unigramLogprob]]'s
    * unigram one (a doc of locally-coherent word PAIRS scores high even
    * when its unigrams are rare; boilerplate scores suspiciously high
    * on both — the classic pretraining-curation signal pair).
    *
    * c(w₁·) counts bigram STARTS (so probabilities sum to 1 over the
    * smoothed vocab by construction); V = distinct unigram count.
    * Determinism: counts are exact integers, each position's ln term is
    * quantized to a 1e-6 fixed-point long before the per-doc sum (q108
    * convention), one sealed division (+ an exp of that same sealed
    * ratio) per doc. Docs with < 2 tokens have no bigram and drop
    * (stated — LEFT join the doc table to densify).
    *
    * Scale: bigrams explode narrowly from the token array (zip_with —
    * no position self-join); the model tables are bigram/unigram-TYPE
    * sized and broadcast; the per-doc aggregation is the only
    * corpus-sized shuffle. A 100 TB corpus's bigram-type table may
    * outgrow a broadcast — swap the model joins to shuffle joins keyed
    * on w₁(,w₂); the shape is otherwise unchanged. */
  def bigramLogprob(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = df.select(id.as("doc_id"), split(text, " ").as("__t"))
    val bi = toks.select(col("doc_id"), explode(zip_with(
        slice(col("__t"), lit(1), greatest(size(col("__t")) - 1, lit(0))),
        slice(col("__t"), lit(2), greatest(size(col("__t")) - 1, lit(0))),
        (a, b) => struct(a.as("ta"), b.as("tb")))).as("p"))
      .select(col("doc_id"), col("p.ta").as("w1"), col("p.tb").as("w2"))
    val cb = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = bi.groupBy("w1").agg(count(lit(1)).as("cs"))
    val v = toks.select(explode(col("__t")).as("term"))
      .agg(countDistinct(col("term")).as("vv"))
    val lq = round(log((col("c12") + 1).cast("double") /
      (col("cs") + col("vv")).cast("double")) * lit(1e6), 0).cast("long")
    // model tables are bigram/unigram-TYPE sized (unbounded): hint-free
    // — this IS the documented 100 TB swap to shuffle joins keyed on
    // w1(,w2); AQE still broadcasts them at fixture scale
    bi.join(cb, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
      .select(col("doc_id"), lq.as("lq"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("lq").as("slq"))
      .withColumn("lden", col("n_bigrams") * lit(1000000L))
      .select(col("doc_id"), col("n_bigrams"),
        // integer-sealed mean (Seal); the perplexity exp stays a double
        // seal — transcendental, boundary-free
        Seal.ratio4("slq", "lden").as("avg_logprob"),
        round(exp(-col("slq").cast("double") /
          (lit(1e6) * col("n_bigrams").cast("double"))), 4).as("ppl"))
  }

  /** BPE tokenizer TRAINING (Sennrich et al. 2016, character-level):
    * learn `merges` merge rules by repeatedly fusing the corpus's most
    * frequent adjacent symbol pair. Returns the learned merge table —
    * (merge_idx, s1, s2, merged, pair_count) — the artifact a tokenizer
    * ships.
    *
    * Scale shape (the classic BPE device): training runs over the WORD
    * FREQUENCY table, never the corpus — one corpus scan + one
    * word-keyed shuffle builds (word, count), which is vocabulary-sized
    * (Zipf-sublinear in corpus bytes), and each merge iteration is then
    * a vocab-sized pair aggregate + a 1-row argmax collect (bounded by
    * contract) + a narrow fold re-write of the symbol arrays. At 100 TB
    * the corpus is touched exactly once.
    *
    * Merge application is LEFT-GREEDY, the reference BPE semantics: a
    * run of equal symbols merges at odd occurrences only ("aaaa" +
    * (a,a) → [aa, aa], never [aa, a, a]). The fold is a codegen
    * `aggregate` HOF with a (rebuilt, pending) accumulator — no UDF,
    * no shuffle. Argmax ties break (count desc, s1 asc, s2 asc),
    * deterministic in both engines (ASCII corpus). */
  def bpeTrain(df: DataFrame, text: Column, merges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (learned, words) = bpeTrainCore(df, text, merges)
    org.apache.spark.sql.graft.CheckpointUtils.unpersistCheckpoint(words)
    learned.toDF("merge_idx", "s1", "s2", "merged", "pair_count")
      .orderBy("merge_idx")
  }

  /** The [[bpeTrain]] loop, also returning the FINAL word-symbol table
    * (w, cnt, syms) — the post-merge subword segmentation per distinct
    * word, i.e. the trained tokenizer APPLIED to the whole vocabulary.
    * The caller owns the returned checkpoint. */
  /** The (word, char-symbols, count) vocabulary table every BPE path
    * starts from — ONE definition so training ([[bpeTrainCore]]) and
    * the stale-rule application ([[bpeDriftReport]]) can never diverge
    * on the tokenization convention (split char, length floor). */
  private def wordTable(df: DataFrame, text: Column): DataFrame =
    df.select(explode(split(text, " ")).as("w"))
      .where(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("w"), expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        .as("syms"), col("cnt"))

  private def bpeTrainCore(df: DataFrame, text: Column, merges: Int)
      : (Seq[(Int, String, String, String, Long)], DataFrame) = {
    var words = wordTable(df, text).localCheckpoint()
    val learned = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var m = 1
    var exhausted = false
    while (m <= merges && !exhausted) {
      val top = words
        .select(col("cnt"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("s1"), b.as("s2")))).as("p"))
        .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
        .agg(sum("cnt").as("c"))
        .orderBy(desc("c"), col("s1"), col("s2"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (s1, s2, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        learned += ((m, s1, s2, s1 + s2, c))
        val applied = words.withColumn("syms",
          applyMergeCol(col("syms"), s1, s2)).localCheckpoint()
        org.apache.spark.sql.graft.CheckpointUtils.unpersistCheckpoint(words)
        words = applied
        m += 1
      }
    }
    (learned.toSeq, words)
  }

  /** One LEFT-GREEDY merge rule applied to a symbol array: the
    * (rebuilt, pending) fold — a codegen `aggregate` HOF, no UDF, no
    * shuffle; symbols are never empty strings, so '' is a safe
    * no-pending sentinel. Shared by training ([[bpeTrainCore]]) and
    * the apply-learned-rules path ([[bpeApplyMerges]]). */
  private def applyMergeCol(syms: Column, s1: String, s2: String): Column =
    aggregate(
      syms,
      struct(expr("CAST(array() AS ARRAY<STRING>)").as("res"),
        lit("").as("pend")),
      (acc, x) => {
        val res = acc.getField("res")
        val pend = acc.getField("pend")
        when(pend === lit(""), struct(res.as("res"), x.as("pend")))
          .when(pend === lit(s1) && x === lit(s2),
            struct(concat(res, array(lit(s1 + s2))).as("res"),
              lit("").as("pend")))
          .otherwise(struct(concat(res, array(pend)).as("res"),
            x.as("pend")))
      },
      acc => when(acc.getField("pend") === lit(""), acc.getField("res"))
        .otherwise(concat(acc.getField("res"),
          array(acc.getField("pend")))))

  /** ALREADY-LEARNED merge rules applied in priority order to a word
    * table — the tokenizer-SERVING step [[bpeTrainCore]] never needs
    * (training segments its own vocabulary as a side effect) but
    * tokenizer MAINTENANCE does: q371 applies yesterday's rules to
    * today's grown vocabulary to measure drift. One fold per rule over
    * the vocab-sized table, checkpointed per step exactly like the
    * training loop (the plan would otherwise nest `merges` aggregate
    * HOFs). Caller frees the returned checkpoint. */
  private def bpeApplyMerges(words0: DataFrame,
                             rules: Seq[(String, String)]): DataFrame = {
    var words = words0.localCheckpoint()
    rules.foreach { case (s1, s2) =>
      val applied = words.withColumn("syms",
        applyMergeCol(col("syms"), s1, s2)).localCheckpoint()
      org.apache.spark.sql.graft.CheckpointUtils.unpersistCheckpoint(words)
      words = applied
    }
    words
  }

  /** Tokenizer DRIFT under corpus growth — the maintenance measurement
    * the dedup index (q364 compaction), the IVF codebook (q367
    * recluster), and the CC state (q368 fold) each already have: a
    * tokenizer trained on yesterday's corpus (`oldFilter`) keeps
    * getting served while the corpus grows, and its merges stop
    * fitting. Per source, this reports the STALE tokenizer's subword
    * count/compression on the grown corpus next to the RETRAINED
    * one's — the retrained column is the recompaction (a full retrain;
    * BPE merges don't compose incrementally, so unlike the other three
    * this maintenance op is periodic-rebuild by nature, which is
    * exactly why the drift number matters: it prices the rebuild).
    *
    * Scale shape: both trainings and the stale-rule application are
    * word-table-sized (Zipf-sublinear); the corpus is touched twice
    * (old-slice word table, full word table) plus the occurrence
    * explode the report joins — all one-pass, shuffle keyed by word. */
  def bpeDriftReport(df: DataFrame, text: Column, source: Column,
                     oldFilter: Column, merges: Int): DataFrame = {
    val (oldRules, wOldTrain) = bpeTrainCore(df.where(oldFilter), text, merges)
    org.apache.spark.sql.graft.CheckpointUtils.unpersistCheckpoint(wOldTrain)
    val stale = bpeApplyMerges(wordTable(df, text),
      oldRules.map { case (_, s1, s2, _, _) => (s1, s2) })
    val (_, retrained) = bpeTrainCore(df, text, merges)
    val sub = stale.select(col("w"), size(col("syms")).as("__ns_stale"))
      .join(retrained.select(col("w"), size(col("syms")).as("__ns_new")),
        Seq("w"))
    val occ = df.select(source.as("source"), explode(split(text, " ")).as("w"))
      .where(length(col("w")) >= 1)
    val report = occ.join(sub, Seq("w"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w")).cast("long")).as("n_chars"),
        sum(col("__ns_stale").cast("long")).as("n_sub_stale"),
        sum(col("__ns_new").cast("long")).as("n_sub_retrained"))
      .select(col("source"), col("n_words"), col("n_chars"),
        col("n_sub_stale"), col("n_sub_retrained"),
        Seal.ratio4("n_chars", "n_sub_stale").as("cps_stale"),
        Seal.ratio4("n_chars", "n_sub_retrained").as("cps_retrained"))
      .orderBy("source")
      .localCheckpoint() // source-cardinality-sized; frees the vocab tables
    Seq(stale, retrained).foreach(
      org.apache.spark.sql.graft.CheckpointUtils.unpersistCheckpoint)
    report
  }

  /** Tokenizer compression eval — [[bpeTrain]]'s merges APPLIED
    * corpus-wide: per source, the word-occurrence count, total
    * characters, total post-merge subwords, and the sealed
    * chars-per-subword compression ratio. The apply step is free —
    * training already segmented every DISTINCT word, so application is
    * one corpus word explode joined to the vocabulary-sized subword
    * table (word-keyed shuffle; Zipf-sublinear build side — the q146
    * documented contract, hint-free so the 100 TB plan is a shuffle
    * join and AQE still broadcasts it at fixture scale). */
  def bpeCompressionReport(df: DataFrame, text: Column, source: Column,
                           merges: Int): DataFrame = {
    val (_, words) = bpeTrainCore(df, text, merges)
    val sub = words.select(col("w"), size(col("syms")).as("__ns"))
    val occ = df.select(source.as("source"), explode(split(text, " ")).as("w"))
      .where(length(col("w")) >= 1)
    // the report is source-cardinality-sized: materialize it eagerly so
    // the vocab-sized words checkpoint can be freed (the bpeTrain
    // convention — otherwise every call leaks the word table's blocks
    // for the session lifetime)
    val report = occ.join(sub, Seq("w"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w")).cast("long")).as("n_chars"),
        sum(col("__ns").cast("long")).as("n_subwords"))
      .select(col("source"), col("n_words"), col("n_chars"),
        col("n_subwords"),
        Seal.ratio4("n_chars", "n_subwords").as("chars_per_subword"))
      .orderBy("source")
      .localCheckpoint()
    org.apache.spark.sql.graft.CheckpointUtils.unpersistCheckpoint(words)
    report
  }

  def bpePairCounts(df: DataFrame, text: Column, k: Int): DataFrame =
    df.select(explode(split(text, " ")).as("t"))
      .where(length(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("pair"))
      .limit(k)

  /** DSIR-style importance-resampling weights (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling",
    * simplified to unigram features): each document scores the average
    * per-token log-ratio of an add-1-smoothed TARGET unigram
    * distribution (docs where `isTarget`) to the CORPUS distribution —
    * the data-selection signal that up-weights documents that look
    * like the target domain. Returns the top-`k` by weight.
    *
    * Shape: one token explode, ONE vocab aggregation with conditional
    * target counts (no second corpus pass), a 1-row totals broadcast
    * onto the vocab-sized ratio table, then a term-keyed join back and
    * one per-doc aggregation — every shuffle is keyed, nothing is
    * corpus². Determinism: the log-ratio is quantized to 1e-6
    * fixed-point longs per TERM TYPE (the q108 device), so the per-doc
    * sum is exact integer; one sealed division at the end. */
  def dsirWeights(df: DataFrame, id: Column, text: Column,
                  isTarget: Column, k: Int): DataFrame = {
    val tok = df.select(id.as("doc_id"), isTarget.cast("long").as("tgt"),
      explode(split(text, " ")).as("term"))
    val vocab = tok.groupBy("term")
      .agg(count(lit(1)).as("c"), sum("tgt").as("ct"))
    val tots = vocab.agg(sum("c").as("n"), sum("ct").as("nt"),
      count(lit(1)).as("v"))
    val lr = vocab.crossJoin(broadcast(tots))
      .select(col("term"),
        round(log((col("ct") + 1).cast("double") / (col("nt") + col("v")) /
          ((col("c") + 1).cast("double") / (col("n") + col("v")))) *
          lit(1e6), 0).cast("long").as("lr6"))
    tok.join(lr, "term")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum("lr6").as("s6"))
      .withColumn("wden", col("n_tok") * lit(1000000L))
      .select(col("doc_id"), col("n_tok"),
        Seal.ratio4("s6", "wden").as("weight"))
      .orderBy(desc("weight"), col("doc_id"))
      .limit(k)
  }

  /** Per-source KL divergence from the corpus unigram distribution —
    * which sources speak a different language than the blend they feed?
    * Add-1 smoothing over the GLOBAL vocabulary on both sides, and the
    * per-source sum runs over the FULL vocab × source spine (absent
    * terms carry p = 1/(n_src+V) mass — dropping them would understate
    * divergence exactly for narrow sources). Each p·ln(p/q) term is
    * quantized to 1e-9 fixed-point (terms are tiny — 1e-6 would floor
    * most of the vocabulary to zero) before the exact per-source sum.
    * Spine size is vocab × |sources| — bounded by vocabulary growth,
    * not corpus rows. */
  def klPerSource(df: DataFrame, text: Column, group: Column): DataFrame = {
    val tok = df.select(group.as("src"), explode(split(text, " ")).as("t"))
      .where(col("src").isNotNull)
    val cells = tok.groupBy("src", "t").agg(count(lit(1)).as("c"))
    val vocab = cells.groupBy("t").agg(sum("c").as("tot"))
    val srcs = cells.groupBy(col("src").as("ksrc"))
      .agg(sum("c").as("nsrc"))
    val tots = vocab.agg(sum("tot").as("nn"), count(lit(1)).as("v"))
    val p = (coalesce(col("c"), lit(0L)) + 1).cast("double") /
      (col("nsrc") + col("v"))
    val q = (col("tot") + 1).cast("double") / (col("nn") + col("v"))
    vocab.as("vb").crossJoin(broadcast(srcs)).crossJoin(broadcast(tots))
      .join(cells.as("ce"),
        col("vb.t") === col("ce.t") && col("ksrc") === col("ce.src"),
        "left")
      .select(col("ksrc"), col("nsrc"),
        round(p * log(p / q) * lit(1e9), 0).cast("long").as("t9"))
      .groupBy("ksrc", "nsrc").agg(sum("t9").as("kl9"))
      .select(col("ksrc").as("source"), col("nsrc").as("n_tokens"),
        Seal.pow4("kl9", 9).as("kl_from_corpus"))
      .orderBy("source")
  }

  /** Dunning log-likelihood (G²) keyness: which terms are most
    * over/under-represented in the TARGET slice vs the rest of the
    * corpus — the statistically-grounded upgrade of raw tf-idf
    * contrast (G² ≈ 3.84 is p 0.05 at 1 df), the corpus-linguistics
    * standard for "what makes this slice sound like itself".
    *
    *   G² = 2·(a·ln(a/E_a) + b·ln(b/E_b)),
    *   E_a = N_T·(a+b)/N,  E_b = N_R·(a+b)/N
    *
    * One vocab aggregation with conditional target counts (no second
    * corpus pass); each term's G² is a fixed double expression over
    * exact longs (0·ln 0 terms drop via a>0/b>0 guards), ranked on the
    * ROUNDED statistic with a term tie-break so the top-k set is
    * engine-stable; direction compares a·N_R vs b·N_T in exact
    * integers. */
  def keynessG2(df: DataFrame, text: Column, isTarget: Column,
                k: Int): DataFrame = {
    val tok = df.select(isTarget.cast("long").as("tgt"),
      explode(split(text, " ")).as("t"))
    val vocab = tok.groupBy("t")
      .agg(sum("tgt").as("a"), sum(lit(1L) - col("tgt")).as("b"))
    val tots = vocab.agg(sum("a").as("nt"), sum("b").as("nr"))
    val ea = col("nt").cast("double") * (col("a") + col("b")) /
      (col("nt") + col("nr"))
    val eb = col("nr").cast("double") * (col("a") + col("b")) /
      (col("nt") + col("nr"))
    vocab.crossJoin(broadcast(tots))
      .select(col("t").as("term"), col("a"), col("b"),
        round(lit(2.0) *
          (when(col("a") > 0,
            col("a").cast("double") * log(col("a") / ea)).otherwise(0.0) +
          when(col("b") > 0,
            col("b").cast("double") * log(col("b") / eb)).otherwise(0.0)),
          4).as("g2"),
        when(col("a") * col("nr") > col("b") * col("nt"), "over")
          .otherwise("under").as("direction"))
      .orderBy(desc("g2"), col("term"))
      .limit(k)
  }

  /** Monroe-Colaresi-Quinn "fightin' words" log-odds with a Dirichlet
    * prior: per term,
    *
    *   δ = ln((a+α)/(N_T+αV−a−α)) − ln((b+α)/(N_R+αV−b−α)),
    *   z = δ/√(1/(a+α) + 1/(b+α))
    *
    * — the variance-normalized upgrade of raw keyness (G² rewards
    * frequency; this z-score surfaces mid-frequency words that are
    * GENUINELY lopsided). The α=0.01-per-type prior smooths the
    * zero-count side. One conditional vocab aggregation + a 1-row
    * totals broadcast; each term's z is a fixed double expression over
    * exact longs, top-k on the ROUNDED score with a term tie-break. */
  def logOddsPrior(df: DataFrame, text: Column, isTarget: Column,
                   k: Int, alpha: Double = 0.01): DataFrame = {
    val tok = df.select(isTarget.cast("long").as("tgt"),
      explode(split(text, " ")).as("t"))
    val vocab = tok.groupBy("t")
      .agg(sum("tgt").as("a"), sum(lit(1L) - col("tgt")).as("b"))
    val tots = vocab.agg(sum("a").as("nt"), sum("b").as("nr"),
      count(lit(1)).as("v"))
    val aa = col("a") + lit(alpha)
    val bb = col("b") + lit(alpha)
    val delta = log(aa / (col("nt") + lit(alpha) * col("v") - aa)) -
      log(bb / (col("nr") + lit(alpha) * col("v") - bb))
    val z = delta / sqrt(lit(1.0) / aa + lit(1.0) / bb)
    vocab.crossJoin(broadcast(tots))
      .select(col("t").as("term"), col("a"), col("b"),
        round(z, 4).as("z_log_odds"))
      .orderBy(desc("z_log_odds"), col("term"))
      .limit(k)
  }

  /** Church-Gale term burstiness: per term, the Fano factor of its
    * per-document count over ALL N documents (absent docs count 0 —
    * zero-fill by omission keeps Σx and Σx² untouched while N sits in
    * the formula) — bursty terms (F ≫ 1) cluster in few docs (topical
    * content words); F ≈ 1 terms sprinkle Poisson-like (function
    * words). The stopword-list-free content-word detector. One
    * (doc, term) aggregation + one term aggregation; F = (N·Σx²−S²)/
    * (N·S) exact integers to one division; top-k on the ROUNDED factor
    * with a term tie-break, `minDf` culling the unstable singletons. */
  def termBurstiness(df: DataFrame, id: Column, text: Column,
                     minDf: Long, k: Int): DataFrame = {
    val docs = df.select(id.as("doc_id"), text.as("tx"))
      .where(col("doc_id").isNotNull)
    val nDocs = docs.agg(count(lit(1)).as("nn"))
    val dt = docs.select(col("doc_id"),
        explode(split(col("tx"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    dt.groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("s"),
        sum(col("tf") * col("tf")).as("ss"))
      .where(col("df") >= minDf)
      .crossJoin(broadcast(nDocs))
      .withColumn("fnum", col("nn") * col("ss") - col("s") * col("s"))
      .withColumn("fden", nullif(col("nn") * col("s"), lit(0L)))
      .select(col("term"), col("df"), col("s").as("n_occurrences"),
        Seal.ratio4("fnum", "fden").as("fano"))
      .orderBy(desc("fano"), col("term"))
      .limit(k)
  }

  /** Per-document type novelty: the fraction of a document's DISTINCT
    * tokens that no lower-doc_id document contains — the freshness
    * curve a dataset builder watches to see when a crawl stops adding
    * vocabulary. One (gram → min doc_id) aggregation attributes each
    * type to its first document; a gram-keyed join back and one
    * per-doc count close it out. Novelty is one division of exact
    * counts, sealed round(,4). */
  def ngramNovelty(df: DataFrame, id: Column, text: Column): DataFrame = {
    val grams = df.select(id.as("doc_id"),
        explode(array_distinct(split(text, " "))).as("g"))
      .where(col("doc_id").isNotNull)
    val first = grams.groupBy("g").agg(min("doc_id").as("fd"))
    grams.join(first, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_types"),
        sum(when(col("fd") === col("doc_id"), 1L).otherwise(0L))
          .as("n_new"))
      .select(col("doc_id"), col("n_types"), col("n_new"),
        Seal.ratio4("n_new", "n_types").as("novelty"))
      .orderBy("doc_id")
  }

  /** Heaps'-law fit V(N) ≈ K·N^β over the doc_id-ordered corpus
    * prefix: cumulative token count N and cumulative distinct-type
    * count V per document (new types attributed to their min-doc_id
    * first appearance — the [[ngramNovelty]] device), then the
    * closed-form OLS of ln V on ln N with both logs quantized to
    * 1e-3 fixed-point longs so the power sums are exact (β unitless,
    * scales cancel; ln K recovers from the intercept / 1e3).
    * Cumulative windows run over the per-DOC table (doc-cardinality
    * rows, the KS convention). β ≈ 0.5–0.7 for natural text; a crawl
    * gone circular shows β collapsing. */
  def heapsLaw(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = df.select(id.as("doc_id"), split(text, " ").as("tk"))
      .where(col("doc_id").isNotNull)
      .select(col("doc_id"), size(col("tk")).cast("long").as("nt"),
        array_distinct(col("tk")).as("dk"))
    val newTypes = toks.select(col("doc_id"), explode(col("dk")).as("g"))
      .groupBy("g").agg(min("doc_id").as("fd"))
      .groupBy(col("fd").as("doc_id")).agg(count(lit(1)).as("nv"))
    // both running sums in ONE distributed-prefix pass (Ranked device)
    // instead of a single-partition cumulative window over the corpus
    val pts = Ranked.withPrefix(
        toks.select(col("doc_id"), col("nt"))
          .join(newTypes, Seq("doc_id"), "left")
          .select(col("doc_id"), col("nt"),
            coalesce(col("nv"), lit(0L)).as("nv")),
        Seq(col("doc_id")), Seq(col("nt") -> "bn", col("nv") -> "bv"))
      .where(col("bn") > 0 && col("bv") > 0)
      .select(round(log(col("bn").cast("double")) * lit(1e3), 0)
          .cast("long").as("x"),
        round(log(col("bv").cast("double")) * lit(1e3), 0)
          .cast("long").as("y"))
    pts.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n").as("n_docs"),
        round((col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double") /
          nullif((col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("double"), lit(0.0)), 4).as("beta"),
        // sy·sxx would overflow Long at corpus scale (ln-sums × power
        // sums) — take the products in double (exact-integer-valued
        // inputs, single IEEE ops, mirrored in the oracle)
        round((col("sy").cast("double") * col("sxx") -
          col("sx").cast("double") * col("sxy")) /
          nullif((col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("double"), lit(0.0)) / lit(1e3), 4).as("ln_k"))
  }

  /** Multinomial naive-Bayes classification of documents into the
    * classes observed on `cls`, reported as a confusion matrix
    * (true class, predicted class, doc count) — train-on-all /
    * classify-all, the self-consistency readout a corpus-labelling
    * pipeline uses to sanity-check its labels.
    *
    * Model: p(term|c) add-1 smoothed over the GLOBAL vocabulary, class
    * priors from doc counts. The (vocab × classes) likelihood matrix is
    * built explicitly (classes are few; vocab-keyed LEFT join supplies
    * the zero-count smoothing terms), each log quantized to 1e-6
    * fixed-point, so per-doc class scores are exact integer sums and
    * the argmax can never be a float coin-flip; prediction ties break
    * to the lexicographically smaller class via the per-doc
    * row_number window (≤ |classes| rows per doc). */
  def naiveBayesClassify(df: DataFrame, id: Column, text: Column,
                         cls: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scores = nbScores(df, id, text, cls)
    val w = Window.partitionBy("doc_id")
      .orderBy(desc("sc6"), col("cand"))
    scores.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .groupBy(col("true_cls").as("lang"), col("cand").as("pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "pred")
  }

  /** Shared NB scoring table (doc_id, true_cls, cand, sc6) — the
    * integer class scores [[naiveBayesClassify]] argmaxes and
    * [[naiveBayesMargins]] differences. */
  private def nbScores(df: DataFrame, id: Column, text: Column,
                       cls: Column): DataFrame = {
    val docs = df.select(id.as("doc_id"), cls.as("cls"), text.as("text"))
      .where(col("doc_id").isNotNull && col("cls").isNotNull &&
        col("text").isNotNull)
    val tok = docs.select(col("doc_id"), col("cls"),
      explode(split(col("text"), " ")).as("term"))
    val dtc = tok.groupBy("doc_id", "cls", "term")
      .agg(count(lit(1)).as("cnt"))
    val model = tok.groupBy(col("cls").as("mcls"), col("term"))
      .agg(count(lit(1)).as("c"))
    val nc = model.groupBy(col("mcls").as("cand")).agg(sum("c").as("ncls"))
    val vb = tok.select("term").distinct()
    val vv = vb.agg(count(lit(1)).as("v"))
    val priors = docs.groupBy(col("cls").as("pcls"))
      .agg(count(lit(1)).as("nd"))
    val ndocs = docs.agg(count(lit(1)).as("ndocs"))
    val vbA = vb.as("vb")
    val matrix = vbA.crossJoin(broadcast(nc)).crossJoin(broadcast(vv))
      .join(model.as("m"),
        col("vb.term") === col("m.term") && col("cand") === col("m.mcls"),
        "left")
      .select(col("vb.term").as("term"), col("cand"),
        round(log((coalesce(col("c"), lit(0L)) + 1).cast("double") /
          (col("ncls") + col("v"))) * lit(1e6), 0).cast("long").as("lp6"))
    val scores = dtc.join(matrix, "term")
      .groupBy(col("doc_id"), col("cls").as("true_cls"), col("cand"))
      .agg(sum(col("cnt") * col("lp6")).as("s6"))
      .join(broadcast(priors), col("cand") === col("pcls"))
      .crossJoin(broadcast(ndocs))
      .select(col("doc_id"), col("true_cls"), col("cand"),
        (col("s6") + round(log(col("nd").cast("double") / col("ndocs")) *
          lit(1e6), 0).cast("long")).as("sc6"))
    scores
  }

  /** Classifier-confidence margins: per document, the 1e-6 fixed-point
    * gap between the best and second-best NB class scores, bucketed
    * into 5-nat bands (capped at 5) and tallied per TRUE class — the
    * "how sure was the labeller" histogram that tells a curator which
    * language slices carry ambiguous labels. Shares [[nbScores]];
    * margins are exact long differences (score ties give margin 0),
    * shares one division per (lang, bucket) row. */
  def naiveBayesMargins(df: DataFrame, id: Column, text: Column,
                        cls: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id")
      .orderBy(desc("sc6"), col("cand"))
    val top2 = nbScores(df, id, text, cls)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2)
      .groupBy("doc_id", "true_cls")
      .agg(max(when(col("rn") === 1, col("sc6"))).as("s1"),
        max(when(col("rn") === 2, col("sc6"))).as("s2"))
      .where(col("s2").isNotNull)
      // margins are non-negative, so double-division + long cast is
      // exact floor division (matching the oracle's integer `//`)
      .select(col("true_cls"),
        least(((col("s1") - col("s2")) / lit(5000000L)).cast("long"),
          lit(5L)).as("bucket"))
    val tot = top2.groupBy(col("true_cls").as("tcls"))
      .agg(count(lit(1)).as("n_lang"))
    top2.groupBy("true_cls", "bucket").agg(count(lit(1)).as("n_docs"))
      .join(broadcast(tot), col("true_cls") === col("tcls"))
      .select(col("true_cls").as("lang"), col("bucket"), col("n_docs"),
        Seal.ratio4("n_docs", "n_lang").as("share"))
      .orderBy("lang", "bucket")
  }
}
