package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * All pure `Column` expression trees (whole-stage-codegen friendly, no
  * UDFs) and deliberately restricted to constructs with identical semantics
  * in DuckDB so every operator stays oracle-checkable.
  */
object TextAnalysis {
  /** Tiny per-language stopword lists for the n-gram/stopword heuristic
    * language identifier. Chosen to be discriminative among the fixture
    * languages; a production list would be much larger — the *shape*
    * (array_intersect against a broadcast literal list) is what scales. */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "with", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "pour", "dans", "avec"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "für", "ein", "zu"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "这", "也"))

  private def toks(text: Column): Column = split(text, " ")

  /** Language-ID: per-language stopword hit-rate; argmax with deterministic
    * tie-break on language code; "und" (undetermined) when nothing matches.
    *
    * Computed by the native single-pass expression
    * ([[org.apache.spark.sql.graft.LangIdSig]]) — the composable Column
    * tree ([[langIdCols]]) re-evaluates `split`/`array_distinct` per
    * reference inside Filter predicates (no CSE in FilterExec), which
    * made the language+quality gate ~160 µs/doc (r13 measurement);
    * bit-equality is pinned in TextGateParitySpec. */
  def langId(text: Column): Column =
    org.apache.spark.sql.graft.TextGateExprs.langId(text)

  /** Composable-pipeline spelling of [[langId]] — the cross-
    * implementation reference the parity pin compares the native
    * expression against. */
  def langIdCols(text: Column): Column = {
    val t = toks(text)
    // build (lang, score) pairs ordered so max_by is deterministic:
    // score desc, then lang asc — encode as struct(score, negLang) and use array_max
    val scored = Stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      val hits = size(array_intersect(array_distinct(t),
        array(words.map(lit): _*))).cast("double")
      struct((hits / size(array_distinct(t))).as("score"), lit(lang).as("lang"))
    }
    // array_max on struct: compares score first, then lang lexically — ties
    // resolve to the lexically greatest lang; make deterministic + stable
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Quality score in [0,1]: blend of length band, mean token length band,
    * type-token ratio, and stopword presence — the standard cheap heuristics
    * (length/punct/stopword ratios) used for pretraining-data filtering.
    *
    * Native single-pass expression
    * ([[org.apache.spark.sql.graft.QualityScoreSig]]); see [[langId]] —
    * bit-equality with [[qualityScoreCols]] pinned in
    * TextGateParitySpec. */
  def qualityScore(text: Column): Column =
    org.apache.spark.sql.graft.TextGateExprs.qualityScore(text)

  /** Composable-pipeline spelling of [[qualityScore]] (parity-pin
    * reference). */
  def qualityScoreCols(text: Column): Column = {
    val t = toks(text)
    val nTok = size(t).cast("double")
    val nChar = length(text).cast("double")
    val meanTokLen = (nChar - (nTok - 1)) / nTok // chars minus separators
    val ttr = size(array_distinct(t)).cast("double") / nTok
    val allStop = array(Stopwords.values.flatten.toSeq.distinct.sorted.map(lit): _*)
    val stopRatio = size(array_intersect(array_distinct(t), allStop)).cast("double") /
      size(array_distinct(t))
    val lenOk = when(nTok >= 10 && nTok <= 1000, lit(1d))
      .otherwise(least(nTok / 10, lit(1d)))
    val tokLenOk = when(meanTokLen >= 2 && meanTokLen <= 12, lit(1d)).otherwise(lit(0.5))
    lenOk * 0.3 + tokLenOk * 0.2 + least(ttr * 2, lit(1d)) * 0.3 +
      least(stopRatio * 5, lit(1d)) * 0.2
  }

  /** Gopher-style rule-based quality flags (Rae et al. 2021 §A1.1
    * heuristics) as 0/1 ints: token-count band, mean-token-length band,
    * max single-token share and max bigram share (within-document
    * repetition), and a minimum distinct-stopword count. Band thresholds
    * are adapted to the fixture corpus's ~50-word vocabulary; production
    * swaps in Gopher's published numbers — the SHAPE is what scales.
    *
    * Pure per-row expression tree, LINEAR per doc: the repetition maxima
    * are sort + one-pass max-run-length aggregates, NOT the naive
    * `transform(distinct(t), w -> size(filter(t, x = w)))` nesting. That
    * nesting is quadratic AND re-evaluates the inner array expression
    * (split / bigram construction) once per outer lambda element —
    * higher-order-function arguments are not cached across lambda
    * invocations — which cost 172 s on 5,000 single-task rows at sf0.1
    * before this rewrite (BENCH r4 probe). Here every array is built once
    * and folded once; no explode, no shuffle — the filter stays a narrow
    * map at any corpus size. */
  def gopherRules(text: Column): Column = {
    val t = toks(text)
    val nTok = size(t).cast("double")
    val meanTokLen = (length(text).cast("double") - (nTok - 1)) / nTok
    val maxTokShare = maxRunCount(t).cast("double") / nTok
    // zip_with evaluates each slice argument ONCE; the index-lambda form
    // (transform(sequence(...), i -> slice(t, i+1, 2))) re-evaluates the
    // whole split() subtree per element
    val bi = when(size(t) >= 2,
      zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(array().cast("array<string>"))
    val maxBiShare = when(size(t) >= 2,
      maxRunCount(bi).cast("double") / (nTok - 1))
      .otherwise(lit(0d))
    val allStop = array(Stopwords.values.flatten.toSeq.distinct.sorted.map(lit): _*)
    val stopHits = size(array_intersect(array_distinct(t), allStop))
    struct(
      (nTok >= 20 && nTok <= 90).cast("int").as("len_ok"),
      (meanTokLen >= 3 && meanTokLen <= 10).cast("int").as("mtl_ok"),
      (maxTokShare <= 0.15).cast("int").as("rep_tok_ok"),
      (maxBiShare <= 0.12).cast("int").as("rep_bi_ok"),
      (stopHits >= 2).cast("int").as("stop_ok"))
  }

  /** Duplicate n-gram fraction (the RefinedWeb/Gopher repetition-filter
    * family's remaining member): (total n-grams − distinct n-grams) /
    * total n-grams. High values flag documents built from repeated
    * phrases that per-token repetition ([[gopherRules]]' max-share rules)
    * can miss. Pure per-row array expression — arrays built once from
    * attributes, no explode, no shuffle. Returns 0 for docs with fewer
    * than n tokens. */
  /** Word n-grams from a token-array column, as a zip_with chain of
    * shifted slices: zip_with/slice ARGUMENTS are evaluated once per row —
    * the index-lambda spelling (transform(sequence(...), i ->
    * element_at(t, i+j))) re-evaluates the whole token subtree per element
    * (the q65 quadratic-HOF trap). Every slice is the same length
    * size−(n−1), only the start shifts: zip_with pads the shorter side
    * with nulls, so a longer slice would fabricate a spurious tail gram.
    * Docs with fewer than n tokens yield an empty array. */
  /** Encoding-health counters — the mojibake/binary-contamination gate
    * run before any text enters a corpus: control characters (C0 minus
    * tab/newline/CR — their presence means binary or transcoding
    * damage), non-ASCII characters (a rate, not a flag — high ratios on
    * a nominally-English source mean encoding drift), and U+FFFD
    * replacement characters (each one is a hard decode failure).
    * Counts via length-difference over a strip-all regexp_replace —
    * pure codegen expressions; the same RE2-and-Java-compatible
    * `\x`/`\x{…}` escapes run verbatim in DuckDB (with the 'g' flag). */
  val CtrlPattern = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"
  val NonAsciiPattern = "[^\\x00-\\x7F]"
  val ReplacementPattern = "\\x{FFFD}"

  /** Character count matched by `pattern` in `text` (0 on empty). */
  def patternCount(text: Column, pattern: String): Column =
    length(text) - length(regexp_replace(text, pattern, ""))

  def ngrams(t: Column, n: Int): Column = {
    require(n >= 1, "n must be positive")
    if (n == 1) t
    else when(size(t) >= n,
      (2 to n).foldLeft(slice(t, lit(1), size(t) - (n - 1))) { (acc, j) =>
        zip_with(acc, slice(t, lit(j), size(t) - (n - 1)),
          (a, b) => concat_ws(" ", a, b))
      }).otherwise(array().cast("array<string>"))
  }

  /** (grams − distinct grams) / grams from a MATERIALIZED gram-array
    * column; 0 for empty. Interpreted HOF expressions get no
    * common-subexpression elimination, so callers computing several
    * fractions should alias [[ngrams]] into attributes first — each gram
    * chain is then built once per row instead of once per reference. */
  def dupFractionFromGrams(g: Column): Column =
    when(size(g) > 0,
      Seal.ratio4c((size(g) - size(array_distinct(g))).cast("long"),
        size(g).cast("long")))
      .otherwise(lit(0d))

  /** Duplicate n-gram fraction (the RefinedWeb/Gopher repetition-filter
    * family's remaining member): high values flag documents built from
    * repeated phrases that per-token repetition ([[gopherRules]]' max-
    * share rules) can miss. Single-column convenience form; see
    * [[dupFractionFromGrams]] for the multi-n spelling. */
  def dupNgramFraction(text: Column, n: Int): Column =
    dupFractionFromGrams(ngrams(toks(text), n))

  /** Highest occurrence count of any element in a string array: sort, then
    * fold once tracking the current and best run length — O(n log n) and
    * each element visited exactly once (equal to the max of per-distinct-
    * element counts, without the quadratic nested-lambda spelling). Backed
    * by the codegen [[org.apache.spark.sql.graft.MaxRunCount]] expression;
    * the interpreted-lambda spelling survives as [[maxRunCountComposed]]
    * and the unit suite pins the two equal. */
  private def maxRunCount(arr: Column): Column =
    org.apache.spark.sql.graft.TextExprs.maxRunCount(arr)

  /** Reference spelling of [[maxRunCount]] via higher-order functions. */
  def maxRunCountComposed(arr: Column): Column =
    when(size(arr) > 0,
      aggregate(
        array_sort(arr),
        struct(lit(null).cast("string").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (acc, x) => {
          val run = when(x <=> acc.getField("prev"), acc.getField("run") + 1)
            .otherwise(lit(1L))
          struct(x.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"))
        },
        acc => acc.getField("best")))
      .otherwise(lit(0L))

  /** PII patterns — restricted to the regex subset with identical semantics
    * in Java regex (Spark codegen) and RE2 (DuckDB): explicit character
    * classes, bounded repetition, no lookaround/backreferences. */
  /** Dedup-grade text normalization: lowercase, strip everything outside
    * [a-z0-9 ], collapse whitespace runs, trim — the canonical form exact
    * dedup should key on so case/punctuation variants of the same content
    * collapse (the standard pre-dedup normalize in web-corpus pipelines).
    * Pure narrow codegen expression chain; mirror in SQL with the same
    * regexes (global-flag replace). */
  def normalizeForDedup(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Per-category PII match counts (computed on the ORIGINAL text — order
    * independent, unlike counting after partial redaction). */
  def piiCounts(text: Column): Column = struct(
    regexp_count(text, lit(EmailRe)).as("n_email"),
    regexp_count(text, lit(PhoneRe)).as("n_phone"),
    regexp_count(text, lit(Ipv4Re)).as("n_ip"))

  /** PII scrubbing for training corpora: replace emails / phone numbers /
    * IPv4 addresses with typed placeholder tokens. Email first: its local
    * part may contain digits and dots that the narrower patterns could
    * otherwise bite into; phone (dashed) and IPv4 (dotted) are disjoint.
    * Pure per-row `regexp_replace` chain — narrow map, no shuffle, linear
    * in corpus bytes at any scale. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Token counts: whitespace tokens and a BPE-ish segmentation
    * (letter runs / digit runs / single other chars), via regexp counting —
    * identical regex semantics in DuckDB's RE2 for these simple classes. */
  def whitespaceTokenCount(text: Column): Column = size(toks(text))
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))

  /** Document fingerprint: order-sensitive rolling hash over tokens.
    * Token value = ascii(first) * 131^2 + ascii(last) * 131 + length;
    * fold acc = (acc * 31 + tokval) mod 1e9+7. Equivalent DuckDB spelling
    * uses list_reduce — both engines fold left-to-right. Backed by the
    * codegen [[org.apache.spark.sql.graft.Fingerprint]] expression; the
    * interpreted-lambda spelling survives as [[fingerprintComposed]] and
    * the unit suite pins the two equal. */
  def fingerprint(text: Column): Column =
    org.apache.spark.sql.graft.TextExprs.fingerprint(toks(text))

  /** Reference spelling of [[fingerprint]] via higher-order functions. */
  def fingerprintComposed(text: Column): Column = {
    val tokVal = (t: Column) =>
      ascii(t.substr(lit(1), lit(1))) * lit(17161L) +
        ascii(t.substr(length(t), lit(1))) * lit(131L) + length(t)
    aggregate(toks(text), lit(0L),
      (acc, t) => pmod(acc * 31L + tokVal(t), lit(1000000007L)))
  }

  /** Flesch reading-ease inputs as a (words, sentences, syllables)
    * struct, engine-portable:
    *
    *   - words = whitespace-token count ([[whitespaceTokenCount]]);
    *   - sentences = count of `[.!?]`, clamped to ≥ 1 (a fragment is one
    *     sentence);
    *   - syllables ≈ vowel GROUPS: lower-case, collapse each `[aeiouy]+`
    *     run to a single `V` (no uppercase V survives lowering), count
    *     the V's — the standard heuristic, spelled as regexp_replace +
    *     length-difference so RE2 (DuckDB, 'g' flag) and Java regex
    *     agree ([[patternCount]]'s device: greedy single-class runs have
    *     identical semantics in both).
    *
    * Flesch = 206.835 − 1.015·(W/S) − 84.6·(Syl/W): compute from these
    * longs and quantize per doc before any cross-doc mean (see q231). */
  def fleschParts(text: Column): Column = {
    val collapsed = regexp_replace(lower(text), "[aeiouy]+", "V")
    struct(
      whitespaceTokenCount(text).cast("long").as("words"),
      greatest(lit(1L), patternCount(text, "[.!?]").cast("long"))
        .as("sentences"),
      (length(collapsed) - length(regexp_replace(collapsed, "V", "")))
        .cast("long").as("syllables"))
  }
}
