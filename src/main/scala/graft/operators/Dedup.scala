package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Exact, MinHash+LSH, SimHash, and n-gram-Jaccard near-dup — each shaped so
  * the expensive comparison only happens *within* a bucket/band join, never
  * all-pairs: at 100 TB the candidate-pair count, not the hash computation,
  * is what kills a job. All hashing is md5-derived (available identically in
  * Spark and DuckDB) so results stay oracle-checkable.
  */
object Dedup {
  /** Shared 60-bit token/shingle hash: md5 hex prefix -> long. Identical in
    * DuckDB as ('0x' || substr(md5(s),1,15))::BIGINT — keeps LSH signatures
    * oracle-reproducible. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** 28-bit variant for MinHash permutations: (a*x + b) stays far below
    * 2^63, so Spark (wrapping) and DuckDB (overflow-raising) compute the
    * identical value. */
  def hash28(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 7), 16, 10).cast("long")

  /** Exact dedup: keep the min-id row per distinct content hash.
    * Deterministic (dropDuplicates keeps an arbitrary row — useless under an
    * oracle). Two hash-aggregations + a semi join, all on the same key, so
    * AQE plans one shuffle of (hash, id) pairs — no full-row shuffle. */
  def exact(df: DataFrame, content: Column, id: Column): DataFrame = {
    val keep = df
      .groupBy(md5(content.cast("binary")).as("__h"))
      .agg(min(id).as("__keep_id"))
      .select(col("__keep_id"))
    df.join(keep, id === col("__keep_id"), "left_semi")
  }

  /** Word shingles of size k from a whitespace-tokenized text column. */
  def shingles(text: Column, k: Int): Column = {
    val toks = split(text, " ")
    // sliding window over start indices; [] for docs shorter than k tokens
    // (guard matters: sequence(0, n-k) runs DESCENDING when n < k)
    array_distinct(when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array().cast("array<string>")))
  }

  /** MinHash signature: for permutation i, h_i(x) = (a_i*x + b_i) mod p over
    * hash28 shingle values; signature element = min over shingles. Emitted as
    * array<long> of length `numPerm`. p = 2^31-1; x < 2^28 and a <= 2n+1 keep
    * a*x+b well inside int64 for both engines. */
  val MinhashPrime: Long = 2147483647L // 2^31 - 1
  def minhashParams(numPerm: Int): Seq[(Long, Long)] =
    (1 to numPerm).map(i => (2L * i + 1L, 7919L * i))

  def minhashSignature(shingleHashes: Column, numPerm: Int): Column = {
    val perms = minhashParams(numPerm)
    array(perms.map { case (a, b) =>
      array_min(transform(shingleHashes,
        x => pmod(x * lit(a) + lit(b), lit(MinhashPrime))))
    }: _*)
  }

  /** MinHash+LSH near-dup candidate pairs: signature is cut into `bands`
    * bands of `rowsPerBand`; documents sharing any band hash become a
    * candidate pair (the classic banding scheme). Join key = (band index,
    * band content) so comparisons stay within buckets. Returns
    * (id_a, id_b, n_shared_bands) with id_a < id_b. */
  def minhashCandidates(df: DataFrame, text: Column, id: Column,
                        shingleSize: Int = 3, numPerm: Int = 16,
                        bands: Int = 4): DataFrame = {
    require(numPerm % bands == 0, "numPerm must divide into bands")
    val rowsPerBand = numPerm / bands
    val sig = df
      .select(id.as("__id"),
        minhashSignature(transform(shingles(text, shingleSize), hash28 _), numPerm).as("__sig"))
      .where(size(col("__sig")) > 0)
    val banded = sig.select(col("__id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => slice(col("__sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
      .select(col("__id"), col("pos").as("__band"), col("col").cast("string").as("__bucket"))
    val a = banded.select(col("__band"), col("__bucket"), col("__id").as("id_a"))
    val b = banded.select(col("__band"), col("__bucket"), col("__id").as("id_b"))
    a.join(b, Seq("__band", "__bucket"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** SimHash: 64-bit signature where bit j is set iff the sum over tokens of
    * sign(bit j of token-hash) is positive. Near-dups = pairs with small
    * Hamming distance. Pure expression fold over 64 bit positions. */
  def simhash(text: Column): Column = {
    val tokHashes = transform(split(text, " "), hash60 _)
    val bitCols = (0 until 60).map { j =>
      val votes = aggregate(tokHashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
      when(votes > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bitCols.reduce(_.bitwiseOR(_))
  }

  /** SimHash near-dup pairs within a blocking key (e.g. source), keeping
    * pairs with Hamming distance <= maxDist. Blocking bounds the quadratic
    * comparison; at scale, block on bit-prefix of the signature instead. */
  def simhashNearDup(df: DataFrame, text: Column, id: Column, block: Column,
                     maxDist: Int = 8): DataFrame = {
    val sigs = df.select(id.as("__id"), block.as("__blk"), simhash(text).as("__sig"))
    val a = sigs.select(col("__blk"), col("__id").as("id_a"), col("__sig").as("sig_a"))
    val b = sigs.select(col("__blk"), col("__id").as("id_b"), col("__sig").as("sig_b"))
    a.join(b, Seq("__blk"))
      .where(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .where(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }

  /** Token-set (n-gram) Jaccard similarity between two token-array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** n-gram Jaccard near-dup pairs within a blocking key, threshold >= minJ.
    * Distinct word n-grams as the set; blocking (not all-pairs) is the
    * scale-out story, as with simhash. */
  def ngramJaccardPairs(df: DataFrame, text: Column, id: Column, block: Column,
                        n: Int = 1, minJ: Double = 0.6): DataFrame = {
    val grams = if (n == 1) array_distinct(split(text, " ")) else shingles(text, n)
    val t = df.select(id.as("__id"), block.as("__blk"), grams.as("__g"))
    val a = t.select(col("__blk"), col("__id").as("id_a"), col("__g").as("g_a"))
    val b = t.select(col("__blk"), col("__id").as("id_b"), col("__g").as("g_b"))
    a.join(b, Seq("__blk"))
      .where(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccard(col("g_a"), col("g_b")))
      .where(col("jaccard") >= minJ)
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding-cosine near-dup pairs within a blocking key. The threshold is
    * applied to the ROUNDED similarity (4 dp) so engines whose raw floating
    * sums differ in the last ulps agree on the boundary set. */
  def embeddingNearDup(df: DataFrame, emb: Column, id: Column, block: Column,
                       minCos: Double): DataFrame = {
    val t = df.select(id.as("__id"), block.as("__blk"), emb.cast("array<double>").as("__e"))
    val a = t.select(col("__blk"), col("__id").as("id_a"), col("__e").as("e_a"))
    val b = t.select(col("__blk"), col("__id").as("id_b"), col("__e").as("e_b"))
    a.join(b, Seq("__blk"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(Similarity.cosine(col("e_a"), col("e_b")), 4))
      .where(col("cos_sim") >= minCos)
      .select("id_a", "id_b", "cos_sim")
  }
}
