package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorical feature encoding for model training — the step between a
  * curated corpus/fact table and a trainable design matrix. Encodings are
  * computed as compact per-category MAPS (broadcast-joinable onto the raw
  * rows at apply time), never as materialized per-row columns: at 100 TB
  * the map is kilobytes while the encoded table is the dataset again.
  *
  * Same oracle discipline as the rest of the inventory (FIXTURES.md):
  * every cross-row sum is integer, each statistic ends in ONE sealed
  * `round(,4)` division.
  */
object Encode {

  /** Leave-one-out target encoding with additive smoothing for a BINARY
    * target — the leakage-aware replacement for naive mean encoding
    * (naive: a category's own row contributes its own label; LOO: row i
    * sees (Σy − yᵢ + m·prior)/(n − 1 + m), so memorizing singleton
    * categories is impossible; smoothing weight `m` pulls rare categories
    * toward the global prior).
    *
    * Key observation that makes this a MAP, not a per-row pass: for a
    * binary target the LOO encoding takes at most TWO distinct values per
    * category — one for its positive rows, one for its negatives. So the
    * complete encoding artifact is (category → enc_pos, enc_neg), built
    * from two hash aggregations; applying it is a broadcast join plus a
    * 2-way CASE. A 100 TB corpus never shuffles.
    *
    * Exact rationals, no double accumulation: with per-category (n, Σy)
    * and global (gn, gs), prior = gs/gn and
    *   enc(y) = ((Σy − y)·gn + m·gs) / ((n − 1 + m)·gn)
    * — all-long numerator/denominator, ONE sealed round(,4) division per
    * statistic. `enc_pos` is NULL for all-negative categories (no
    * positive row exists to encode), `enc_neg` NULL for all-positive.
    * `avg_enc` = mean LOO encoding over the category's rows
    * = ((n−1)·Σy·gn + n·m·gs) / (n·(n−1+m)·gn), the training-time sanity
    * readout (≈ smoothed category rate). Categories of n=1 with m=0
    * would divide by zero — `m ≥ 1` is required (and is the point of
    * smoothing). Null categories/targets are dropped (the family
    * convention). */
  def targetEncodingLoo(df: DataFrame, category: Column, target: Column,
                        m: Long): DataFrame = {
    require(m >= 1, "smoothing m must be >= 1 (m=0 breaks singleton categories)")
    val rows = df.select(category.as("cat"), target.cast("long").as("y"))
      .where(col("cat").isNotNull && col("y").isNotNull)
    val per = rows.groupBy("cat")
      .agg(count(lit(1)).as("n"), sum("y").as("sy"))
    val glob = rows.agg(count(lit(1)).as("gn"), sum("y").as("gs"))
    def enc(yv: Int) = {
      val num = (col("sy") - lit(yv.toLong)) * col("gn") + lit(m) * col("gs")
      val den = (col("n") - 1 + lit(m)) * col("gn")
      Seal.ratio4c(num, den)
    }
    per.crossJoin(broadcast(glob)) // 1-row global build side
      .select(col("cat"), col("n"), col("sy").as("pos"),
        when(col("sy") > 0, enc(1)).as("enc_pos"),
        when(col("sy") < col("n"), enc(0)).as("enc_neg"),
        Seal.ratio4c((col("n") - 1) * col("sy") * col("gn") +
            col("n") * lit(m) * col("gs"),
          col("n") * (col("n") - 1 + lit(m)) * col("gn")).as("avg_enc"))
      .orderBy("cat")
  }

  /** Feature hashing (the "hashing trick", Weinberger et al. 2009):
    * project an unbounded token vocabulary onto `buckets` fixed feature
    * slots via bucket = hash(token) mod buckets — no vocabulary table,
    * no fit step, collisions accepted by design. The streaming/online
    * counterpart to q80's TF-IDF vocabulary: a 100 TB corpus gets a
    * fixed-width feature space in ONE pass with map-side-combinable
    * counts, where a dictionary encoding needs a full vocabulary
    * shuffle first.
    *
    * Hash = [[Dedup.hash28]] (md5-prefix — engine-reproducible, unlike
    * murmur-based engine builtins). Emits the top-`k` heaviest buckets
    * per group (row_number over (weight desc, bucket) — total order, and
    * the rank filter sits directly above the window so WindowGroupLimit
    * bounds the per-group sort). Empty tokens from repeated separators
    * are dropped. */
  def featureHashing(df: DataFrame, group: Column, text: Column,
                     buckets: Int, k: Int): DataFrame = {
    require(buckets >= 2 && k >= 1, "need buckets >= 2 and k >= 1")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("grp")
      .orderBy(desc("weight"), col("bucket"))
    df.select(group.as("grp"), explode(split(text, " ")).as("tok"))
      .where(col("grp").isNotNull && length(col("tok")) > 0)
      .select(col("grp"),
        pmod(Dedup.hash28(col("tok")), lit(buckets.toLong)).as("bucket"))
      .groupBy("grp", "bucket").agg(count(lit(1)).as("weight"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k) // directly above the window → WindowGroupLimit
      .select(col("grp"), col("bucket"), col("weight"),
        col("rn").cast("long").as("rn"))
      .orderBy("grp", "rn")
  }
}
