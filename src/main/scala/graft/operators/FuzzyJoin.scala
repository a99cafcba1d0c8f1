package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy matching over a low-cardinality string column.
  *
  * The classic scale trick for fuzzy self-joins on categorical-ish text
  * (names, brands, cities): DON'T pair the rows — pair the DICTIONARY.
  * Distinct values with their frequencies are orders of magnitude smaller
  * than the table (64 names for 2 000 parts in the fixture; a few million
  * distinct names for billions of rows at 100 TB), so the quadratic
  * levenshtein stage runs on the dictionary and row counts ride along as
  * weights. Within the dictionary, candidate pairs are blocked by
  * (first character, ±`lenBand` length) — levenshtein ≥ |len(a)−len(b)|,
  * so the length band is lossless for the distance cap, and the
  * first-char block is the standard recall/cost trade (a prefix-deletion
  * typo crosses blocks; callers wanting lossless recall set a wider key).
  *
  * Levenshtein is integer and identically defined in Spark and DuckDB —
  * no float rounding anywhere in this operator.
  */
object FuzzyJoin {

  /** Distinct-value fuzzy pairs: (name_a < name_b, dist ≤ maxDist,
    * n_a, n_b row frequencies). One groupBy for the dictionary, one
    * blocked self-join on it (broadcast: the dictionary is small by
    * construction — that is the point of the operator). */
  def dictionaryPairs(df: DataFrame, name: Column, maxDist: Int,
                      lenBand: Int = 2): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    val dict = df.select(name.as("nm")).groupBy("nm")
      .agg(count(lit(1)).as("n"))
      .select(col("nm"), col("n"), substring(col("nm"), 1, 1).as("blk"),
        length(col("nm")).as("len"))
    val a = dict.select(col("nm").as("name_a"), col("n").as("n_a"),
      col("blk").as("blk_a"), col("len").as("len_a"))
    val b = dict.select(col("nm").as("name_b"), col("n").as("n_b"),
      col("blk").as("blk_b"), col("len").as("len_b"))
    a.join(broadcast(b),
        col("blk_a") === col("blk_b") && col("name_a") < col("name_b") &&
          abs(col("len_a") - col("len_b")) <= lit(lenBand))
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).as("dist"),
        col("n_a"), col("n_b"))
      .where(col("dist") <= lit(maxDist))
  }

  /** Jaro-Winkler fuzzy pairs over a blocked dictionary: distinct
    * (block, name) values pair within their block (name_a < name_b) and
    * keep score ≥ `threshold`. Same dictionary-not-rows scale shape as
    * [[dictionaryPairs]] — the quadratic stage runs on distinct values
    * per block, with row frequencies carried as weights — but scored by
    * the native [[org.apache.spark.sql.graft.JaroWinkler]] expression
    * (whole-stage codegen; Spark has no built-in JW), which favors
    * shared prefixes the way edit distance can't: a one-char typo deep
    * in a long name scores ~0.97 while a same-distance typo in a short
    * code scores far lower.
    *
    * `threshold` compares the UNROUNDED double in both engines — pick it
    * away from any attainable score (scores are ratios of small integers,
    * so at any realistic name length the attainable set is sparse); the
    * output score is sealed with round(,4). */
  def jaroWinklerPairs(df: DataFrame, block: Column, name: Column,
                       threshold: Double): DataFrame = {
    require(threshold > 0 && threshold < 1, "threshold must be in (0, 1)")
    import org.apache.spark.sql.graft.StringSimExprs
    val dict = df.select(block.as("blk"), name.as("nm"))
      .where(col("blk").isNotNull && col("nm").isNotNull)
      .groupBy("blk", "nm").agg(count(lit(1)).as("n"))
    val a = dict.select(col("blk"), col("nm").as("name_a"), col("n").as("n_a"))
    val b = dict.select(col("blk"), col("nm").as("name_b"), col("n").as("n_b"))
    a.join(broadcast(b), Seq("blk"))
      .where(col("name_a") < col("name_b"))
      .withColumn("jw", StringSimExprs.jaroWinkler(col("name_a"), col("name_b")))
      .where(col("jw") >= lit(threshold))
      .select(col("blk"), col("name_a"), col("name_b"),
        round(col("jw"), 4).as("jw"), col("n_a"), col("n_b"))
  }
}
