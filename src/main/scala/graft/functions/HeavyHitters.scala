package graft

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed `Aggregator` — the
  * bounded-memory path for "top tokens over 100 TB of text".
  *
  * The exact formulation (q22: explode -> groupBy token -> orderBy) keeps
  * one group per DISTINCT token: fine at fixture scale, unbounded at
  * corpus scale. Misra-Gries keeps at most `k` counters per partial
  * buffer, merges associatively, and guarantees: every item with true
  * frequency > n/k survives, and every reported estimate is within n/k of
  * the true count (both pinned in the unit suite). Rank/estimate noise is
  * order-dependent, as with any mergeable sketch — callers re-rank the
  * candidate set exactly if they need stable output (candidates are ≤ k,
  * so the exact re-count is a broadcast-filterable second pass).
  *
  * The buffer is an immutable Map for encoder simplicity; a production
  * tuning pass would swap a mutable open-hash buffer behind the same
  * Aggregator contract.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, "k must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    b.get(item) match {
      case Some(c) => b.updated(item, c + 1)
      case None if b.size < k => b.updated(item, 1L)
      case None => // decrement-all step: drop zeroed counters
        b.collect { case (t, c) if c > 1 => t -> (c - 1) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) }
    if (sum.size <= k) sum
    else { // keep the k largest, subtract the (k+1)-th weight (standard merge)
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.collect { case (t, c) if c > cut => t -> (c - cut) }
    }
  }

  override def finish(reduction: Map[String, Long]): Map[String, Long] = reduction
  override def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
}

object HeavyHitters {
  /** Typed column aggregating a String column into ≤k (token -> estimate). */
  def misraGries(k: Int): TypedColumn[String, Map[String, Long]] =
    new MisraGries(k).toColumn

  /** Two-pass exact top-m tokens, sketch-pruned (the production pattern the
    * class doc describes): pass 1 runs Misra-Gries to a ≤k candidate set
    * (bounded memory at any corpus size), pass 2 re-counts ONLY the
    * candidates exactly and takes the top m with a deterministic tie-break.
    * Exact whenever every true top-m token has frequency > n/k (the MG
    * survival guarantee); the candidate list is ≤ k entries, so the second
    * pass's filter is a broadcast-size IN list, and the exact groupBy
    * shuffles candidate rows only. Oracle-gated as q66. */
  def topTokensExact(df: org.apache.spark.sql.DataFrame,
                     text: org.apache.spark.sql.Column,
                     k: Int, m: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val tokens = df.select(explode(split(text, " ")).as("token"))
    // One pass-1 job computes the sketch AND the two numbers that make the
    // exactness guarantee checkable at runtime: total token count n (the MG
    // survival threshold is n/k) and the exact vocabulary size (vocab ≤ k
    // ⟹ the sketch held every token and no decrement ever fired).
    val (sketch, n, vocab) = tokens.as[String](Encoders.STRING)
      .select(misraGries(k),
        count(col("token")).as[Long](Encoders.scalaLong),
        count_distinct(col("token")).as[Long](Encoders.scalaLong))
      .head()
    val cands = sketch.keys.toSeq.sorted
    val exact = tokens.where(col("token").isin(cands: _*))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(m)
    // Detect (instead of silently returning wrong top-m) a k too small for
    // the corpus: the result is provably exact iff the sketch held the whole
    // vocabulary, or the m-th candidate's exact count clears the n/k
    // survival threshold (then every true top-m token must be a candidate).
    if (vocab > cands.size) {
      val counts = exact.collect() // ≤ m rows — bounded, not a corpus collect
      val mth = if (counts.length < m) 0L else counts.last.getLong(1)
      require(mth > n / k,
        s"topTokensExact: k=$k too small — m-th candidate count $mth ≤ MG " +
          s"survival threshold n/k=${n / k} (n=$n, vocab=$vocab); result not provably exact")
    }
    exact
  }
}
