package graft

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Aggregator, Window}

/** Mergeable-sketch operators with engine-reproducible answers: KMV
  * (k-minimum-values) distinct counting and hash-sample quantiles. Both
  * replace "exact but unbounded" aggregations (`count_distinct`, exact
  * `percentile`) with bounded-state estimators whose every intermediate is
  * an integer or an md5-derived hash — so DuckDB computes the identical
  * estimate and the correctness gate stays hash-exact, unlike
  * `approx_count_distinct`/`approx_percentile` whose HLL/GK internals are
  * engine-private.
  */
/** Output row of [[Sketches.KmvAgg]]: field names match [[Sketches.kmvDistinct]]. */
case class KmvResult(est_distinct: Double, n_seen: Long, exact: Long)

object Sketches {
  /** 60-bit uniform hash from the md5 hex prefix — [[Dedup.hash60]], the
    * shared deterministic uniformizer (DuckDB twin:
    * ('0x' || substr(md5(v),1,15))::BIGINT). */
  private def h60(c: Column): Column = Dedup.hash60(c.cast("string"))

  /** KMV distinct-count estimate per group: hash every value to a 60-bit
    * uniform point, keep each group's k smallest DISTINCT hashes, and
    * estimate D ≈ (k-1) · 2^60 / h_(k), the classic bottom-k estimator
    * (Bar-Yossef et al. 2002). Groups with fewer than k distinct values
    * report their EXACT distinct count (the sketch saw everything).
    *
    * Why not `count_distinct` at 100 TB: exact distinct keeps one group
    * per distinct value alive through the shuffle — memory ∝ cardinality.
    * KMV's state is k longs per group, mergeable across partitions: the
    * (group, hash) dedup agg combines map-side, and the per-group top-k
    * window sorts only the surviving distinct hashes. Emits `est_distinct`
    * (the estimate), `n_seen` (min(k, true distinct) — the sketch size),
    * and `exact` (1 when the estimate is provably exact).
    *
    * Determinism: md5 hashing, integer comparisons, and one final division
    * of identical integers rounded to 4 dp — no engine-private state. */
  def kmvDistinct(df: DataFrame, group: Column, value: Column,
                  k: Int = 64): DataFrame = {
    require(k >= 2, "k must be >= 2 (the estimator divides by h_(k))")
    // distinct (group, hash) pairs: map-side combinable, collapses dup
    // values BEFORE the per-group sort so the window input is
    // cardinality-bounded, not row-bounded
    val hashed = df.select(group.as("grp"), h60(value).as("__h")).distinct()
    val w = Window.partitionBy("grp").orderBy("__h")
    val kept = hashed.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
    kept.groupBy("grp").agg(
        max(when(col("__rn") === k, col("__h"))).as("__hk"),
        count(lit(1)).cast("long").as("n_seen"))
      .select(col("grp"),
        when(col("__hk").isNull, col("n_seen").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * lit(math.pow(2, 60)) / col("__hk"), 4))
          .as("est_distinct"),
        col("n_seen"),
        col("__hk").isNull.cast("long").as("exact"))
  }

  /** Rolling-window distinct estimation by KMV sketch MERGE: one bottom-k
    * sketch per integer `unit` (e.g. epoch day), each unit's sketch then
    * contributed to the `span` windows it serves, and the window estimate
    * taken from the bottom-k of the UNION of contributing sketches.
    *
    * The merge is lossless for the estimator: every hash in a window's
    * true bottom-k is necessarily within its own unit's bottom-k, so
    * merging per-unit sketches reproduces the exact bottom-k of the
    * window's distinct hashes (pinned against [[kmvDistinct]] over the
    * exploded raw rows in the unit suite).
    *
    * Why this beats exploding raw rows ×span (the exact-rolling-distinct
    * shape): the window stage touches ≤ span·k hashes per window instead
    * of every (unit, value) observation — at 100 TB, rolling distinct
    * users over 90 days becomes 90·k longs per window, not 90 days of
    * raw traffic re-shuffled. Trailing windows are clipped at the max
    * unit. Output: (w, est_distinct, n_seen, exact) per window end. */
  def kmvRolling(df: DataFrame, unit: Column, value: Column, span: Int,
                 k: Int = 64): DataFrame = {
    require(span >= 1, "span must be >= 1")
    require(k >= 2, "k must be >= 2 (the estimator divides by h_(k))")
    val du = df.select(unit.cast("long").as("u"), h60(value).as("__h"))
      .distinct()
    val wd = Window.partitionBy("u").orderBy("__h")
    val daily = du.withColumn("__rn", row_number().over(wd))
      .where(col("__rn") <= k).select(col("u"), col("__h"))
    // max over zero rows is SQL NULL — fail with a message, not a bare
    // NPE from getLong (the pageRank/hitsBipartite convention)
    val maxURow = du.agg(max("u")).head
    require(!maxURow.isNullAt(0),
      "kmvRolling: empty input (no rows with a non-null unit)")
    val maxU = maxURow.getLong(0)
    val cand = daily.select(
        explode(sequence(col("u"), least(col("u") + (span - 1), lit(maxU))))
          .as("w"), col("__h"))
      .distinct()
    val ww = Window.partitionBy("w").orderBy("__h")
    cand.withColumn("__rn", row_number().over(ww)).where(col("__rn") <= k)
      .groupBy("w").agg(
        max(when(col("__rn") === k, col("__h"))).as("__hk"),
        count(lit(1)).cast("long").as("n_seen"))
      .select(col("w"),
        when(col("__hk").isNull, col("n_seen").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * lit(math.pow(2, 60)) /
            col("__hk"), 4)).as("est_distinct"),
        col("n_seen"),
        col("__hk").isNull.cast("long").as("exact"))
  }

  /** [[kmvDistinct]] as a mergeable typed `Aggregator` — the TRUE
    * bounded-state path: where the window form shuffles every distinct
    * (group, hash) pair and sorts per group, this aggregator's partial
    * buffers hold at most k longs each and combine map-side, so the
    * shuffle moves k values per (partition, group) no matter the
    * cardinality — the standard sketch-UDAF shape, also legal inside
    * streaming aggregations. Result is identical to [[kmvDistinct]]
    * (the k smallest distinct hashes are order-independent; pinned in
    * the unit suite), so it shares q107's oracle as q112.
    *
    * Buffer is a sorted Seq (≤ k) with O(k) insert — ample for k ≤ 256;
    * a production tuning pass would swap a primitive max-heap behind the
    * same Aggregator contract (cf. MisraGries's note). */
  class KmvAgg(k: Int) extends Aggregator[Long, Seq[Long], KmvResult] {
    require(k >= 2, "k must be >= 2")
    override def zero: Seq[Long] = Vector.empty
    private def insert(b: Seq[Long], h: Long): Seq[Long] =
      if (b.size == k && h >= b.last) b // above the current k-th min: no-op
      else if (b.contains(h)) b
      else {
        val nb = (b :+ h).sorted
        if (nb.size > k) nb.take(k) else nb
      }
    override def reduce(b: Seq[Long], h: Long): Seq[Long] = insert(b, h)
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      b.foldLeft(a)(insert)
    override def finish(r: Seq[Long]): KmvResult =
      if (r.size < k)
        KmvResult(r.size.toDouble, r.size.toLong, 1L)
      else {
        val est = (k - 1).toDouble * math.pow(2, 60) / r.last
        KmvResult(BigDecimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble, k.toLong, 0L)
      }
    override def bufferEncoder: Encoder[Seq[Long]] = Encoders.kryo[Seq[Long]]
    override def outputEncoder: Encoder[KmvResult] = Encoders.product[KmvResult]
  }

  /** Untyped column form of [[KmvAgg]] over a pre-hashed long column. */
  def kmvAggDistinct(df: DataFrame, group: Column, value: Column,
                     k: Int = 64): DataFrame =
    df.select(group.as("grp"), h60(value).as("__h"))
      .groupBy("grp")
      .agg(udaf(new KmvAgg(k), Encoders.scalaLong)(col("__h")).as("r"))
      .select(col("grp"), col("r.est_distinct"), col("r.n_seen"), col("r.exact"))

  /** Set-intersection cardinality from KMV sketches by inclusion–
    * exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B), with the union
    * sketch built by replaying the SAME hashed stream under a third
    * label — sketch merge without a second scan. The audience-overlap
    * question ("how many users did both X and Y?") at 100 TB: three ≤k
    * bottom-k buffers of state, one map-side-combinable pass, versus an
    * exact COUNT(DISTINCT) intersection that shuffles both full key
    * sets. Estimates are md5-deterministic (engine-reproducible, same as
    * [[kmvDistinct]]); the closing arithmetic adds three ROUNDED doubles
    * — no association freedom. Small/degenerate sides degrade gracefully:
    * under-filled sketches are exact counts, so the estimate is exact
    * whenever both sides fit in k. */
  def kmvIntersection(df: DataFrame, label: Column, a: String, b: String,
                      value: Column, k: Int = 64): DataFrame = {
    val g = df.where(label.isin(a, b))
      .select(label.as("l"), h60(value).as("__h"))
      // materialized once: the union below has TWO consumers of this
      // subtree, and ReuseExchange does not dedup scans under a union —
      // without the checkpoint the corpus scan + hashing runs twice
      .localCheckpoint()
    val withU = g.union(g.select(lit("__union").as("l"), col("__h")))
    val est = withU.groupBy("l")
      .agg(udaf(new KmvAgg(k), Encoders.scalaLong)(col("__h")).as("r"))
      .select(col("l"), col("r.est_distinct").as("est"))
    est.agg(
        max(when(col("l") === a, col("est"))).as("est_a"),
        max(when(col("l") === b, col("est"))).as("est_b"),
        max(when(col("l") === "__union", col("est"))).as("est_union"))
      .select(lit(a).as("label_a"), lit(b).as("label_b"),
        col("est_a"), col("est_b"), col("est_union"),
        round(col("est_a") + col("est_b") - col("est_union"), 4)
          .as("est_intersection"))
  }

  /** Quantiles of a deterministic hash-sample: keep rows whose md5-derived
    * 60-bit hash of `id` falls under `rate` · 2^60 (an exact integer
    * threshold — both engines admit the identical row set), then exact
    * percentiles of the sample. The honest scale path for "p50/p90/p99 of
    * a 100 TB column": exact percentile needs a global sort; a fixed-rate
    * hash sample bounds the sorted set at rate·N rows while the estimate's
    * error is the textbook sampling error (±O(1/√(rate·N)) quantile
    * ranks). Unlike `approx_percentile`, re-runs and engines agree bit-
    * for-bit because the SAMPLE is deterministic and the percentile over
    * it is exact. */
  def sampledQuantiles(df: DataFrame, group: Column, id: Column, value: Column,
                       rate: Double, qs: Seq[Double]): DataFrame = {
    require(rate > 0 && rate <= 1, "rate must be in (0, 1]")
    require(qs.nonEmpty, "need at least one quantile")
    val threshold = (rate * math.pow(2, 60)).toLong
    val sample = df.where(h60(id) < threshold)
      .select(group.as("grp"), value.cast("double").as("__v"))
    val aggs = qs.map { q =>
      round(expr(s"percentile(__v, $q)"), 4).as(s"q${(q * 100).round}")
    }
    sample.groupBy("grp")
      .agg(count(lit(1)).cast("long").as("n_sampled"), aggs: _*)
  }

  /** HyperLogLog distinct-count estimate per group, every intermediate an
    * integer so DuckDB reproduces it bit-for-bit (unlike
    * `approx_count_distinct`, whose HLL++ registers are engine-private).
    * Flajolet et al. 2007 with p=6 (m=64 registers):
    *
    *   - h = [[Dedup.hash60]](value): 60 uniform bits;
    *   - bucket = h mod 64, w = h >> 6 (54 bits);
    *   - rho(w) = position of w's highest set bit from the window top
    *     = 55 − length(bin(w)) (55 when w=0) — `bin` renders the minimal
    *     binary string in BOTH engines, making "count leading zeros"
    *     pure string length, no log2 doubles;
    *   - register M_j = max rho over the bucket;
    *   - harmonic sum scaled to integers: S = Σ_seen 2^(55−M_j)
    *     + (64−seen)·2^55 — exact long arithmetic (max 2^61), where the
    *     textbook Σ 2^(−M_j) would need >53 mantissa bits;
    *   - raw E = α₆₄·m²·2^55 / S = 0.709·2^67/S, ONE sealed double
    *     division; linear counting 64·ln(64/V) when E ≤ 2.5m and V>0
    *     zero registers remain (small-range correction).
    *
    * Why this beside [[kmvDistinct]]: KMV state is k·64-bit hashes and
    * merges by re-sorting; HLL state is m 6-bit registers merging by
    * pointwise MAX — the agg combines map-side, so a 100 TB scan ships
    * 64 longs per group per partition regardless of cardinality, and
    * sketches for different slices union by register max with no rescan
    * (the warehouse "COUNT DISTINCT over any rollup" pattern). */
  def hllDistinct(df: DataFrame, group: Column, value: Column): DataFrame = {
    val h = h60(value)
    val regs = df.where(value.isNotNull)
      .select(group.as("grp"), pmod(h, lit(64L)).as("bkt"),
        shiftright(h, 6).as("w"))
      .withColumn("rho",
        when(col("w") === 0L, lit(55)).otherwise(lit(55) - length(bin(col("w")))))
      .groupBy("grp", "bkt").agg(max("rho").as("reg"))
    val two55 = 36028797018963968L // 2^55
    regs.groupBy("grp")
      .agg(count(lit(1)).cast("long").as("n_buckets"),
        // functions.shiftleft only takes a literal shift — SQL form for
        // the per-row register exponent
        sum(expr("shiftleft(CAST(1 AS BIGINT), 55 - reg)")).as("s_seen"))
      .select(col("grp"), col("n_buckets"),
        (lit(64L) - col("n_buckets")).as("zero_buckets"),
        (col("s_seen") + (lit(64L) - col("n_buckets")) * lit(two55)).as("s55"))
      .withColumn("raw",
        lit(0.709) * lit(147573952589676412928.0) / col("s55").cast("double"))
      .select(col("grp"), col("n_buckets"), col("zero_buckets"), col("s55"),
        round(when(col("raw") <= 160.0 && col("zero_buckets") > 0L,
            lit(64.0) * log(lit(64.0) / col("zero_buckets").cast("double")))
          .otherwise(col("raw")), 4).as("est_distinct"))
  }

  /** Mergeable equi-width histogram-sketch quantiles: bin an INTEGER
    * metric into `bins` fixed cells over [lo, hi] (clamping outliers
    * into the edge cells), estimate each requested quantile by linear
    * interpolation INSIDE its bin, and report the exact percentile
    * beside it — the honest "approximate quantiles at 100 TB" story:
    * the bin counts are one map-side-combinable aggregation whose
    * state is `bins` longs (trivially mergeable across shards/days,
    * unlike an exact sort), the error is bounded by the bin width, and
    * the fixture validates the bound against the exact answer it can
    * still afford to compute. All bin assignment is exact integer
    * arithmetic; estimates are fixed single-double expressions over
    * exact counts. */
  def histogramQuantiles(df: DataFrame, v: Column, lo: Long, hi: Long,
                         bins: Int, qs: Seq[Double]): DataFrame = {
    require(bins >= 2 && hi > lo && qs.nonEmpty, "bad sketch parameters")
    import org.apache.spark.sql.expressions.Window
    val d = df.select(v.cast("long").as("v")).where(col("v").isNotNull)
    // explicit floor, not a bare cast: Spark's double→long cast
    // truncates while DuckDB's CAST rounds — floor() agrees everywhere
    val bin = least(floor(greatest(
      (col("v") - lo) * bins / lit(hi - lo), lit(0L))).cast("long"),
      lit(bins - 1L))
    val counts = d.select(bin.as("b")).groupBy("b")
      .agg(count(lit(1)).as("c"))
    val cum = counts
      .withColumn("cum", sum("c").over(Window.orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("before", col("cum") - col("c"))
    val tot = counts.agg(sum("c").as("n"))
    // ONE array-percentile aggregate: separate percentile() calls each
    // buffer the full column (measured 3× the query's cost at three
    // quantiles); the array form sorts once
    val exacts = d.agg(percentile(col("v"),
        array(qs.map(lit(_)): _*)).as("exs"))
      .select(qs.indices.map(i =>
        element_at(col("exs"), i + 1).as(s"ex$i")): _*)
    val spine = cum.crossJoin(broadcast(tot))
      .withColumn("q", explode(array(qs.map(lit(_)): _*)))
      .where(col("cum").cast("double") >= col("q") * col("n") &&
        col("before").cast("double") < col("q") * col("n"))
    val width = (hi - lo).toDouble / bins
    spine.crossJoin(broadcast(exacts))
      .select(col("q"), col("n"),
        round(lit(lo.toDouble) + (col("b").cast("double") +
          (col("q") * col("n") - col("before")) / col("c")) * lit(width),
          4).as("estimate"),
        round(qs.zipWithIndex.map { case (q, i) =>
          when(col("q") === lit(q), col(s"ex$i")) }
          .reduce(coalesce(_, _)), 4).as("exact"))
      .select(col("q").as("quantile"), col("n"), col("estimate"),
        col("exact"),
        round(abs(col("estimate") - col("exact")), 4).as("abs_err"))
      .orderBy("quantile")
  }

  /** Capture-recapture population estimate (Chapman's bias-corrected
    * Lincoln-Petersen): two INDEPENDENT deterministic hash samples of
    * the key universe play the two "captures", and
    *
    *   N̂ = (n₁+1)(n₂+1)/(m+1) − 1
    *
    * estimates the total distinct-key count from the overlap m alone —
    * the cheap estimator for "how big is this ID space really" when a
    * full distinct count is too expensive to run twice a day. One
    * distinct pass + one aggregation of three conditional sums; the
    * true distinct count rides along so the fixture validates the
    * estimator's error honestly. Samples hash with different salts, so
    * membership is engine-identical and genuinely independent. */
  def captureRecapture(df: DataFrame, key: Column, pct1: Int,
                       pct2: Int): DataFrame = {
    require(pct1 > 0 && pct1 <= 100 && pct2 > 0 && pct2 <= 100,
      "sample percentages must be in (0, 100]")
    val keys = df.select(key.as("k")).where(col("k").isNotNull).distinct()
    val flagged = keys.select(
      (pmod(Dedup.hash60(concat(col("k").cast("string"), lit("cr1"))),
        lit(100L)) < pct1).as("s1"),
      (pmod(Dedup.hash60(concat(col("k").cast("string"), lit("cr2"))),
        lit(100L)) < pct2).as("s2"))
    flagged.agg(count(lit(1)).as("n_true"),
        sum(when(col("s1"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("s2"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("s1") && col("s2"), 1L).otherwise(0L)).as("m"))
      .select(col("n_true"), col("n1"), col("n2"), col("m").as("overlap"),
        round((col("n1") + 1).cast("double") * (col("n2") + 1) /
          (col("m") + 1) - lit(1.0), 4).as("n_hat"))
  }
}
