package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered event-sequence mining: Markov transition matrices and frequent
  * path extraction. The sequence-modeling complement of [[Sessionize]]
  * (which bounds sequences in time) — both feed behavioral features into
  * a training-data pipeline (next-event prediction labels, funnel priors).
  *
  * Scale shape: everything here is ONE shuffle — the window partition by
  * the sequence key. Successor extraction is `lead()` inside that window
  * (no self-join: the naive `e JOIN e ON seq AND idx+1` spelling shuffles
  * twice and skews on hot keys); the downstream transition/path counts
  * aggregate tables bounded by |alphabet|^steps, which broadcast.
  *
  * Determinism: window order is (ts, tie-break id) — a total order per
  * key; counts are integers; probabilities are one long/long division
  * sealed with round(,4) (FIXTURES.md).
  */
object Sequences {

  /** First-order Markov transition matrix over `state`, ordered per `key`
    * by (`ts`, `tieBreak`): (from_state, to_state, n, prob) with prob
    * normalized per from_state. */
  def transitions(df: DataFrame, key: Column, ts: Column, tieBreak: Column,
                  state: Column): DataFrame = {
    val w = Window.partitionBy("k").orderBy(col("us"), col("tb"))
    val pairs = df.select(key.as("k"), ts.as("us"), tieBreak.as("tb"),
        state.as("s"))
      .withColumn("nxt", lead(col("s"), 1).over(w))
      .where(col("nxt").isNotNull)
    val counts = pairs.groupBy(col("s").as("from_state"),
        col("nxt").as("to_state"))
      .agg(count(lit(1)).as("n"))
    val wf = Window.partitionBy("from_state")
    counts.select(col("from_state"), col("to_state"), col("n"),
      round(col("n").cast("double") /
        sum("n").over(wf).cast("double"), 4).as("prob"))
  }

  /** Top-k most frequent `steps`-long state paths (windowed `lead` chain,
    * joined into one `sep`-delimited string). Ties broken by path string —
    * integer counts, so the (count desc, path) order is engine-stable. */
  def topPaths(df: DataFrame, key: Column, ts: Column, tieBreak: Column,
               state: Column, steps: Int, k: Int,
               sep: String = ">"): DataFrame = {
    require(steps >= 2 && steps <= 8, "steps must be in [2, 8]")
    val w = Window.partitionBy("k").orderBy(col("us"), col("tb"))
    val base = df.select(key.as("k"), ts.as("us"), tieBreak.as("tb"),
      state.as("s0"))
    val withLeads = (1 until steps).foldLeft(base) { (acc, i) =>
      acc.withColumn(s"s$i", lead(col("s0"), i).over(w))
    }
    withLeads.where(col(s"s${steps - 1}").isNotNull)
      .select(concat_ws(sep, (0 until steps).map(i => col(s"s$i")): _*)
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("path"))
      .limit(k)
  }

  /** Stationary distribution of the empirical transition chain by
    * `iters` unrolled power-iteration steps from a uniform start —
    * where does the session process spend its time in the long run?
    * ([[transitions]] reports one-step probabilities; this is their
    * fixed point.)
    *
    * States with no OUTGOING transition get an implicit self-loop
    * (absorbing semantics — their mass stays put instead of leaking).
    * Determinism (the rake2d inter-pass device): mass is carried as
    * 1e-6 fixed-point longs; each edge's contribution
    * round(π6(i)·n_ij/rowsum_i) is one double op quantized back to a
    * long, so every iteration's state vector is bit-identical across
    * engines. Each step is one broadcast join of the edge table
    * (state² rows max) against the state-count-sized π vector — the
    * corpus is read once to build edges. Output renormalizes to a
    * probability, sealed round(,4). */
  def markovStationary(df: DataFrame, key: Column, ts: Column,
                       tieBreak: Column, state: Column,
                       iters: Int = 3): DataFrame = {
    val (pi, _) = stationary6(df, key, ts, tieBreak, state, iters)
    val tot = pi.agg(sum("p6").as("t6"))
    pi.crossJoin(broadcast(tot))
      .select(col("s").as("state"),
        round(col("p6").cast("double") /
          nullif(col("t6").cast("double"), lit(0.0)), 4).as("pi"))
      .orderBy("state")
  }

  /** Shared fixed-point power-iteration core: returns the un-normalized
    * 1e-6 mass vector (s, p6) after `iters` steps and the self-loop-
    * completed edge table (f, t, n, rs) — consumed by
    * [[markovStationary]] (normalized readout) and [[entropyRate]]
    * (per-edge terms). */
  private def stationary6(df: DataFrame, key: Column, ts: Column,
                          tieBreak: Column, state: Column,
                          iters: Int): (DataFrame, DataFrame) = {
    require(iters >= 1, "iters must be >= 1")
    val w = Window.partitionBy("k").orderBy(col("us"), col("tb"))
    // tb filtered too: a NULL tie-break sorts first in Spark and last
    // in DuckDB — the window pairing would silently diverge
    val pairs = df.select(key.as("k"), ts.as("us"), tieBreak.as("tb"),
        state.as("s"))
      .where(col("k").isNotNull && col("us").isNotNull &&
        col("s").isNotNull && col("tb").isNotNull)
      .withColumn("nxt", lead(col("s"), 1).over(w))
      .where(col("nxt").isNotNull)
    val counts = pairs.groupBy(col("s").as("f"), col("nxt").as("t"))
      .agg(count(lit(1)).as("n"))
    val dangling = counts.select(col("t").as("f")).distinct()
      .join(counts.select("f").distinct(), Seq("f"), "left_anti")
      .select(col("f"), col("f").as("t"), lit(1L).as("n"))
    val edges = counts.unionByName(dangling)
    val rows = edges.groupBy("f").agg(sum("n").as("rs"))
    val e = edges.join(broadcast(rows), "f").localCheckpoint()
    val states = e.select(col("f").as("s")).distinct()
    var pi = states.select(col("s"), lit(1000000L).as("p6"))
    for (_ <- 1 to iters) {
      pi = e.join(broadcast(pi), col("f") === col("s"))
        .groupBy(col("t"))
        .agg(sum(round(col("p6").cast("double") * col("n") / col("rs"), 0)
          .cast("long")).as("p6"))
        .select(col("t").as("s"), col("p6"))
    }
    (pi, e)
  }

  /** Entropy rate of the empirical session chain,
    * H = −Σ_s π_s Σ_t p(t|s)·ln p(t|s), with π the [[markovStationary]]
    * fixed-point mass and p the row-normalized transition counts — nats
    * per step of inherent unpredictability (0 = deterministic next
    * event, ln k = uniform chaos). Per-edge terms π6/T6·(n/rs)·ln(n/rs)
    * are single-double ops quantized to 1e-9 fixed-point before the
    * exact state²-bounded sum; self-loop-completed edges keep absorbing
    * states' (zero) contribution well-defined. */
  def entropyRate(df: DataFrame, key: Column, ts: Column,
                  tieBreak: Column, state: Column,
                  iters: Int = 3): DataFrame = {
    val (pi, e) = stationary6(df, key, ts, tieBreak, state, iters)
    val tot = pi.agg(sum("p6").as("t6"), count(lit(1)).as("n_states"))
    e.join(broadcast(pi), col("f") === col("s"))
      .crossJoin(broadcast(tot))
      .select(col("n_states"),
        round(col("p6").cast("double") / col("t6") *
          (col("n").cast("double") / col("rs")) *
          log(col("n").cast("double") / col("rs")) * lit(1e9), 0)
          .cast("long").as("t9"))
      .groupBy("n_states").agg(sum("t9").as("h9"))
      .withColumn("nh9", -col("h9"))
      .select(col("n_states"),
        Seal.pow4("nh9", 9).as("entropy_rate"))
  }

  /** Per-state dwell time: how long does the stream sit in each state
    * before the next event — the gap to the NEXT event attributed to
    * the CURRENT state (each key's last event has no successor and
    * carries no dwell). One windowed `lead` per key (the
    * [[transitions]] shuffle), then a state-keyed aggregation of exact
    * µs longs; seconds emerge from single sealed divisions. The
    * session-content companion to [[Sessionize]]'s boundary view. */
  def dwellTime(df: DataFrame, key: Column, ts: Column, tieBreak: Column,
                state: Column): DataFrame = {
    val w = Window.partitionBy("k").orderBy(col("us"), col("tb"))
    df.select(key.as("k"), ts.as("us"), tieBreak.as("tb"),
        state.as("s"))
      .where(col("k").isNotNull && col("us").isNotNull &&
        col("s").isNotNull && col("tb").isNotNull)
      .withColumn("nus", lead(col("us"), 1).over(w))
      .where(col("nus").isNotNull)
      .groupBy(col("s").as("state"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("nus") - col("us")).as("dus"))
      .withColumn("mden", col("n_intervals") * lit(1000000L))
      .select(col("state"), col("n_intervals"),
        Seal.pow4("dus", 6).as("total_s"),
        Seal.ratio4("dus", "mden").as("mean_s"))
      .orderBy("state")
  }

  /** 2-item sequential-pattern support: for every ordered label pair
    * (a, b), a ≠ b, the number (and share) of keys whose stream shows
    * some `a` STRICTLY before some `b` — the "a eventually followed by
    * b" mining primitive ([[transitions]] counts only ADJACENT steps;
    * this counts any-gap precedence).
    *
    * Scale shape: the stream collapses to one (key, label) row carrying
    * (min_ts, max_ts) — a single map-side-combinable aggregation — and
    * the pair test `a.min < b.max` runs on the per-key self-join of
    * that collapsed table: ≤ L² rows per key for L distinct labels,
    * never events². The key census is a 1-row broadcast. Timestamps
    * compare as µs longs (`unix_micros`, the engine-identical device). */
  def eventuallyFollows(df: DataFrame, key: Column, ts: Column,
                        label: Column): DataFrame = {
    val e = df.select(key.as("k"), unix_micros(ts).as("us"),
        label.as("l"))
      .where(col("k").isNotNull && col("us").isNotNull &&
        col("l").isNotNull)
    val per = e.groupBy("k", "l")
      .agg(min("us").as("mn"), max("us").as("mx"))
    val tot = per.agg(countDistinct("k").as("n_keys"))
    val a = per.select(col("k"), col("l").as("a"), col("mn"))
    val b = per.select(col("k"), col("l").as("b"), col("mx"))
    a.join(b, Seq("k"))
      .where(col("a") =!= col("b") && col("mn") < col("mx"))
      .groupBy("a", "b").agg(count(lit(1)).as("support"))
      .crossJoin(broadcast(tot))
      .select(col("a"), col("b"), col("support"),
        Seal.ratio4("support", "n_keys").as("support_ratio"))
      .orderBy("a", "b")
  }
}
