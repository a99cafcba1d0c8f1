package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series repair: calendar-spine densification with forward fill and
  * linear interpolation — the "no row for quiet days" fix every daily
  * metric pipeline needs before window math (a 7-day frame over a table
  * with missing days silently becomes a 7-OBSERVATION frame).
  *
  * The spine is generated from the series' own [min, max] day range
  * (`sequence()` explode — one row per day, no driver loop). Carry
  * values ride as (day, value) structs through `last/first(ignoreNulls)`
  * windows, so the interpolation knows each gap's true endpoints and
  * widths. Determinism: values are integer cents; the interpolation is
  * one fixed double expression on identical longs/day-counts, sealed
  * with round(,4); days outside any observation (before the first /
  * after the last) yield SQL-NULL interp by null propagation.
  *
  * Scale note: the windows run over the DAY-sized spine (bounded — a
  * decade is ~3.7k rows), not the event corpus; a multi-series
  * deployment adds the series key to `partitionBy` and the spine
  * cross-join stays proportional to #series × #days.
  */
object Timeseries {
  def gapFillDaily(daily: DataFrame, day: Column, vCents: Column): DataFrame = {
    val d = daily.select(day.as("day"), vCents.cast("long").as("cents"))
    val spine = d.agg(min("day").as("lo"), max("day").as("hi"))
      .select(explode(expr("sequence(lo, hi)")).as("day"))
    val wPrev = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.orderBy("day")
      .rowsBetween(0, Window.unboundedFollowing)
    val obs = when(col("cents").isNull, lit(null))
      .otherwise(struct(col("day").as("d"), col("cents").as("v")))
    val filled = spine.join(d, Seq("day"), "left")
      .select(col("day"), col("cents"), obs.as("obs"))
      .select(col("day"), col("cents"),
        last("obs", ignoreNulls = true).over(wPrev).as("prev"),
        first("obs", ignoreNulls = true).over(wNext).as("next"))
    filled.select(col("day"), col("cents"),
        col("prev.v").as("ffill_cents"),
        round(when(col("cents").isNotNull, col("cents").cast("double"))
          .otherwise(col("prev.v").cast("double") +
            (col("next.v") - col("prev.v")).cast("double") *
            datediff(col("day"), col("prev.d")).cast("double") /
            datediff(col("next.d"), col("prev.d")).cast("double")), 4)
          .as("interp_cents"))
      .orderBy("day")
  }

  /** CUSUM changepoint scan over a daily integer series: the cumulative
    * sum of deviations from the global mean, S_t = Σ_{i≤t}(x_i − x̄),
    * peaks at the most likely single level-shift point (the classic
    * offline CUSUM / binary-segmentation first split). Output is the
    * one-row report (cp_day, max |S|, side, n_days, mean) a monitoring
    * pipeline alerts on.
    *
    * Exactness device: x̄ = S/n is rational, so the scan runs on
    * n·S_t = n·cum_t − t·S — pure longs, no double accumulates — and
    * ties on |n·S_t| break to the EARLIEST day (min day among argmax,
    * one deterministic agg). Magnitudes: |n·S_t| ≤ n·Σ|x|; a decade of
    * daily cents at 10⁸/day is ~10¹⁵ — safely inside long at any
    * realistic series length, because the window is DAY-sized, not
    * row-sized (aggregate first, scan the spine).
    *
    * Scale: the raw table collapses to ≤ #days rows in one keyed
    * aggregation; the single-task cumulative window runs over that
    * bounded spine (the [[gapFillDaily]] scale note). */
  def cusumChangepoint(daily: DataFrame, day: Column, vCents: Column): DataFrame = {
    val d = daily.select(day.as("day"), vCents.cast("long").as("x"))
      .where(col("day").isNotNull)
      .groupBy("day").agg(sum("x").as("x"))
    val wCum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    // day-sized spine: checkpoint once, the two consumers (peak value,
    // earliest peak day) re-read it instead of re-running the scan
    val scan = d
      .withColumn("t", row_number().over(Window.orderBy("day")))
      .withColumn("cum", sum("x").over(wCum))
      .crossJoin(broadcast(d.agg(count(lit(1)).as("n"), sum("x").as("s"))))
      .select(col("day"), col("n"), col("s"),
        (col("n") * col("cum") - col("t") * col("s")).as("ns"))
      .withColumn("a", abs(col("ns")))
      .localCheckpoint()
    val peak = scan.agg(max("a").as("maxa"))
    scan.join(broadcast(peak), col("a") === col("maxa"))
      .groupBy("n", "s", "maxa")
      .agg(min("day").as("cp_day"))
      .join(scan.select(col("day").as("cp_day"), col("ns")), Seq("cp_day"))
      .select(col("cp_day"),
        round(col("maxa").cast("double") /
          (col("n").cast("double") * lit(100.0)), 4).as("max_abs_cusum"),
        when(col("ns") > 0, lit("up_then_down")).otherwise(lit("down_then_up"))
          .as("shape"),
        col("n").as("n_days"),
        round(col("s").cast("double") / (col("n").cast("double") * lit(100.0)),
          4).as("mean_daily"))
  }

  /** Theil-Sen robust trend per group: slope = median over all point-pair
    * slopes (y_j−y_i)/(t_j−t_i), i<j — the 29%-breakdown alternative to
    * OLS (q119), immune to the outlier days that drag a least-squares
    * line. Intercept = median residual y − slope·t (the standard
    * second pass).
    *
    * Determinism: inputs collapse to one integer y per (group, t); each
    * pair slope is quantized to a 1e-4 fixed-point long BEFORE the
    * median (exact `percentile` interpolation over longs — engine-exact
    * like q09), the intercept residuals are pure long arithmetic
    * y·10⁴ − slope₄·t, and each statistic seals with one round(,4).
    *
    * Scale: the pair join is keyed by GROUP (one shuffle); within-group
    * work is quadratic in the SERIES SPINE length (t is a day/month
    * index — bounded, e.g. 84 months → 3.5k pairs), never in raw rows,
    * which the pre-aggregation guarantees. For spines past ~10⁴ points
    * swap in the pairwise-sampled estimator (hash-select pairs, the
    * q221 device) — the median is robust to uniform pair sampling. */
  def theilSen(df: DataFrame, group: Column, t: Column, vCents: Column): DataFrame = {
    val pts = df.select(group.as("g"), t.cast("long").as("t"),
        vCents.cast("long").as("y"))
      .where(col("g").isNotNull && col("t").isNotNull && col("y").isNotNull)
      .groupBy("g", "t").agg(sum("y").as("y"))
      .localCheckpoint() // re-read by pairs + residual pass
    val a = pts.select(col("g"), col("t").as("ta"), col("y").as("ya"))
    val b = pts.select(col("g"), col("t").as("tb"), col("y").as("yb"))
    val med = a.join(b, Seq("g")).where(col("ta") < col("tb"))
      .select(col("g"),
        round((col("yb") - col("ya")).cast("double") * lit(1e4) /
          (col("tb") - col("ta")).cast("double"), 0).cast("long").as("s4"))
      .groupBy("g")
      .agg(count(lit(1)).as("n_pairs"),
        expr("percentile(s4, 0.5)").as("ms4"))
      .select(col("g"), col("n_pairs"),
        col("ms4"), round(col("ms4"), 0).cast("long").as("s4l"))
    pts.join(med, Seq("g"))
      .select(col("g"), col("n_pairs"), col("ms4"),
        (col("y") * lit(10000L) - col("s4l") * col("t")).as("i4"))
      .groupBy("g", "n_pairs", "ms4")
      .agg(count(lit(1)).as("n_points"),
        expr("percentile(i4, 0.5)").as("mi4"))
      .select(col("g"), col("n_points"), col("n_pairs"),
        round(col("ms4") / lit(1e4), 4).as("slope"),
        round(col("mi4") / lit(1e4), 4).as("intercept"))
      .orderBy("g")
  }

  /** Classical ratio-to-moving-average weekday seasonal indices: each
    * day's value over its CENTERED 7-day moving average (complete
    * windows only — the edges have no honest MA), averaged per ISO
    * weekday. Index > 1: that weekday structurally over-indexes. Each
    * ratio x·7/Σwindow is one double op over exact longs quantized to
    * 1e-6 fixed-point before the per-weekday mean; the window runs on
    * the daily spine. */
  def seasonalIndexDow(daily: DataFrame, day: Column,
                       v: Column): DataFrame = {
    val d = daily.select(day.as("day"), v.cast("long").as("x"))
      .where(col("day").isNotNull && col("x").isNotNull)
    val w = Window.orderBy("day").rowsBetween(-3, 3)
    d.withColumn("ws", sum("x").over(w))
      .withColumn("wc", count(lit(1)).over(w))
      .where(col("wc") === 7 && col("ws") > 0)
      .select((weekday(col("day")) + 1).cast("long").as("dow"),
        round(col("x").cast("double") * 7 / col("ws") * lit(1e6), 0)
          .cast("long").as("r6"))
      .groupBy("dow")
      .agg(count(lit(1)).as("n_days"), sum("r6").as("sr"))
      .withColumn("sden", col("n_days") * lit(1000000L))
      .select(col("dow"), col("n_days"),
        Seal.ratio4("sr", "sden").as("seasonal_index"))
      .orderBy("dow")
  }

  /** Shewhart individuals (I-MR) control chart summary: center line μ,
    * mean moving range M̄R, the ±2.66·M̄R natural-process limits
    * (2.66 = 3/d₂ at n=2), and how many days breach them — the
    * process-stability gate run before trusting any drift alarm.
    * μ and M̄R are rationals over exact longs (the MR pass is one lag
    * window on the daily spine); the limits are fixed double
    * expressions broadcast back for the violation count. */
  def controlChartI(daily: DataFrame, day: Column, v: Column): DataFrame = {
    val d = daily.select(day.as("day"), v.cast("long").as("x"))
      .where(col("day").isNotNull && col("x").isNotNull)
    val mr = d.withColumn("prev", lag(col("x"), 1).over(Window.orderBy("day")))
      .where(col("prev").isNotNull)
      .agg(count(lit(1)).as("nmr"), sum(abs(col("x") - col("prev")))
        .as("smr"))
    val base = d.agg(count(lit(1)).as("n"), sum("x").as("s"))
    val lims = base.crossJoin(broadcast(mr))
      .select(col("n"), col("nmr"), col("s"), col("smr"),
        (col("s").cast("double") / col("n")).as("mu"),
        (col("smr").cast("double") /
          nullif(col("nmr").cast("double"), lit(0.0))).as("mrbar"))
      .select(col("n"), col("nmr"), col("s"), col("smr"), col("mu"),
        col("mrbar"),
        (col("mu") + lit(2.66) * col("mrbar")).as("ucl"),
        (col("mu") - lit(2.66) * col("mrbar")).as("lcl"))
    // the violation COMPARISON stays on the unsealed doubles (both
    // engines derive bit-identical doubles from the same exact longs);
    // the DISPLAYED statistics seal as integer rationals — μ ± 2.66·M̄R
    // is (100·s·nmr ± 266·smr·n) / (100·n·nmr)
    d.crossJoin(broadcast(lims))
      .groupBy("n", "nmr", "s", "smr", "mu", "mrbar", "ucl", "lcl")
      .agg(sum(when(col("x").cast("double") > col("ucl") ||
        col("x").cast("double") < col("lcl"), 1L).otherwise(0L))
        .as("n_violations"))
      .withColumn("mrden", nullif(col("nmr"), lit(0L)))
      .withColumn("unum",
        lit(100) * col("s") * col("nmr") + lit(266) * col("smr") * col("n"))
      .withColumn("lnum",
        lit(100) * col("s") * col("nmr") - lit(266) * col("smr") * col("n"))
      .withColumn("lden", nullif(lit(100) * col("n") * col("nmr"), lit(0L)))
      .select(col("n").as("n_days"), Seal.ratio4("s", "n").as("mean"),
        Seal.ratio4("smr", "mrden").as("mr_bar"),
        Seal.ratio4("unum", "lden").as("ucl"),
        Seal.ratio4("lnum", "lden").as("lcl"),
        col("n_violations"))
  }

  /** Wald-Wolfowitz runs test on a daily series: are above-median and
    * below-median days randomly interleaved, or does the series cling
    * to one side (trend/regime) or flip-flop (over-dispersion)?
    * Days equal to the exact median are excluded (the standard
    * convention — they carry no sign). Runs count via one lag
    * comparison over the pre-aggregated daily spine; n₁/n₂/R are exact
    * longs and z = (R − E)/√V is closed-form singles,
    * E = 1 + 2n₁n₂/n, V = 2n₁n₂(2n₁n₂ − n)/(n²(n−1)). NULL z on a
    * one-sided series. */
  def runsTest(daily: DataFrame, day: Column, v: Column): DataFrame = {
    val d = daily.select(day.as("day"), v.cast("long").as("x"))
      .where(col("day").isNotNull && col("x").isNotNull)
    val med = d.agg(percentile(col("x"), lit(0.5)).as("m"))
    val signed = d.crossJoin(broadcast(med))
      .where(col("x").cast("double") =!= col("m"))
      .select(col("day"), (col("x") > col("m")).as("up"))
    val lagged = signed.withColumn("prev",
      lag(col("up"), 1).over(Window.orderBy("day")))
    lagged.agg(
        sum(when(col("up"), 1L).otherwise(0L)).as("n1"),
        sum(when(!col("up"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("prev").isNull || col("prev") =!= col("up"), 1L)
          .otherwise(0L)).as("r"))
      .select(col("n1").as("n_above"), col("n2").as("n_below"),
        col("r").as("n_runs"),
        round((col("r").cast("double") -
          (lit(1.0) + lit(2.0) * col("n1") * col("n2") /
            (col("n1") + col("n2")))) /
          nullif(sqrt(lit(2.0) * col("n1") * col("n2") *
            (lit(2.0) * col("n1") * col("n2") - col("n1") - col("n2")) /
            ((col("n1") + col("n2")).cast("double") *
              (col("n1") + col("n2")) *
              (col("n1") + col("n2") - 1))), lit(0.0)), 4).as("z"))
  }

  /** Local-peak detection on a daily series: a day is a peak when its
    * value strictly exceeds every value in the `w` days on EACH side
    * (interior days only — a boundary day with a truncated neighborhood
    * is reported never, not speculatively), with prominence-lite
    * v − max(neighbors) ≥ `minProminence` cutting ripple. Windows run
    * over the pre-aggregated daily spine (day-cardinality rows, the KS
    * convention); all comparisons are exact longs. */
  def peaks(daily: DataFrame, day: Column, v: Column, w: Int = 3,
            minProminence: Long = 0L): DataFrame = {
    require(w >= 1, "w must be >= 1")
    val d = daily.select(day.as("day"), v.cast("long").as("x"))
      .where(col("day").isNotNull && col("x").isNotNull)
    val wl = Window.orderBy("day").rowsBetween(-w, -1)
    val wr = Window.orderBy("day").rowsBetween(1, w)
    d.withColumn("lmax", max("x").over(wl))
      .withColumn("rmax", max("x").over(wr))
      .withColumn("lcnt", count(lit(1)).over(wl))
      .withColumn("rcnt", count(lit(1)).over(wr))
      .where(col("lcnt") === w && col("rcnt") === w &&
        col("x") > col("lmax") && col("x") > col("rmax") &&
        col("x") - greatest(col("lmax"), col("rmax")) >= minProminence)
      .select(col("day"), col("x").as("value"),
        (col("x") - greatest(col("lmax"), col("rmax"))).as("prominence"))
      .orderBy("day")
  }

  /** Burstiness report per key over the FULL epoch-day spine between
    * the global min and max day (zero days count — a key active one
    * day a month is bursty precisely because of its silent days):
    * Fano factor F = var/μ of daily counts (population variance) and
    * the Goh-Barabási burstiness index B = (σ−μ)/(σ+μ) ∈ [−1, 1]
    * (−1 periodic, 0 Poisson, →1 bursty).
    *
    * The spine is generated integers (epoch-day numbers — the
    * engine-neutral FIXTURES device), keys × days rows, zero-filled by
    * LEFT join; counts are exact longs so
    * F = (n·Σc² − S²)/(n·S) is exact integers to one division and B
    * is singles over the same terms. */
  def burstiness(df: DataFrame, key: Column, ts: Column): DataFrame = {
    // long `/` long is double division in the Column API — cast back to
    // long (exact: µs values sit far below 2^53, truncation = floor for
    // positive epochs, matching the oracle's integer `//`)
    val d = df.select(key.as("k"),
        (unix_micros(ts) / lit(86400000000L)).cast("long").as("di"))
      .where(col("k").isNotNull && col("di").isNotNull)
    val counts = d.groupBy("k", "di").agg(count(lit(1)).as("c"))
    val span = d.agg(min("di").as("lo"), max("di").as("hi"))
    val keys = d.select("k").distinct()
    val spine = keys.crossJoin(broadcast(span))
      .select(col("k"), explode(sequence(col("lo"), col("hi"))).as("di"))
    val filled = spine.join(counts, Seq("k", "di"), "left")
      .select(col("k"), coalesce(col("c"), lit(0L)).as("c"))
    filled.groupBy("k")
      .agg(count(lit(1)).as("n_days"), sum("c").as("s"),
        sum(col("c") * col("c")).as("ss"))
      .withColumn("fnum", col("n_days") * col("ss") - col("s") * col("s"))
      .withColumn("fden", nullif(col("n_days") * col("s"), lit(0L)))
      .select(col("k").as("key"), col("n_days"),
        Seal.ratio4("s", "n_days").as("mean"),
        Seal.ratio4("fnum", "fden").as("fano"),
        round((sqrt((col("n_days") * col("ss") - col("s") * col("s"))
            .cast("double")) / col("n_days") -
            col("s").cast("double") / col("n_days")) /
          nullif(sqrt((col("n_days") * col("ss") - col("s") * col("s"))
            .cast("double")) / col("n_days") +
            col("s").cast("double") / col("n_days"), lit(0.0)), 4)
          .as("burstiness"))
      .orderBy("key")
  }

  /** Seasonal-naive forecast backtest: predict v̂(t) = v(t − season
    * days) wherever that day exists in the spine, and report MAE,
    * RMSE, and MAPE of the naive forecast — the baseline every real
    * forecasting model must beat, and the drift alarm when a pipeline's
    * "same day last week" assumption stops holding.
    *
    * One daily self-join at the season offset (the q144 shape), then a
    * single aggregation: |err| and err² accumulate as exact longs;
    * each MAPE term |err|/actual is a single-double op quantized to
    * 1e-6 fixed-point before its exact sum over the v ≠ 0 days (its
    * own denominator — zero-actual days are unscorable by MAPE but
    * still count in MAE/RMSE). */
  def backtestSeasonalNaive(daily: DataFrame, day: Column, v: Column,
                            season: Int = 7): DataFrame = {
    val d = daily.select(day.as("day"), v.cast("long").as("x"))
      .where(col("day").isNotNull && col("x").isNotNull)
    val prev = d.select(date_add(col("day"), season).as("day"),
      col("x").as("xp"))
    d.join(prev, "day")
      .select((col("x") - col("xp")).as("e"), col("x"))
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("e"))).as("sae"),
        sum(col("e") * col("e")).as("sse"),
        sum(when(col("x") =!= 0,
          round(abs(col("e")).cast("double") / col("x") * lit(1e6), 0)
            .cast("long"))).as("sape6"),
        sum(when(col("x") =!= 0, 1L).otherwise(0L)).as("n_mape"))
      .select(col("n_days"),
        round(col("sae").cast("double") /
          nullif(col("n_days").cast("double"), lit(0.0)), 4).as("mae"),
        round(sqrt(col("sse").cast("double") /
          nullif(col("n_days").cast("double"), lit(0.0))), 4).as("rmse"),
        round(col("sape6").cast("double") / lit(1e6) /
          nullif(col("n_mape").cast("double"), lit(0.0)), 4).as("mape"))
  }

  /** Rescaled-range (R/S) Hurst-exponent estimate of an
    * INTEGER-quantized daily series: for each window size the series
    * splits into complete chunks, each chunk's range of cumulative
    * mean-deviations over its std collapses to the ALL-INTEGER form
    *
    *   R/S = (max_j D_j − min_j D_j) / √(n·Σx² − (Σx)²),
    *   D_j = n·cum_j − j·Σx
    *
    * (the 1/n factors of R and S cancel), ln(R/S) is quantized to
    * 1e-6 fixed-point per chunk, and the Hurst exponent is the
    * closed-form OLS slope of mean ln(R/S) on ln(n) across sizes —
    * H ≈ 0.5 for a random walk, > 0.5 for trending series.
    *
    * Windows partition by (size, chunk) over the PRE-AGGREGATED daily
    * spine (the KS-statistic convention: day-cardinality rows, not the
    * corpus), so no unpartitioned corpus-scale sort exists; the
    * size×day explode is per-row. Zero-variance / zero-range chunks
    * drop via SQL-NULL (nullif before ln — Spark's ln(0)=NULL vs
    * DuckDB's −inf would otherwise diverge). */
  def hurstRs(daily: DataFrame, day: Column, v: Column,
              sizes: Seq[Int] = Seq(8, 16, 32, 64)): DataFrame = {
    require(sizes.nonEmpty && sizes.forall(_ >= 2), "sizes must be >= 2")
    val d = daily.select(day.as("day"), v.cast("long").as("x"))
      .where(col("day").isNotNull && col("x").isNotNull)
    val idx = d.withColumn("idx",
      row_number().over(Window.orderBy("day")).cast("long"))
    val sized = idx
      .withColumn("sz", explode(array(sizes.map(s => lit(s.toLong)): _*)))
      .withColumn("ch", expr("(idx - 1) DIV sz"))
    val wCum = Window.partitionBy("sz", "ch").orderBy("idx")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy("sz", "ch")
    val dev = sized
      .withColumn("cum", sum("x").over(wCum))
      .withColumn("j", row_number()
        .over(Window.partitionBy("sz", "ch").orderBy("idx")).cast("long"))
      .withColumn("sx", sum("x").over(wAll))
      .withColumn("sxx", sum(col("x") * col("x")).over(wAll))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .where(col("cnt") === col("sz"))
      .select(col("sz"), col("ch"),
        (col("sz") * col("cum") - col("j") * col("sx")).as("dj"),
        col("sx"), col("sxx"))
    val chunks = dev.groupBy("sz", "ch")
      .agg(max("dj").as("mx"), min("dj").as("mn"),
        min("sx").as("csx"), min("sxx").as("csxx"))
      .select(col("sz"),
        round(log(nullif((col("mx") - col("mn")).cast("double"), lit(0.0)) /
          nullif(sqrt((col("sz") * col("csxx") - col("csx") * col("csx"))
            .cast("double")), lit(0.0))) * lit(1e6), 0).cast("long")
          .as("q6"))
      .where(col("q6").isNotNull)
    val perSize = chunks.groupBy("sz")
      .agg(count(lit(1)).as("n_chunks"), sum("q6").as("s6"))
      .select(col("sz"), col("n_chunks"),
        round(col("s6").cast("double") / col("n_chunks"), 0).cast("long")
          .as("y6"),
        round(log(col("sz").cast("double")) * lit(1e6), 0).cast("long")
          .as("x6"))
    val ols = perSize.agg(count(lit(1)).as("k"), sum("x6").as("osx"),
        sum("y6").as("osy"), sum(col("x6") * col("y6")).as("osxy"),
        sum(col("x6") * col("x6")).as("osxx"))
      .withColumn("hnum", col("k") * col("osxy") - col("osx") * col("osy"))
      .withColumn("hden",
        nullif(col("k") * col("osxx") - col("osx") * col("osx"), lit(0L)))
      .select(Seal.ratio4("hnum", "hden").as("hurst"))
    perSize.select(col("sz").as("size"), col("n_chunks"),
        Seal.pow4("y6", 6).as("mean_ln_rs"))
      .crossJoin(broadcast(ols))
      .orderBy("size")
  }
}
