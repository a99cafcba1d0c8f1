package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and dataset splitting.
  *
  * Training pipelines need samples and train/val/test splits that are
  * REPRODUCIBLE (same rows on every run, every engine, any partitioning)
  * and STABLE under data growth (a row's assignment never depends on what
  * other rows exist). `rand()`-based sampling gives neither; hashing a key
  * column gives both: keep a row iff `hash(key) mod D < frac·D`. The hash
  * is the same md5-prefix used by [[Dedup.hash60]], so every operator here
  * is expressible in the DuckDB oracle verbatim.
  *
  * Scale shape: pure narrow predicates/projections — no shuffle, no state;
  * sampling 100 TB costs one scan.
  */
object Sampling {
  private val Denom = 1000000L

  /** Per-mille-precision deterministic sample: keep iff
    * hash(key ∥ salt) mod 1e6 < frac·1e6. `salt` decorrelates different
    * samples over the same keys. */
  def hashSample(df: DataFrame, key: Column, frac: Double, salt: String = ""): DataFrame = {
    require(frac >= 0 && frac <= 1, s"frac must be in [0,1], got $frac")
    df.where(pmod(Dedup.hash60(concat(key.cast("string"), lit(salt))), lit(Denom))
      < (frac * Denom).toLong)
  }

  /** Deterministic fixed-size per-group sample: the `n` rows of each group
    * whose key hashes smallest (hash order = an arbitrary-but-reproducible
    * shuffle; key tie-break keeps it total). Groups smaller than `n` keep
    * all rows. Null-keyed rows are dropped — consistent with
    * [[hashSample]], and it keeps the ordering engine-independent (Spark
    * sorts nulls first, SQL engines default to nulls last). One shuffle
    * keyed by the group — the standard "sample k docs per source/language/
    * domain" pattern for corpus balancing. */
  def stratifiedFixed(df: DataFrame, group: Column, key: Column, n: Int,
                      salt: String = ""): DataFrame = {
    require(n > 0, "n must be positive")
    import org.apache.spark.sql.expressions.Window
    val h = pmod(Dedup.hash60(concat(key.cast("string"), lit(salt))), lit(Denom))
    val w = Window.partitionBy(group).orderBy(h, key)
    df.where(key.isNotNull)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .drop("__rn")
  }

  /** Train/val/test assignment from cumulative fraction bands of the same
    * hash — every key lands in exactly one split, independent of all other
    * rows. `fracs` are (name, fraction) and must sum to 1; the last band
    * is the catch-all, so rounding in the cut points can never drop a
    * row. */
  def splitAssign(key: Column, fracs: Seq[(String, Double)], salt: String = ""): Column = {
    require(fracs.nonEmpty && math.abs(fracs.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val h = pmod(Dedup.hash60(concat(key.cast("string"), lit(salt))), lit(Denom))
    val cuts = fracs.scanLeft(0L) { case (acc, (_, f)) => acc + (f * Denom).toLong }.tail
    // last band is catch-all so rounding in the cut points can't drop rows;
    // NULL keys get a NULL split (the family's drop-null convention) —
    // falling through to the catch-all would silently concentrate every
    // null-key row in one split (train/test leakage)
    val assigned = fracs.init.zip(cuts.init)
      .foldRight(lit(fracs.last._1): Column) {
        case (((name, _), cut), other) => when(h < cut, lit(name)).otherwise(other)
      }
    when(key.isNotNull, assigned)
  }

  /** Source-mixture resampling — the dataset-mixing step of a pretraining
    * pipeline: each source gets an epoch weight (2.5 ⇒ every doc appears
    * twice, plus a deterministic 50% hash-sample third copy; 0 ⇒ source
    * excluded). Output rows carry an `epoch` index (1-based) so downstream
    * shuffling/packing can decorrelate the copies. NULL-key rows drop
    * (the family convention — the fractional copy needs the hash, and a
    * split base/fractional treatment would emit copy counts no other
    * Sampling op's null handling matches). Per-row work only —
    * floor(w) is a literal-map lookup and the fractional copy reuses the
    * [[hashSample]] band, so mixing 100 TB is one scan; `explode` of a
    * ≤⌈w⌉-element sequence adds no shuffle. Weights with exact binary
    * fractions (.0/.25/.5/.75) keep the hash-band cut integer-exact across
    * engines. */
  def mixtureSample(df: DataFrame, key: Column, source: Column,
                    weights: Seq[(String, Double)], salt: String = ""): DataFrame = {
    require(weights.forall(_._2 >= 0), "weights must be non-negative")
    val w = weights.foldRight(lit(0.0)) { case ((s, v), other) =>
      when(source === s, lit(v)).otherwise(other)
    }
    val base = floor(w).cast("long")
    val fracCut = ((w - floor(w)) * Denom).cast("long")
    val extra = (pmod(Dedup.hash60(concat(key.cast("string"), lit(salt))), lit(Denom))
      < fracCut).cast("long")
    val n = base + extra
    df.withColumn("__n", n).where(col("__n") > 0)
      .withColumn("epoch", explode(sequence(lit(1L), col("__n"))))
      .drop("__n")
  }

  /** Length-curriculum bucketing: assign every doc to one of `nBuckets`
    * length bands cut at exact interpolated percentiles, with a
    * deterministic hash-shuffled position within each band (curriculum
    * training consumes buckets short→long, shuffled within a band; length
    * bucketing also minimizes padding waste in batch assembly). The cuts
    * are a 1-row global aggregate broadcast against the corpus (same
    * narrow-assignment shape as [[splitAssign]]) — NOT a global ntile,
    * whose single-partition window would serialize at scale. Ties across a
    * cut land in the lower bucket in both engines (strict `>` on identical
    * interpolated doubles). */
  def lengthCurriculum(df: DataFrame, id: Column, lenExpr: Column,
                       nBuckets: Int, salt: String = ""): DataFrame = {
    require(nBuckets >= 2, "need at least 2 buckets")
    import org.apache.spark.sql.expressions.Window
    val fracs = (1 until nBuckets).map(i => lit(i.toDouble / nBuckets))
    val cuts = df.select(percentile(lenExpr, array(fracs: _*))
      .as("__cuts")) // exact interpolated percentile = quantile_cont (q09 parity)
    val bucket = (1 until nBuckets).foldLeft(lit(1)) { (acc, i) =>
      acc + (lenExpr > element_at(col("__cuts"), i)).cast("int")
    }
    val posH = pmod(Dedup.hash60(concat(lit("$cur"), id.cast("string"), lit(salt))),
      lit(Denom))
    val wdw = Window.partitionBy(col("bucket")).orderBy(posH, id)
    df.crossJoin(broadcast(cuts))
      .withColumn("bucket", bucket)
      .withColumn("pos", row_number().over(wdw).cast("long"))
      .drop("__cuts")
  }

  /** Deterministic global shuffle + sharding — the training-order writer.
    * Training wants examples in a reproducible pseudo-random order, split
    * into fixed shard files; `ORDER BY rand()` is neither reproducible nor
    * scalable (one global sort). Instead: shard = hash(key ∥ salt) mod n
    * (stable under growth, like every assignment here), position = rank of
    * a SECOND, decorrelated hash within the shard. One shuffle keyed by
    * shard; the within-shard sort is per-shard local, so parallelism = shard
    * count and no global sort ever happens. Writers consume (shard,
    * position) as (file, offset). */
  def shuffleShards(df: DataFrame, key: Column, nShards: Int,
                    salt: String = ""): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    import org.apache.spark.sql.expressions.Window
    val shard = pmod(Dedup.hash60(concat(key.cast("string"), lit(salt))), lit(nShards))
    // "$pos" prefix decorrelates the position hash from the shard hash
    val posH = pmod(Dedup.hash60(concat(lit("$pos"), key.cast("string"), lit(salt))),
      lit(Denom))
    val w = Window.partitionBy(col("__shard")).orderBy(posH, key)
    df.withColumn("__shard", shard)
      .withColumn("position", row_number().over(w).cast("long"))
      .withColumnRenamed("__shard", "shard")
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006): each row gets priority −ln(u)/w where u ∈ (0,1] is a
    * hash-uniform deterministic "random" and w its weight; the n smallest
    * priorities are exactly a w-proportional sample without replacement.
    * `rand()`-free, so the same rows are drawn on every run and engine —
    * the quality-weighted corpus subsampling step.
    *
    * u = (hash60(key ∥ salt) + 1) / 2^60 (never 0, so ln is finite). The
    * priority is scaled ×1e6 and rounded to 4 dp before ranking so both
    * engines rank identical values (key tie-break → total order).
    *
    * Scale shape: the priority is a narrow per-row expression; the global
    * top-n compiles to TakeOrderedAndProject — per-partition heap top-n +
    * driver merge of n·partitions rows, never a global sort. */
  def weightedSample(df: DataFrame, key: Column, weight: Column, n: Int,
                     salt: String = ""): DataFrame = {
    require(n > 0, "n must be positive")
    val u = (Dedup.hash60(concat(key.cast("string"), lit(salt))) + lit(1L))
      .cast("double") / lit(1152921504606846976.0) // 2^60
    val priority = round(-log(u) * lit(1000000.0) / weight, 4)
    // w <= 0 / NULL would make priority NULL, which sorts NULLS-FIRST —
    // the exact inverse of "zero weight is never drawn" — so such rows
    // are excluded from the draw entirely
    df.where(weight > 0)
      .withColumn("priority", priority)
      .orderBy(col("priority"), key)
      .limit(n)
  }

  /** Deterministic negative sampling for contrastive training: for each
    * anchor row, draw `k` pseudo-random "negative" partners from the
    * corpus WITHOUT a global index. Corpus rows hash into `buckets`
    * buckets; draw j of an anchor targets bucket hash(id·"#"·j) mod B and
    * takes that bucket's smallest id (its second-smallest when the anchor
    * IS the bucket minimum — self-pairs are never emitted).
    *
    * Why this shape at 100 TB: the textbook "pick a random global row
    * number" needs a total row index — a global sort/zipWithIndex
    * antipattern. Bucket minima need one corpus shuffle keyed by bucket
    * into a B-row table that broadcasts onto the anchors' exploded draws;
    * anchors never shuffle. Draws are hash-deterministic: any engine
    * recomputes the identical pairs. Collision caveat: draws of one
    * anchor landing in the same bucket repeat a negative (acceptable for
    * contrastive loss; raise B to thin it). Shortfall caveat: a draw
    * whose bucket holds no corpus row (B ≫ corpus size), or only the
    * anchor itself, vanishes — anchors then carry FEWER than k
    * negatives. Size B ≲ corpus/10 so every bucket is populated, and
    * count per-anchor negatives downstream if the training loop requires
    * exactly k. */
  def negativeSample(corpus: DataFrame, id: Column, anchors: DataFrame,
                     anchorId: Column, k: Int, buckets: Int): DataFrame = {
    require(k >= 1 && buckets >= 2, "need k >= 1 and buckets >= 2")
    val bucketOf = (c: Column) => pmod(Dedup.hash60(c.cast("string")), lit(buckets.toLong))
    // smallest two ids per bucket WITHOUT sorting buckets: min, broadcast
    // it back, then min-above-min — two map-side-combinable aggs, so no
    // per-bucket sort ever happens (buckets hold N/B rows at scale)
    val base = corpus.select(id.cast("long").as("__cid"), bucketOf(id).as("__b"))
    val m1 = base.groupBy("__b").agg(min("__cid").as("__m1"))
    val mins = base.join(broadcast(m1), "__b")
      .groupBy("__b")
      .agg(min("__m1").as("__m1"),
        min(when(col("__cid") > col("__m1"), col("__cid"))).as("__m2"))
    val draws = anchors.select(anchorId.as("anchor_id"))
      .select(col("anchor_id"), explode(sequence(lit(1), lit(k))).as("draw"))
      .withColumn("__b", pmod(Dedup.hash60(
        concat(col("anchor_id").cast("string"), lit("#"), col("draw").cast("string"))),
        lit(buckets.toLong)))
    draws.join(broadcast(mins), "__b")
      .select(col("anchor_id"), col("draw").cast("long").as("draw"),
        when(col("__m1") =!= col("anchor_id"), col("__m1"))
          .otherwise(col("__m2")).as("negative_id"))
      .where(col("negative_id").isNotNull)
  }

  /** Temporal split with an embargo gap — the time-series leakage guard
    * (the purged-split device from financial ML): train takes events
    * before `trainEnd`, test takes events from `testStart` on, and the
    * embargo window between them is DROPPED from both so no test
    * example sits within `testStart − trainEnd` of any training
    * example. [[splitAssign]]'s hash split is the wrong tool for
    * autocorrelated data — a user's adjacent events land on both sides
    * of a hash split and leak the near future into training. */
  def temporalSplit(ts: Column, trainEnd: String, testStart: String): Column = {
    validateCutoffs(trainEnd, testStart)
    // NULL timestamps get a NULL split (the splitAssign convention) —
    // the otherwise-branch would silently concentrate every NULL-ts row
    // in the test split
    when(ts.isNull, lit(null).cast("string"))
      .when(ts < lit(trainEnd).cast("timestamp"), "train")
      .when(ts < lit(testStart).cast("timestamp"), "embargo")
      .otherwise("test")
  }

  /** Cutoffs must PARSE, not just order: under the pinned ANSI-off
    * config an unparseable string casts to SQL NULL, every comparison
    * against it is NULL, and the report silently certifies a split that
    * never happened — fail on the driver instead. Accepts ISO dates or
    * date-times. */
  private def validateCutoffs(trainEnd: String, testStart: String): Unit = {
    def parse(s: String): java.time.LocalDateTime =
      try java.time.LocalDateTime.parse(s)
      catch { case _: java.time.format.DateTimeParseException =>
        java.time.LocalDate.parse(s).atStartOfDay() // throws if bad too
      }
    val (a, b) = (parse(trainEnd), parse(testStart))
    require(!a.isAfter(b),
      s"trainEnd $trainEnd must not be after testStart $testStart")
  }

  /** One-row certification report for [[temporalSplit]]: split sizes
    * plus, over units (users/series) with events on BOTH sides, the
    * minimum test-minus-train gap in seconds — which is ≥ the embargo
    * width BY CONSTRUCTION; emitting it proves the guarantee on the
    * actual data rather than asserting it. NULL min_gap_sec when no
    * unit spans both splits. Two map-side-combinable aggregations
    * (split counts; per-unit max-train/min-test), nothing row-sorted. */
  def temporalSplitReport(df: DataFrame, unit: Column, ts: Column,
                          trainEnd: String, testStart: String): DataFrame = {
    validateCutoffs(trainEnd, testStart)
    val s = df.select(unit.as("k"), unix_micros(ts).as("us"),
        temporalSplit(ts, trainEnd, testStart).as("sp"))
      .where(col("us").isNotNull)
    val counts = s.groupBy().agg(
      coalesce(sum(when(col("sp") === "train", 1L).otherwise(0L)), lit(0L))
        .as("n_train"),
      coalesce(sum(when(col("sp") === "embargo", 1L).otherwise(0L)), lit(0L))
        .as("n_embargo"),
      coalesce(sum(when(col("sp") === "test", 1L).otherwise(0L)), lit(0L))
        .as("n_test"))
    val per = s.groupBy("k").agg(
        max(when(col("sp") === "train", col("us"))).as("maxtr"),
        min(when(col("sp") === "test", col("us"))).as("mite"))
      .where(col("maxtr").isNotNull && col("mite").isNotNull)
      .agg(count(lit(1)).as("n_units_overlap"),
        min(col("mite") - col("maxtr")).as("mg"))
    counts.crossJoin(per)
      .select(col("n_train"), col("n_embargo"), col("n_test"),
        col("n_units_overlap"),
        // µs gap → seconds sealed in integer space (Seal.pow4): k/1e6
        // ties at 4 decimals whenever k ≡ 50 (mod 100)
        Seal.pow4("mg", 6).as("min_gap_sec"))
  }

  /** Kish design effect of an INTEGER-weighted sample, per group:
    * deff = n·Σw²/(Σw)², n_eff = (Σw)²/Σw² — "how much estimation
    * power do these weights throw away". One map-side-combinable
    * aggregation; both readouts are exact integer rationals sealed via
    * [[Seal]] (squared sums ride decimal(38,0)). Non-positive weights
    * are excluded — they are errors for a sampling weight, and keeping
    * them would let (Σw)² collapse. */
  def designEffect(df: DataFrame, group: Column, w: Column): DataFrame = {
    val d = df.select(group.as("g"), w.cast("long").as("w"))
      .where(col("g").isNotNull && col("w").isNotNull && col("w") > 0)
    d.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("w").as("sw"),
        sum(col("w") * col("w")).as("sww"))
      .withColumn("dnum", col("n").cast("decimal(38,0)") * col("sww"))
      .withColumn("dden", col("sw").cast("decimal(38,0)") * col("sw"))
      .withColumn("enum", col("sw").cast("decimal(38,0)") * col("sw"))
      .withColumn("eden", col("sww").cast("decimal(38,0)"))
      .select(col("g").as("grp"), col("n"), col("sw").as("sum_w"),
        Seal.ratio4("dnum", "dden").as("deff"),
        Seal.ratio4("enum", "eden").as("n_eff"))
      .orderBy("grp")
  }

  /** Neyman-optimal stratified allocation: for a fixed total sample
    * size n, allocate n_h ∝ N_h·S_h (stratum size × stratum standard
    * deviation of the target metric) — the variance-minimizing design.
    * Emits per stratum: N_h, S_h, the allocation SHARE and the rounded
    * n_h. S_h is a √ of an exact integer rational (sample variance
    * from long power sums), so the share is transcendental-composed
    * and keeps the double seal (boundary-free); counts stay exact. */
  def neymanAllocation(df: DataFrame, stratum: Column, v: Column,
                       totalN: Long): DataFrame = {
    require(totalN >= 1, "totalN must be positive")
    val per = df.select(stratum.as("h"), v.cast("long").as("x"))
      .where(col("h").isNotNull && col("x").isNotNull)
      .groupBy("h")
      .agg(count(lit(1)).as("nh"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("sh", sqrt(
        (col("nh").cast("double") * col("sxx") -
          col("sx").cast("double") * col("sx")) /
        (col("nh").cast("double") *
          nullif((col("nh") - 1).cast("double"), lit(0.0)))))
      .withColumn("nhsh", col("nh").cast("double") * col("sh"))
    val tot = per.agg(sum("nhsh").as("t"))
    per.crossJoin(broadcast(tot))
      .select(col("h").as("stratum"), col("nh").as("n_pop"),
        round(col("sh"), 4).as("s_h"),
        round(col("nhsh") / nullif(col("t"), lit(0.0)), 4).as("share"),
        round(col("nhsh") / nullif(col("t"), lit(0.0)) *
          lit(totalN.toDouble), 0).cast("long").as("n_alloc"))
      .orderBy("stratum")
  }

  /** Token-budget mixture plan: given integer mixture PARTS per source
    * (the exact-rational spelling of mixture weights) and a total token
    * budget B, each source serves
    *   tokens_served_s = parts_s·tokens_s·B / Σ_t parts_t·tokens_t,
    * i.e. epochs_s = parts_s·B / Σ_t parts_t·tokens_t — the planning
    * table a pretraining data loader consumes. One source-keyed
    * aggregation; every output is an exact integer rational sealed via
    * [[Seal]] (products through decimal(38,0)); sources absent from
    * `parts` get part 0 and drop. */
  def tokenBudgetPlan(df: DataFrame, source: Column, tokens: Column,
                      parts: Seq[(String, Long)], budget: Long): DataFrame = {
    require(parts.nonEmpty && parts.forall(_._2 >= 0), "parts must be >= 0")
    require(budget > 0, "budget must be positive")
    val pCol = parts.foldRight(lit(0L)) { case ((src, pv), other) =>
      when(source === src, lit(pv)).otherwise(other)
    }
    val per = df.select(source.as("src"), tokens.cast("long").as("tk"),
        pCol.as("p"))
      .where(col("src").isNotNull && col("tk").isNotNull && col("p") > 0)
      .groupBy("src", "p")
      .agg(count(lit(1)).as("n_docs"), sum("tk").as("tokens"))
    val tot = per.agg(sum(col("p").cast("decimal(38,0)") * col("tokens"))
      .as("den"))
    per.crossJoin(broadcast(tot))
      .withColumn("enum", col("p").cast("decimal(38,0)") * budget)
      .withColumn("snum",
        col("p").cast("decimal(38,0)") * col("tokens") * budget)
      .withColumn("dnn",
        nullif(col("den"), lit(java.math.BigDecimal.ZERO)))
      .select(col("src").as("source"), col("n_docs"), col("tokens"),
        col("p").as("mix_parts"),
        Seal.ratio4("enum", "dnn").as("epochs"),
        Seal.ratio4("snum", "dnn").as("tokens_served"))
      .orderBy("source")
  }
}
