package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExprs.idiv

/** Distributed total-order device: global row_number / running sums over
  * an arbitrary total order WITHOUT a single-partition window — the
  * generalization of [[RankEval.aucRocBucketed]]'s monotone-prefix
  * decomposition (and [[TrainOrder.shardAssign]]'s md5-prefix twin) to
  * ANY order, via range partitioning:
  *
  *  1. `repartitionByRange(P, order)` — the range partitioner puts every
  *     row of partition i before every row of partition i+1 in the
  *     order (deterministic sampled bounds; rows with EQUAL order keys
  *     never split across partitions — getPartition is a function of
  *     the key alone);
  *  2. per-partition prefix (window PARTITIONED by spark_partition_id —
  *     parallel, executor-sized);
  *  3. a partition spine of per-partition counts/sums (≤ P rows BY
  *     CONSTRUCTION — the one unpartitioned window in the device runs
  *     on a frame grouped by spark_partition_id, whose cardinality is
  *     the shuffle-partition CONFIG, not the corpus; the plan audit
  *     proves exactly this shape) broadcast back as exclusive offsets.
  *
  * global = offset + within-partition prefix — exactly the
  * single-window answer for any total order. If `order` is not total,
  * row_number resolves ties arbitrarily within a partition, but
  * tie-group reductions over it (min → rank(), max, count) remain
  * deterministic because a tie group never spans partitions.
  *
  * This is the drop-in the RankEval/aucRoc scaladocs used to defer to
  * prose ("past ~10⁷, pre-bucket…"): same answer, scale-shaped plan.
  */
object Ranked {

  /** Global row_number (1..n, long) over `order` as column `out`. */
  def withRowNumber(df: DataFrame, order: Seq[Column], out: String): DataFrame =
    withPrefix(df, order, Nil, Some(out))

  /** Running [unbounded preceding .. current row] sums of each
    * `(expression, outName)` in `sums` — and optionally a global
    * row_number as `rnOut` — over the total order, in ONE device pass
    * (one range shuffle, one spine). All existing columns pass
    * through. */
  def withPrefix(df: DataFrame, order: Seq[Column],
                 sums: Seq[(Column, String)],
                 rnOut: Option[String] = None): DataFrame = {
    require(sums.nonEmpty || rnOut.nonEmpty, "nothing to compute")
    val parts =
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // stage sum operands as named columns so the in-partition windows
    // and the spine aggregation provably share the same expression
    val staged = sums.zipWithIndex.foldLeft(df) {
      case (d, ((c, _), i)) => d.withColumn(s"__v$i", c)
    }
    // ONE materialization (the q266 checkpoint rule): the offset spine
    // and the in-partition prefixes MUST see the same physical
    // partitioning, but a lazily recomputed range exchange does not
    // guarantee that — its bounds come from sampling the input AS
    // EXECUTED, and two executions of a join-shaped input can sample
    // different rows and cut different ranges, silently corrupting the
    // offsets. Pin the partitioned frame, then derive __rpid from the
    // PINNED partitions.
    val p = staged.repartitionByRange(parts, order: _*)
      .localCheckpoint()
      .withColumn("__rpid", spark_partition_id().cast("long"))
    val wRun = Window.partitionBy("__rpid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRn = Window.partitionBy("__rpid").orderBy(order: _*)
    val within0 = rnOut.foldLeft(p)((d, o) =>
      d.withColumn(o, row_number().over(wRn).cast("long")))
    val within = sums.zipWithIndex.foldLeft(within0) {
      case (d, ((_, o), i)) => d.withColumn(o, sum(s"__v$i").over(wRun))
    }
    // exclusive offsets over the ≤ P-row partition spine
    val wS = Window.orderBy("__rpid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val aggs = count(lit(1)).as("__c") +:
      sums.indices.map(i => sum(s"__v$i").as(s"__s$i"))
    val off = p.groupBy("__rpid").agg(aggs.head, aggs.tail: _*)
      .select(col("__rpid") +:
        coalesce(sum("__c").over(wS), lit(0L)).as("__oc") +:
        sums.indices.map(i =>
          coalesce(sum(s"__s$i").over(wS), lit(0L)).as(s"__o$i")): _*)
    val joined = within.join(broadcast(off), "__rpid")
    val withRn = rnOut.foldLeft(joined)((d, o) =>
      d.withColumn(o, col(o) + col("__oc")))
    val withSums = sums.zipWithIndex.foldLeft(withRn) {
      case (d, ((_, o), i)) => d.withColumn(o, col(o) + col(s"__o$i"))
    }
    withSums.drop("__rpid" :: "__oc" ::
      sums.indices.toList.flatMap(i => List(s"__v$i", s"__o$i")): _*)
  }

  /** The SQL-standard ntile(bins) of global row rn of n — closed form
    * from [[withRowNumber]]'s output: the first n mod bins tiles carry
    * ⌈n/bins⌉ rows, the rest ⌊n/bins⌋ (exact integer arithmetic;
    * matches Spark's and DuckDB's ntile bit for bit). */
  def ntileOf(rn: Column, n: Column, bins: Int): Column = {
    require(bins >= 1, "bins must be >= 1")
    val b = lit(bins.toLong)
    val base = idiv(n, b)
    val rem = pmod(n, b)
    val cut = rem * (base + 1L)
    when(rn <= cut, idiv(rn - 1L, base + 1L) + 1L)
      .otherwise(rem + idiv(rn - 1L - cut, base) + 1L)
  }
}
