package graft

import org.apache.spark.sql.functions._
import Queries.QDef

/** Evaluation / privacy / maintenance query batch (q191+): classifier
  * readouts (exact AUC, precision-recall@k, calibration) over a
  * customer-risk score, k-anonymity / l-diversity release profiling
  * with a generalization ladder, and a size-budgeted compaction plan.
  * Same oracle conventions as [[Queries]] (FIXTURES.md): integer
  * quantization before every cross-row sum, one sealed round(,4)
  * division per statistic, total ORDER BY.
  *
  * The shared (score, label) table for q191–q193: one unit per
  * customer, score = lifetime spend in cents (0 for customers with no
  * orders — the LEFT join keeps them, they are exactly the units a
  * naive inner join would silently drop), label = account balance
  * below zero. "Does spend rank delinquent accounts first?" is the
  * offline-eval shape; the metrics don't care that the fixture's
  * answer is "barely".
  */
object EvalQueries {
  private def T(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.t(s, dir, n)

  /** (id, seg, y = acctbal<0, s = spend cents) per customer — the unit
    * table q191–q193 and q200/q201 share (one definition, so the global
    * and per-segment readouts can never disagree on the units; queries
    * that don't use `seg` let column pruning drop it). */
  private def scoredUnits(s: org.apache.spark.sql.SparkSession,
                          dir: String): org.apache.spark.sql.DataFrame = {
    val spend = T(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
        .as("cents"))
    T(s, dir, "customer")
      .select(col("c_custkey").as("id"), col("c_mktsegment").as("seg"),
        when(col("c_acctbal") < 0, 1L).otherwise(0L).as("y"))
      .join(spend, col("id") === col("o_custkey"), "left")
      .select(col("id"), col("seg"), col("y"),
        coalesce(col("cents"), lit(0L)).as("s"))
  }

  private val unitsSql =
    """sp AS (SELECT o_custkey AS ck,
      |        CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
      |          AS BIGINT) AS cents
      |      FROM orders GROUP BY 1),
      |u AS (SELECT c_custkey AS id,
      |        CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS y,
      |        coalesce(cents, 0) AS s
      |      FROM customer LEFT JOIN sp ON c_custkey = ck)""".stripMargin

  /** [[RankEval.aucRoc]]: exact Mann-Whitney AUC with average-rank tie
    * handling, integer rank sums end to end, one sealed division. */
  private val q191 = QDef("q191_auc_roc",
    (s, dir) => RankEval.aucRoc(scoredUnits(s, dir), col("s"), col("y"))
      .orderBy("n_pos"),
    Some(s"""WITH $unitsSql,
      |bs AS (SELECT s, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(y) AS BIGINT) AS np FROM u GROUP BY 1),
      |c AS (SELECT n, np, CAST(sum(n) OVER (ORDER BY s ROWS BETWEEN
      |         UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |      FROM bs),
      |t AS (SELECT CAST(sum(np) AS BIGINT) AS n_pos,
      |        CAST(sum(n - np) AS BIGINT) AS n_neg,
      |        CAST(sum(np * (2 * cum - n + 1)) AS BIGINT) AS r2p FROM c)
      |SELECT n_pos, n_neg,
      |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
      |    round(CAST(r2p - n_pos * (n_pos + 1) AS DOUBLE)
      |      / (2.0 * n_pos * n_neg), 4) END AS auc
      |FROM t ORDER BY n_pos""".stripMargin))

  /** [[RankEval.topkMetrics]] at k = 10/50/100, c_custkey tie-break. */
  private val q192 = QDef("q192_topk_precision_recall",
    (s, dir) => RankEval.topkMetrics(scoredUnits(s, dir), col("s"),
      col("y"), col("id"), Seq(10, 50, 100))
      .withColumnRenamed("precision", "prec"),
    Some(s"""WITH $unitsSql,
      |r AS (SELECT id, y, s, CAST(row_number() OVER
      |        (ORDER BY s DESC, id) AS BIGINT) AS rk FROM u),
      |np AS (SELECT CAST(sum(y) AS BIGINT) AS npt FROM u),
      |ks AS (SELECT CAST(k AS BIGINT) AS k
      |       FROM (VALUES (10), (50), (100)) t(k)),
      |m AS (SELECT k, CAST(sum(y) AS BIGINT) AS n_pos_topk
      |      FROM r JOIN ks ON rk <= k GROUP BY 1)
      |SELECT k, n_pos_topk,
      |  CAST((2 * CAST(n_pos_topk AS HUGEINT) * 10000 + k) // (2 * k)
      |    AS DOUBLE) / 10000.0 AS prec,
      |  CASE WHEN npt > 0 THEN
      |    CAST((2 * CAST(n_pos_topk AS HUGEINT) * 10000 + npt) //
      |      (2 * npt) AS DOUBLE) / 10000.0 END AS recall
      |FROM m CROSS JOIN np ORDER BY k""".stripMargin))

  /** [[RankEval.calibrationBins]]: decile calibration table — equal-size
    * ntile bins under the same deterministic (score desc, id) order in
    * both engines. */
  private val q193 = QDef("q193_calibration_bins",
    (s, dir) => RankEval.calibrationBins(scoredUnits(s, dir), col("s"),
      col("y"), col("id"), bins = 10),
    Some(s"""WITH $unitsSql,
      |b AS (SELECT CAST(ntile(10) OVER (ORDER BY s DESC, id) AS BIGINT)
      |          AS bin, y, s FROM u)
      |SELECT bin, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(y) AS BIGINT) AS n_pos,
      |  CAST((2 * CAST(sum(y) AS HUGEINT) * 10000 + count(*)) //
      |    (2 * count(*)) AS DOUBLE) / 10000.0 AS pos_rate,
      |  CAST(CASE WHEN sum(s) < 0
      |    THEN -((2 * CAST(-sum(s) AS HUGEINT) * 10000 + count(*)) //
      |      (2 * count(*)))
      |    ELSE (2 * CAST(sum(s) AS HUGEINT) * 10000 + count(*)) //
      |      (2 * count(*)) END AS DOUBLE) / 10000.0 AS mean_score
      |FROM b GROUP BY 1 ORDER BY bin""".stripMargin))

  /** Quasi-identifier set for the release-audit queries: nation ×
    * market segment × $1000 account-balance band — floor division, so
    * negative balances band monotonically in both engines. */
  private def custBand = floor(col("c_acctbal") / 1000.0).cast("long")
  private val bandSql = "CAST(floor(c_acctbal / 1000.0) AS BIGINT)"

  /** [[Privacy.kAnonymityReport]] at k=5 over (nation, segment, band):
    * one QI-keyed aggregation + a report-row re-aggregation. */
  private val q194 = QDef("q194_k_anonymity",
    (s, dir) => Privacy.kAnonymityReport(T(s, dir, "customer"),
      Seq("nat" -> col("c_nationkey"), "seg" -> col("c_mktsegment"),
        "band" -> custBand), k = 5L)
      .orderBy("n_rows"),
    Some(s"""WITH g AS (SELECT c_nationkey, c_mktsegment,
      |        $bandSql AS band, CAST(count(*) AS BIGINT) AS n
      |      FROM customer GROUP BY 1, 2, 3)
      |SELECT CAST(sum(n) AS BIGINT) AS n_rows,
      |  CAST(count(*) AS BIGINT) AS n_groups,
      |  CAST(min(n) AS BIGINT) AS min_group_size,
      |  CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_violating,
      |  CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
      |    AS rows_at_risk,
      |  CAST((2 * CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS HUGEINT)
      |    * 10000 + sum(n)) // (2 * sum(n)) AS DOUBLE) / 10000.0
      |    AS at_risk_share
      |FROM g ORDER BY n_rows""".stripMargin))

  /** [[Privacy.lDiversityReport]] at l=4 over (nation, segment) with the
    * balance band as the sensitive attribute: flags QI groups whose
    * sensitive values are too uniform even when the group is large. */
  private val q195 = QDef("q195_l_diversity",
    (s, dir) => Privacy.lDiversityReport(T(s, dir, "customer"),
      Seq("nat" -> col("c_nationkey"), "seg" -> col("c_mktsegment")),
      custBand, l = 4L)
      .orderBy("n_groups"),
    Some(s"""WITH g AS (SELECT c_nationkey, c_mktsegment,
      |        CAST(count(*) AS BIGINT) AS n,
      |        CAST(count(DISTINCT $bandSql) AS BIGINT) AS ndv
      |      FROM customer GROUP BY 1, 2)
      |SELECT CAST(count(*) AS BIGINT) AS n_groups,
      |  CAST(min(ndv) AS BIGINT) AS min_diversity,
      |  CAST(sum(CASE WHEN ndv < 4 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_low_diversity,
      |  CAST(sum(CASE WHEN ndv < 4 THEN n ELSE 0 END) AS BIGINT)
      |    AS rows_in_low
      |FROM g ORDER BY n_groups""".stripMargin))

  /** [[Privacy.generalizationLadder]]: the k=5 anonymity profile at
    * three QI coarsenings — full (nation, segment, band), drop the band,
    * then coarsen nation to region (broadcast of the 25-row nation
    * table). The reviewer's pick-the-level table. */
  private val q196 = QDef("q196_generalization_ladder",
    (s, dir) => {
      val c = T(s, dir, "customer").join(
        broadcast(T(s, dir, "nation")
          .select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      Privacy.generalizationLadder(c, Seq(
        "l0_nat_seg_band" -> Seq("nat" -> col("c_nationkey"),
          "seg" -> col("c_mktsegment"), "band" -> custBand),
        "l1_nat_seg" -> Seq("nat" -> col("c_nationkey"),
          "seg" -> col("c_mktsegment")),
        "l2_region_seg" -> Seq("reg" -> col("n_regionkey"),
          "seg" -> col("c_mktsegment"))), k = 5L)
        .orderBy("level")
    },
    Some(s"""WITH c AS (SELECT c_nationkey, c_mktsegment,
      |        $bandSql AS band, n_regionkey
      |      FROM customer JOIN nation ON c_nationkey = n_nationkey),
      |g0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c
      |       GROUP BY c_nationkey, c_mktsegment, band),
      |g1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c
      |       GROUP BY c_nationkey, c_mktsegment),
      |g2 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c
      |       GROUP BY n_regionkey, c_mktsegment),
      |r0 AS (SELECT 'l0_nat_seg_band' AS level, CAST(sum(n) AS BIGINT)
      |         AS n_rows, CAST(count(*) AS BIGINT) AS n_groups,
      |        CAST(min(n) AS BIGINT) AS min_group_size,
      |        CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
      |          AS n_violating,
      |        CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
      |          AS rows_at_risk,
      |        CAST((2 * CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END)
      |          AS HUGEINT) * 10000 + sum(n)) // (2 * sum(n)) AS DOUBLE)
      |          / 10000.0 AS at_risk_share FROM g0),
      |r1 AS (SELECT 'l1_nat_seg', CAST(sum(n) AS BIGINT),
      |        CAST(count(*) AS BIGINT), CAST(min(n) AS BIGINT),
      |        CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT),
      |        CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT),
      |        CAST((2 * CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END)
      |          AS HUGEINT) * 10000 + sum(n)) // (2 * sum(n)) AS DOUBLE)
      |          / 10000.0 FROM g1),
      |r2 AS (SELECT 'l2_region_seg', CAST(sum(n) AS BIGINT),
      |        CAST(count(*) AS BIGINT), CAST(min(n) AS BIGINT),
      |        CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT),
      |        CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT),
      |        CAST((2 * CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END)
      |          AS HUGEINT) * 10000 + sum(n)) // (2 * sum(n)) AS DOUBLE)
      |          / 10000.0 FROM g2)
      |SELECT * FROM r0 UNION ALL SELECT * FROM r1
      |UNION ALL SELECT * FROM r2 ORDER BY level""".stripMargin))

  /** [[Layout.compactionPlan]]: pack the per-day order counts into
    * 500-row bins next-fit by date — the "merge small date partitions"
    * maintenance work list. The window runs over the ~2400-day spine,
    * never the raw rows. */
  private val q197 = QDef("q197_compaction_plan",
    (s, dir) => Layout.compactionPlan(
      T(s, dir, "orders").select(
        datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
          .cast("long").as("d")),
      col("d"), lit(1L), budget = 500L),
    Some("""WITH pu AS (SELECT date_diff('day', DATE '1970-01-01',
      |          CAST(o_orderdate AS DATE)) AS u,
      |        CAST(count(*) AS BIGINT) AS sz
      |      FROM orders GROUP BY 1),
      |c AS (SELECT u, sz, CAST(sum(sz) OVER (ORDER BY u ROWS BETWEEN
      |         UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |      FROM pu),
      |b AS (SELECT u, sz, CAST(floor(CAST(cum - sz AS DOUBLE) / 500.0)
      |          AS BIGINT) AS bin FROM c)
      |SELECT bin, CAST(count(*) AS BIGINT) AS n_units,
      |  CAST(sum(sz) AS BIGINT) AS total_size,
      |  CAST(min(u) AS BIGINT) AS first_unit,
      |  CAST(max(u) AS BIGINT) AS last_unit
      |FROM b GROUP BY 1 ORDER BY bin""".stripMargin))

  /** [[Expectations.refIntegrityCheck]] across every star-schema edge —
    * the release-gate referential audit: six anti-join counts, each
    * keyed by its fk (dimension keysets broadcast; the two lineitem fact
    * checks shuffle the fact side once each). */
  private val q198 = QDef("q198_fk_audit",
    (s, dir) => {
      import Expectations.refIntegrityCheck
      val li = T(s, dir, "lineitem")
      val o = T(s, dir, "orders")
      Expectations.report(
        refIntegrityCheck(li, "lineitem_orderkey", col("l_orderkey"),
          o, col("o_orderkey")),
        refIntegrityCheck(li, "lineitem_partkey", col("l_partkey"),
          T(s, dir, "part"), col("p_partkey")),
        refIntegrityCheck(li, "lineitem_suppkey", col("l_suppkey"),
          T(s, dir, "supplier"), col("s_suppkey")),
        refIntegrityCheck(o, "orders_custkey", col("o_custkey"),
          T(s, dir, "customer"), col("c_custkey")),
        refIntegrityCheck(T(s, dir, "customer"), "customer_nationkey",
          col("c_nationkey"), T(s, dir, "nation"), col("n_nationkey")),
        refIntegrityCheck(T(s, dir, "nation"), "nation_regionkey",
          col("n_regionkey"), T(s, dir, "region"), col("r_regionkey")))
        .orderBy("check_name")
    },
    Some("""WITH checks AS (
      |  SELECT 'lineitem_orderkey' AS check_name, CAST(count(*) AS BIGINT)
      |      AS n_violations
      |    FROM lineitem WHERE NOT EXISTS
      |      (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
      |  UNION ALL SELECT 'lineitem_partkey', CAST(count(*) AS BIGINT)
      |    FROM lineitem WHERE NOT EXISTS
      |      (SELECT 1 FROM part WHERE p_partkey = l_partkey)
      |  UNION ALL SELECT 'lineitem_suppkey', CAST(count(*) AS BIGINT)
      |    FROM lineitem WHERE NOT EXISTS
      |      (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey)
      |  UNION ALL SELECT 'orders_custkey', CAST(count(*) AS BIGINT)
      |    FROM orders WHERE NOT EXISTS
      |      (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
      |  UNION ALL SELECT 'customer_nationkey', CAST(count(*) AS BIGINT)
      |    FROM customer WHERE NOT EXISTS
      |      (SELECT 1 FROM nation WHERE n_nationkey = c_nationkey)
      |  UNION ALL SELECT 'nation_regionkey', CAST(count(*) AS BIGINT)
      |    FROM nation WHERE NOT EXISTS
      |      (SELECT 1 FROM region WHERE r_regionkey = n_regionkey))
      |SELECT check_name, n_violations,
      |  CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS pass
      |FROM checks ORDER BY check_name""".stripMargin))

  /** [[Profile.columnProfile]] over lineitem's numeric columns (currency
    * quantized to integer cents/percents first): one expand-aggregation,
    * row-per-column report. */
  private val q199 = QDef("q199_column_profile",
    (s, dir) => Profile.columnProfile(T(s, dir, "lineitem"), Seq(
      "qty" -> col("l_quantity"),
      "price_cents" -> expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)"),
      "discount_pct" -> expr("CAST(round(l_discount * 100, 0) AS BIGINT)"),
      "tax_pct" -> expr("CAST(round(l_tax * 100, 0) AS BIGINT)")))
      .orderBy("column_name"),
    Some("""WITH b AS (SELECT CAST(l_quantity AS DOUBLE) AS qty,
      |        CAST(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
      |          AS DOUBLE) AS price_cents,
      |        CAST(CAST(round(l_discount * 100, 0) AS BIGINT) AS DOUBLE)
      |          AS discount_pct,
      |        CAST(CAST(round(l_tax * 100, 0) AS BIGINT) AS DOUBLE)
      |          AS tax_pct
      |      FROM lineitem)
      |SELECT 'qty' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
      |    CAST(count(*) - count(qty) AS BIGINT) AS n_null,
      |    CAST(count(DISTINCT qty) AS BIGINT) AS ndv,
      |    min(qty) AS min_v, max(qty) AS max_v FROM b
      |UNION ALL SELECT 'price_cents', CAST(count(*) AS BIGINT),
      |    CAST(count(*) - count(price_cents) AS BIGINT),
      |    CAST(count(DISTINCT price_cents) AS BIGINT),
      |    min(price_cents), max(price_cents) FROM b
      |UNION ALL SELECT 'discount_pct', CAST(count(*) AS BIGINT),
      |    CAST(count(*) - count(discount_pct) AS BIGINT),
      |    CAST(count(DISTINCT discount_pct) AS BIGINT),
      |    min(discount_pct), max(discount_pct) FROM b
      |UNION ALL SELECT 'tax_pct', CAST(count(*) AS BIGINT),
      |    CAST(count(*) - count(tax_pct) AS BIGINT),
      |    CAST(count(DISTINCT tax_pct) AS BIGINT),
      |    min(tax_pct), max(tax_pct) FROM b
      |ORDER BY column_name""".stripMargin))

  /** [[RankEval.aucRocBy]]: the q191 readout per market segment — the
    * "is the score fair across cohorts?" slice; group-partitioned
    * windows parallelize the spine sort. */
  private val q200 = QDef("q200_group_auc",
    (s, dir) => RankEval.aucRocBy(scoredUnits(s, dir), col("seg"),
      col("s"), col("y"))
      .withColumnRenamed("g", "segment").orderBy("segment"),
    Some(s"""WITH $unitsSql,
      |us AS (SELECT c_mktsegment AS seg, y, s
      |       FROM u JOIN customer ON id = c_custkey),
      |bs AS (SELECT seg, s, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(y) AS BIGINT) AS np FROM us GROUP BY 1, 2),
      |c AS (SELECT seg, n, np, CAST(sum(n) OVER (PARTITION BY seg
      |         ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
      |         ROW) AS BIGINT) AS cum FROM bs),
      |t AS (SELECT seg, CAST(sum(np) AS BIGINT) AS n_pos,
      |        CAST(sum(n - np) AS BIGINT) AS n_neg,
      |        CAST(sum(np * (2 * cum - n + 1)) AS BIGINT) AS r2p
      |      FROM c GROUP BY 1)
      |SELECT seg AS segment, n_pos, n_neg,
      |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
      |    round(CAST(r2p - n_pos * (n_pos + 1) AS DOUBLE)
      |      / (2.0 * n_pos * n_neg), 4) END AS auc
      |FROM t ORDER BY segment""".stripMargin))

  /** [[RankEval.aucRocBucketed]]: q191's scale twin (the q26/q60
    * convention) — identical answer, but the cumulative rank pass is a
    * bucket-spine prefix + bucket-partitioned windows instead of one
    * global single-task sort. Oracle = q191's SQL verbatim. */
  private val q201 = QDef("q201_auc_bucketed",
    (s, dir) => RankEval.aucRocBucketed(scoredUnits(s, dir), col("s"),
      col("y"), bucketWidth = 100000L).orderBy("n_pos"),
    q191.oracle)

  /** [[RankEval.cohensKappa]]: chance-corrected agreement between two
    * derived binary "raters" over orders (urgency flag vs high-price
    * flag) — the annotation-quality readout; five long sums, two sealed
    * divisions. */
  private val q202 = QDef("q202_cohens_kappa",
    (s, dir) => RankEval.cohensKappa(T(s, dir, "orders"),
      col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long"),
      (col("o_totalprice") >= 150000).cast("long"))
      .orderBy("n"),
    Some("""WITH b AS (SELECT CASE WHEN o_orderpriority IN
      |          ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS a,
      |        CASE WHEN o_totalprice >= 150000 THEN 1 ELSE 0 END AS bb
      |      FROM orders
      |      WHERE o_orderpriority IS NOT NULL
      |        AND o_totalprice IS NOT NULL),
      |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(a) AS BIGINT) AS na1,
      |        CAST(sum(bb) AS BIGINT) AS nb1,
      |        CAST(sum(CASE WHEN a = bb THEN 1 ELSE 0 END) AS BIGINT)
      |          AS agree FROM b),
      |c AS (SELECT n, agree,
      |        na1 * nb1 + (n - na1) * (n - nb1) AS cx FROM s)
      |SELECT n,
      |  CAST((2 * CAST(agree AS HUGEINT) * 10000 + n) // (2 * n)
      |    AS DOUBLE) / 10000.0 AS po,
      |  CAST((2 * CAST(cx AS HUGEINT) * 10000 + n * n) // (2 * n * n)
      |    AS DOUBLE) / 10000.0 AS pe,
      |  CASE WHEN n * n <> cx THEN
      |    CAST(CASE WHEN n * agree - cx < 0
      |      THEN -((2 * CAST(-(n * agree - cx) AS HUGEINT) * 10000 +
      |        (n * n - cx)) // (2 * (n * n - cx)))
      |      ELSE (2 * CAST(n * agree - cx AS HUGEINT) * 10000 +
      |        (n * n - cx)) // (2 * (n * n - cx)) END AS DOUBLE) / 10000.0
      |  END AS kappa
      |FROM c ORDER BY n""".stripMargin))

  /** [[RankEval.spearmanRho]]: does catalog price rank sales volume?
    * Rank correlation over the part spine (unsold parts kept at qty 0
    * via the LEFT join), integer average-rank arithmetic end to end. */
  private val q203 = QDef("q203_spearman_price_volume",
    (s, dir) => {
      val sold = T(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_quantity").cast("long")).as("qty"))
      val p = T(s, dir, "part")
        .select(col("p_partkey"),
          expr("CAST(round(p_retailprice * 100, 0) AS BIGINT)").as("x"))
        .join(sold, col("p_partkey") === col("l_partkey"), "left")
        .select(col("x"), coalesce(col("qty"), lit(0L)).as("y"))
      RankEval.spearmanRho(p, col("x"), col("y")).orderBy("n")
    },
    Some("""WITH sold AS (SELECT l_partkey AS pk,
      |        CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      |      FROM lineitem GROUP BY 1),
      |p AS (SELECT CAST(round(p_retailprice * 100, 0) AS BIGINT) AS x,
      |        coalesce(qty, 0) AS y
      |      FROM part LEFT JOIN sold ON p_partkey = pk),
      |r AS (SELECT 2 * rank() OVER (ORDER BY x)
      |          + count(*) OVER (PARTITION BY x) - 1 AS rx,
      |        2 * rank() OVER (ORDER BY y)
      |          + count(*) OVER (PARTITION BY y) - 1 AS ry FROM p),
      |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
      |        CAST(sum(rx * rx) AS BIGINT) AS sxx,
      |        CAST(sum(ry * ry) AS BIGINT) AS syy,
      |        CAST(sum(rx * ry) AS BIGINT) AS sxy FROM r)
      |SELECT n, CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
      |  THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
      |    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
      |      * CAST(n * syy - sy * sy AS DOUBLE)), 4) END AS spearman_rho
      |FROM s ORDER BY n""".stripMargin))

  /** [[Spatial.gridJoinCount]]: customers as deterministic integer
    * points, suppliers as 300×300 boxes on a 10000² plane, counted per
    * box through the cell-keyed equi-join (grid 500 → ≤4 cells/box).
    * The oracle states the naive all-pairs containment — same answer,
    * which is exactly the point: the grid join is the scale spelling of
    * the BETWEEN join. */
  private val q204 = QDef("q204_spatial_grid_join",
    (s, dir) => {
      val pts = T(s, dir, "customer").select(col("c_custkey").as("id"),
        (col("c_custkey") * 7919 % 10000).as("x"),
        (col("c_custkey") * 104729 % 10000).as("y"))
      val bx = T(s, dir, "supplier").select(col("s_suppkey").as("id"),
          (col("s_suppkey") * 7919 % 10000).as("cx"),
          (col("s_suppkey") * 104729 % 10000).as("cy"))
        .select(col("id"), (col("cx") - 150).as("xlo"),
          (col("cx") + 150).as("xhi"), (col("cy") - 150).as("ylo"),
          (col("cy") + 150).as("yhi"))
      Spatial.gridJoinCount(pts, bx, cellSize = 500L)
        .withColumnRenamed("bid", "supp_key").orderBy("supp_key")
    },
    Some("""WITH p AS (SELECT c_custkey AS id,
      |        c_custkey * 7919 % 10000 AS x,
      |        c_custkey * 104729 % 10000 AS y FROM customer),
      |b AS (SELECT s_suppkey AS id,
      |        s_suppkey * 7919 % 10000 AS cx,
      |        s_suppkey * 104729 % 10000 AS cy FROM supplier),
      |h AS (SELECT b.id, CAST(count(*) AS BIGINT) AS n
      |      FROM b JOIN p ON p.x BETWEEN b.cx - 150 AND b.cx + 150
      |        AND p.y BETWEEN b.cy - 150 AND b.cy + 150
      |      GROUP BY 1)
      |SELECT b.id AS supp_key, coalesce(n, 0) AS n_points
      |FROM b LEFT JOIN h ON b.id = h.id ORDER BY supp_key""".stripMargin))

  /** [[Mutations.snapshotDiff]]: publish-gate audit between two derived
    * versions of orders — keys mod 100 ≥ 98 appear only in "new"
    * (added), mod 97 = 0 only in "old" (removed), mod 31 bumps the
    * price, mod 41 flips the status (changed; both per-column counts
    * tracked). ONE key-keyed full-outer shuffle + a count aggregation. */
  private val q205 = QDef("q205_snapshot_diff",
    (s, dir) => {
      val base = T(s, dir, "orders").select(col("o_orderkey").as("k"),
        expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents"),
        expr("CAST(round(o_totalprice * 110, 0) AS BIGINT)").as("cents110"),
        col("o_orderstatus").as("st"))
      val oldV = base.where(col("k") % 100 < 98)
        .select(col("k"), col("cents"), col("st"))
      val newV = base.where(col("k") % 97 =!= 0)
        .select(col("k"),
          when(col("k") % 31 === 0, col("cents110")).otherwise(col("cents"))
            .as("cents"),
          when(col("k") % 41 === 0, lit("X")).otherwise(col("st")).as("st"))
      Mutations.snapshotDiff(oldV, newV, Seq("k"), Seq("cents", "st"))
        .orderBy("n_added")
    },
    Some("""WITH base AS (SELECT o_orderkey AS k,
      |        CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
      |        CAST(round(o_totalprice * 110, 0) AS BIGINT) AS cents110,
      |        o_orderstatus AS st FROM orders),
      |o AS (SELECT k, cents, st FROM base WHERE k % 100 < 98),
      |n AS (SELECT k, CASE WHEN k % 31 = 0 THEN cents110 ELSE cents END
      |          AS cents,
      |        CASE WHEN k % 41 = 0 THEN 'X' ELSE st END AS st
      |      FROM base WHERE k % 97 <> 0),
      |j AS (SELECT o.k AS ok, n.k AS nk, o.cents AS oc, n.cents AS nc,
      |        o.st AS os, n.st AS ns
      |      FROM o FULL OUTER JOIN n ON o.k = n.k)
      |SELECT CAST(sum(CASE WHEN ok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_added,
      |  CAST(sum(CASE WHEN nk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_removed,
      |  CAST(sum(CASE WHEN ok IS NOT NULL AND nk IS NOT NULL AND
      |    (oc IS DISTINCT FROM nc OR os IS DISTINCT FROM ns) THEN 1
      |    ELSE 0 END) AS BIGINT) AS n_changed,
      |  CAST(sum(CASE WHEN ok IS NOT NULL AND nk IS NOT NULL AND
      |    oc IS NOT DISTINCT FROM nc AND os IS NOT DISTINCT FROM ns
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
      |  CAST(sum(CASE WHEN ok IS NOT NULL AND nk IS NOT NULL AND
      |    oc IS DISTINCT FROM nc THEN 1 ELSE 0 END) AS BIGINT)
      |    AS changed_cents,
      |  CAST(sum(CASE WHEN ok IS NOT NULL AND nk IS NOT NULL AND
      |    os IS DISTINCT FROM ns THEN 1 ELSE 0 END) AS BIGINT)
      |    AS changed_st
      |FROM j ORDER BY n_added""".stripMargin))

  /** Encoding-health audit ([[TextAnalysis.patternCount]]): control /
    * non-ASCII / replacement-character counts per document — the
    * mojibake gate before corpus entry. Pure regexp length-difference
    * expressions, identical RE2-compatible escapes in both engines. */
  private val q206 = QDef("q206_encoding_quality",
    (s, dir) => {
      import TextAnalysis._
      T(s, dir, "documents").select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          patternCount(col("text"), CtrlPattern).cast("long").as("n_ctrl"),
          patternCount(col("text"), NonAsciiPattern).cast("long")
            .as("n_non_ascii"),
          patternCount(col("text"), ReplacementPattern).cast("long")
            .as("n_repl"))
        .select(col("doc_id"), col("n_chars"), col("n_ctrl"),
          col("n_non_ascii"), col("n_repl"),
          // coalesce: NULL text gives NULL counts in both engines, but
          // the oracle's CASE falls through to ELSE 0 — mirror that so
          // the flag is never three-valued
          coalesce((col("n_ctrl") > 0 || col("n_repl") > 0).cast("long"),
            lit(0L)).as("flagged"))
        .orderBy("doc_id")
    },
    Some("""WITH c AS (SELECT doc_id, CAST(length(text) AS BIGINT)
      |          AS n_chars,
      |        CAST(length(text) - length(regexp_replace(text,
      |          '[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g')) AS BIGINT)
      |          AS n_ctrl,
      |        CAST(length(text) - length(regexp_replace(text,
      |          '[^\x00-\x7F]', '', 'g')) AS BIGINT) AS n_non_ascii,
      |        CAST(length(text) - length(regexp_replace(text,
      |          '\x{FFFD}', '', 'g')) AS BIGINT) AS n_repl
      |      FROM documents)
      |SELECT doc_id, n_chars, n_ctrl, n_non_ascii, n_repl,
      |  CAST(CASE WHEN n_ctrl > 0 OR n_repl > 0 THEN 1 ELSE 0 END
      |    AS BIGINT) AS flagged
      |FROM c ORDER BY doc_id""".stripMargin))

  /** [[Sampling.temporalSplitReport]]: time split of events with a
    * 3-day embargo (train < Jan 18, test ≥ Jan 21) — the leakage-safe
    * alternative to hash splits on autocorrelated data; min_gap_sec ≥
    * the embargo width certifies it on the data itself. */
  private val q207 = QDef("q207_temporal_split_embargo",
    (s, dir) => Sampling.temporalSplitReport(T(s, dir, "events"),
      col("user_id"), col("ts"), "2024-01-18", "2024-01-21")
      .orderBy("n_train"),
    Some("""WITH s AS (SELECT user_id AS k, epoch_us(ts) AS us,
      |        CASE WHEN ts < TIMESTAMP '2024-01-18' THEN 'train'
      |          WHEN ts < TIMESTAMP '2024-01-21' THEN 'embargo'
      |          ELSE 'test' END AS sp
      |      FROM events WHERE ts IS NOT NULL),
      |c AS (SELECT
      |    CAST(coalesce(sum(CASE WHEN sp = 'train' THEN 1 ELSE 0 END), 0)
      |      AS BIGINT) AS n_train,
      |    CAST(coalesce(sum(CASE WHEN sp = 'embargo' THEN 1 ELSE 0 END), 0)
      |      AS BIGINT) AS n_embargo,
      |    CAST(coalesce(sum(CASE WHEN sp = 'test' THEN 1 ELSE 0 END), 0)
      |      AS BIGINT) AS n_test FROM s),
      |p AS (SELECT k, max(CASE WHEN sp = 'train' THEN us END) AS maxtr,
      |        min(CASE WHEN sp = 'test' THEN us END) AS mite
      |      FROM s GROUP BY 1),
      |g AS (SELECT CAST(count(*) AS BIGINT) AS n_units_overlap,
      |        CAST(min(mite - maxtr) AS BIGINT) AS mg
      |      FROM p WHERE maxtr IS NOT NULL AND mite IS NOT NULL)
      |SELECT n_train, n_embargo, n_test, n_units_overlap,
      |  CAST(CASE WHEN mg < 0 THEN -((2 * CAST(-(mg) AS HUGEINT) + 100)
      |    // 200) ELSE (2 * CAST(mg AS HUGEINT) + 100) // 200 END
      |    AS DOUBLE) / 10000.0 AS min_gap_sec
      |FROM c CROSS JOIN g ORDER BY n_train""".stripMargin))

  /** MAP@10 per market segment: average precision of the
    * quantity-popularity ranking against binary revenue relevance
    * (≥ $50k segment revenue), mean-able across segments — the
    * complement to q175's graded nDCG. prec@k terms are quantized to
    * 1e-6 longs before the per-segment sum (the DCG device); AP
    * denominator is min(n_rel, 10), NULL when a segment has no
    * relevant part. The rank window is filtered to rk ≤ 10 directly
    * above the row_number, so WindowGroupLimit keeps 10 rows per
    * segment before any sort. */
  private val q208 = QDef("q208_map_at_10",
    (s, dir) => {
      val li = T(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_partkey").as("pk"),
        col("l_quantity").cast("long").as("qty"),
        expr("CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)")
          .as("cents"))
      val oc = T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        .join(T(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment").as("seg")),
          col("o_custkey") === col("c_custkey"))
      val a = li.join(oc, col("l_orderkey") === col("o_orderkey"))
        .groupBy("seg", "pk")
        .agg(sum("qty").as("qty"), sum("cents").as("cents"))
      RankEval.mapAtK(a, col("seg"), col("qty"),
          (col("cents") >= 5000000L).cast("long"), col("pk"), k = 10)
        .select(col("g").as("segment"), col("n_rel"),
          col("ap").as("ap10"))
        .orderBy("segment")
    },
    Some("""WITH a AS (SELECT c_mktsegment AS seg, l_partkey AS pk,
      |        CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
      |        CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100,
      |          0) AS BIGINT)) AS BIGINT) AS cents
      |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |        JOIN customer ON o_custkey = c_custkey
      |      GROUP BY 1, 2),
      |b AS (SELECT seg, pk, qty,
      |        CASE WHEN cents >= 5000000 THEN 1 ELSE 0 END AS rel
      |      FROM a),
      |nr AS (SELECT seg, CAST(sum(rel) AS BIGINT) AS n_rel
      |       FROM b GROUP BY 1),
      |r AS (SELECT seg, rel, CAST(row_number() OVER (PARTITION BY seg
      |          ORDER BY qty DESC, pk) AS BIGINT) AS rk FROM b),
      |h AS (SELECT seg, rel, rk, CAST(sum(rel) OVER (PARTITION BY seg
      |          ORDER BY rk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
      |          ROW) AS BIGINT) AS hits
      |      FROM r WHERE rk <= 10),
      |t AS (SELECT seg, CAST(sum(CASE WHEN rel = 1 THEN
      |          CAST(round(1000000.0 * hits / rk, 0) AS BIGINT)
      |          ELSE 0 END) AS BIGINT) AS tsum
      |      FROM h GROUP BY 1)
      |SELECT seg AS segment, n_rel,
      |  CASE WHEN n_rel > 0 THEN round(CAST(tsum AS DOUBLE)
      |    / (1000000.0 * least(n_rel, 10)), 4) END AS ap10
      |FROM t JOIN nr USING (seg) ORDER BY segment""".stripMargin))

  /** Group-integrity k-fold assignment: folds hash the GROUP key
    * (user), not the row, so all of a unit's events land in one fold —
    * the cross-validation analogue of q207's leakage guard (a row-level
    * hash split would put one user's near-duplicate events in several
    * folds). Per-fold sizes plus a certification column: the count of
    * groups spanning >1 fold, zero BY CONSTRUCTION and proven on the
    * data (the q207/q204 self-certifying-report device). */
  private val q209 = QDef("q209_group_kfold",
    (s, dir) => {
      val folds = (0 to 4).map(i => s"f$i" -> 0.2)
      val f = T(s, dir, "events").select(col("user_id"),
        Sampling.splitAssign(col("user_id"), folds, "kf").as("fold"))
      val per = f.groupBy("fold").agg(count(lit(1)).as("n_rows"),
        countDistinct("user_id").as("n_users"))
      val leaky = f.groupBy("user_id")
        .agg(countDistinct("fold").as("nf"))
        .agg(coalesce(sum(when(col("nf") > 1, 1L).otherwise(0L)), lit(0L))
          .as("n_groups_split"))
      per.crossJoin(broadcast(leaky)).orderBy("fold")
    },
    Some("""WITH f AS (SELECT user_id,
      |        CASE WHEN hv < 200000 THEN 'f0' WHEN hv < 400000 THEN 'f1'
      |             WHEN hv < 600000 THEN 'f2' WHEN hv < 800000 THEN 'f3'
      |             ELSE 'f4' END AS fold
      |      FROM (SELECT user_id,
      |        ('0x' || substr(md5(CAST(user_id AS VARCHAR) || 'kf'), 1,
      |          15))::BIGINT % 1000000 AS hv FROM events)),
      |p AS (SELECT fold, CAST(count(*) AS BIGINT) AS n_rows,
      |        CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |      FROM f GROUP BY 1),
      |l AS (SELECT CAST(coalesce(sum(CASE WHEN nf > 1 THEN 1 ELSE 0 END),
      |          0) AS BIGINT) AS n_groups_split
      |      FROM (SELECT user_id, count(DISTINCT fold) AS nf
      |            FROM f GROUP BY 1))
      |SELECT fold, n_rows, n_users, n_groups_split
      |FROM p CROSS JOIN l ORDER BY fold""".stripMargin))

  /** [[RankEval.mrr]]: mean reciprocal rank of the first delinquent
    * account per segment under the spend ranking — the "one good
    * answer" counterpart to q208's MAP over the same unit table. */
  private val q220 = QDef("q220_mrr",
    (s, dir) => RankEval.mrr(scoredUnits(s, dir), col("seg"), col("s"),
      col("y"), col("id")),
    Some(s"""WITH $unitsSql,
      |us AS (SELECT c_mktsegment AS seg, id, y, s
      |       FROM u JOIN customer ON id = c_custkey),
      |r AS (SELECT seg, y, row_number() OVER (PARTITION BY seg
      |        ORDER BY s DESC, id) AS rn FROM us),
      |fr AS (SELECT seg, min(rn) AS fr FROM r WHERE y = 1 GROUP BY 1),
      |ng AS (SELECT CAST(count(DISTINCT seg) AS BIGINT) AS n_groups
      |       FROM us),
      |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_with_rel,
      |        CAST(sum(CAST(round(1000000.0 / fr, 0) AS BIGINT))
      |          AS BIGINT) AS srr
      |       FROM fr)
      |SELECT n_groups, n_with_rel,
      |  round(CAST(srr AS DOUBLE) / (1000000.0 * n_with_rel), 4) AS mrr
      |FROM ag CROSS JOIN ng""".stripMargin))

  def all: Seq[QDef] = Seq(q191, q192, q193, q194, q195, q196, q197,
    q198, q199, q200, q201, q202, q203, q204, q205, q206, q207, q208,
    q209, q220)
}
