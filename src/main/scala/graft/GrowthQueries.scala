package graft

import org.apache.spark.sql.functions._
import Queries.QDef

/** Growth/product-analytics batch (q307+): ordered funnels, cohort
  * retention, two-arm survival comparison, data-quality FD audit,
  * survey-design readouts, paired nonparametrics, embedding cluster
  * quality, and stratified allocation. Same oracle conventions as
  * [[Queries]] (FIXTURES.md): integer quantization before cross-row
  * sums, Seal-device integer rounding on exact rationals, total ORDER
  * BY.
  */
object GrowthQueries {
  private def T(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.t(s, dir, n)

  /** [[Funnel.ordered3]]: signup → view → purchase, strictly ordered
    * first-touch semantics; conversion rates and median step gaps. */
  private val q307 = QDef("q307_event_funnel",
    (s, dir) => Funnel.ordered3(T(s, dir, "events"), col("user_id"),
      col("ts"), col("event_type"), "signup", "view", "purchase"),
    Some("""WITH e AS (SELECT user_id AS u, epoch_us(ts) AS us,
      |        event_type AS l
      |      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |        AND event_type IS NOT NULL),
      |t1 AS (SELECT u, CAST(min(us) AS BIGINT) AS t1 FROM e
      |       WHERE l = 'signup' GROUP BY 1),
      |t2 AS (SELECT e.u AS u, t1, CAST(min(us) AS BIGINT) AS t2
      |       FROM e JOIN t1 ON e.u = t1.u
      |       WHERE l = 'view' AND us > t1 GROUP BY 1, 2),
      |t3 AS (SELECT e.u AS u, t2, CAST(min(us) AS BIGINT) AS t3
      |       FROM e JOIN t2 ON e.u = t2.u
      |       WHERE l = 'purchase' AND us > t2 GROUP BY 1, 2),
      |s1 AS (SELECT CAST(1 AS BIGINT) AS step, 'signup' AS label,
      |        CAST(count(*) AS BIGINT) AS n, CAST(NULL AS BIGINT) AS g2
      |       FROM t1),
      |s2 AS (SELECT CAST(2 AS BIGINT), 'view', CAST(count(*) AS BIGINT),
      |        CAST(round(quantile_cont((t2 - t1) * 2, 0.5), 0) AS BIGINT)
      |       FROM t2),
      |s3 AS (SELECT CAST(3 AS BIGINT), 'purchase',
      |        CAST(count(*) AS BIGINT),
      |        CAST(round(quantile_cont((t3 - t2) * 2, 0.5), 0) AS BIGINT)
      |       FROM t3),
      |st AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2
      |       UNION ALL SELECT * FROM s3),
      |wi AS (SELECT step, label, n, g2,
      |        lag(n) OVER (ORDER BY step) AS prev_n,
      |        first_value(n) OVER (ORDER BY step) AS first_n
      |       FROM st)
      |SELECT step, label, n AS n_reached,
      |  CAST((2 * CAST(n AS HUGEINT) * 10000 + nullif(prev_n, 0)) //
      |    (2 * nullif(prev_n, 0)) AS DOUBLE) / 10000.0 AS conv_from_prev,
      |  CAST((2 * CAST(n AS HUGEINT) * 10000 + nullif(first_n, 0)) //
      |    (2 * nullif(first_n, 0)) AS DOUBLE) / 10000.0
      |    AS conv_from_first,
      |  CAST((2 * CAST(g2 AS HUGEINT) * 10000 + 2000000) // 4000000
      |    AS DOUBLE) / 10000.0 AS median_gap_s
      |FROM wi ORDER BY step""".stripMargin))

  /** [[Funnel.cohortRetention]]: weekly signup cohorts × weeks-since,
    * the retention triangle. */
  private val q308 = QDef("q308_cohort_retention",
    (s, dir) => Funnel.cohortRetention(T(s, dir, "events"),
      col("user_id"), col("ts")),
    Some("""WITH e AS (SELECT user_id AS u, CAST(ts AS DATE) AS d
      |      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      |o AS (SELECT min(d) AS d0 FROM e),
      |wk AS (SELECT DISTINCT u,
      |        CAST(date_diff('day', d0, d) // 7 AS BIGINT) AS w
      |      FROM e CROSS JOIN o),
      |fw AS (SELECT u, CAST(min(w) AS BIGINT) AS w0 FROM wk GROUP BY 1),
      |sz AS (SELECT w0, CAST(count(*) AS BIGINT) AS n_cohort FROM fw
      |       GROUP BY 1),
      |ac AS (SELECT w0 AS cohort_week, w - w0 AS week_k,
      |        CAST(count(*) AS BIGINT) AS n_active
      |      FROM wk JOIN fw USING (u) GROUP BY 1, 2)
      |SELECT cohort_week, week_k, n_active, n_cohort,
      |  CAST((2 * CAST(n_active AS HUGEINT) * 10000 + n_cohort) //
      |    (2 * n_cohort) AS DOUBLE) / 10000.0 AS retention
      |FROM ac JOIN sz ON ac.cohort_week = sz.w0
      |ORDER BY cohort_week, week_k""".stripMargin))

  /** [[Survival.logRank]]: do even- and odd-id users churn at the same
    * rate — the two-arm Mantel-Cox test over the q176 durations. */
  private val q309 = QDef("q309_log_rank",
    (s, dir) => {
      val e = T(s, dir, "events").select(col("user_id"),
        to_date(col("ts")).as("d"))
      val span = e.groupBy("user_id")
        .agg(min("d").as("fd"), max("d").as("ld"))
      val obsEnd = e.agg(max("d").as("obs_end"))
      val dur = span.crossJoin(broadcast(obsEnd)).select(
        datediff(col("ld"), col("fd")).as("dur"),
        when(datediff(col("obs_end"), col("ld")) >= 1, 1).otherwise(0)
          .as("ev"),
        when(col("user_id") % 2 === 0, "A").otherwise("B").as("g"))
      Survival.logRank(dur, col("dur"), col("ev"), col("g"), "A", "B")
    },
    Some("""WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
      |sp AS (SELECT user_id, min(d) AS fd, max(d) AS ld FROM e GROUP BY 1),
      |oe AS (SELECT max(d) AS obs_end FROM e),
      |dur AS (SELECT CAST(date_diff('day', fd, ld) AS BIGINT) AS t,
      |         CASE WHEN date_diff('day', ld, obs_end) >= 1
      |           THEN 1 ELSE 0 END AS ev,
      |         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS g
      |       FROM sp CROSS JOIN oe),
      |byt AS (SELECT t,
      |         CAST(sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT)
      |           AS na_at,
      |         CAST(sum(CASE WHEN g = 'B' THEN 1 ELSE 0 END) AS BIGINT)
      |           AS nb_at,
      |         CAST(sum(CASE WHEN g = 'A' THEN ev ELSE 0 END) AS BIGINT)
      |           AS da_at,
      |         CAST(sum(CASE WHEN g = 'B' THEN ev ELSE 0 END) AS BIGINT)
      |           AS db_at
      |       FROM dur WHERE t IS NOT NULL GROUP BY 1),
      |tot AS (SELECT CAST(sum(na_at) AS BIGINT) AS na_tot,
      |         CAST(sum(nb_at) AS BIGINT) AS nb_tot FROM byt),
      |r AS (SELECT t, da_at, db_at,
      |        na_tot - coalesce(CAST(sum(na_at) OVER (ORDER BY t ROWS
      |          BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      |          0) AS na_r,
      |        nb_tot - coalesce(CAST(sum(nb_at) OVER (ORDER BY t ROWS
      |          BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      |          0) AS nb_r
      |      FROM byt CROSS JOIN tot),
      |tm AS (SELECT da_at,
      |        CAST(round(CAST(da_at + db_at AS DOUBLE) * na_r /
      |          (na_r + nb_r) * 1000000.0, 0) AS BIGINT) AS e6,
      |        CASE WHEN na_r + nb_r > 1 THEN
      |          CAST(round(CAST(da_at + db_at AS DOUBLE) * na_r * nb_r *
      |            (na_r + nb_r - da_at - db_at) /
      |            (CAST(na_r + nb_r AS DOUBLE) * (na_r + nb_r) *
      |             (na_r + nb_r - 1)) * 1000000.0, 0) AS BIGINT)
      |        ELSE 0 END AS v6
      |      FROM r WHERE da_at + db_at > 0),
      |ag AS (SELECT CAST(sum(da_at) AS BIGINT) AS o_a,
      |        CAST(sum(e6) AS BIGINT) AS e6,
      |        CAST(sum(v6) AS BIGINT) AS v6 FROM tm)
      |SELECT o_a AS observed_a,
      |  CAST(CASE WHEN e6 < 0
      |    THEN -((2 * CAST(-e6 AS HUGEINT) + 100) // 200)
      |    ELSE (2 * CAST(e6 AS HUGEINT) + 100) // 200 END AS DOUBLE)
      |    / 10000.0 AS expected_a,
      |  CAST((2 * CAST(o_a * 1000000 - e6 AS HUGEINT) *
      |    (o_a * 1000000 - e6) * 10000 +
      |    nullif(1000000 * CAST(v6 AS HUGEINT), 0)) //
      |    (2 * nullif(1000000 * CAST(v6 AS HUGEINT), 0)) AS DOUBLE)
      |    / 10000.0 AS chi2
      |FROM ag""".stripMargin))

  /** [[Profile.fdViolations]]: does l_suppkey functionally determine
    * l_linestatus — the "can I treat this as a key" audit. */
  private val q310 = QDef("q310_fd_violations",
    (s, dir) => Profile.fdViolations(T(s, dir, "lineitem"),
      col("l_suppkey"), col("l_linestatus")),
    Some("""WITH ce AS (SELECT l_suppkey AS a, l_linestatus AS b,
      |        CAST(count(*) AS BIGINT) AS c
      |      FROM lineitem
      |      WHERE l_suppkey IS NOT NULL AND l_linestatus IS NOT NULL
      |      GROUP BY 1, 2),
      |pa AS (SELECT a, CAST(sum(c) AS BIGINT) AS n,
      |        CAST(max(c) AS BIGINT) AS maxc FROM ce GROUP BY 1),
      |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
      |        CAST(sum(n) AS BIGINT) AS n_rows,
      |        CAST(sum(CASE WHEN n > maxc THEN 1 ELSE 0 END) AS BIGINT)
      |          AS n_keys_violating,
      |        CAST(sum(n - maxc) AS BIGINT) AS n_violations
      |      FROM pa)
      |SELECT n_keys, n_rows, n_keys_violating, n_violations,
      |  CAST((2 * CAST(n_violations AS HUGEINT) * 10000 +
      |    nullif(n_rows, 0)) // (2 * nullif(n_rows, 0)) AS DOUBLE)
      |    / 10000.0 AS violation_rate
      |FROM ag""".stripMargin))

  /** [[Sampling.designEffect]]: Kish deff / effective n of
    * balance-proportional weights per market segment. */
  private val q311 = QDef("q311_design_effect",
    (s, dir) => Sampling.designEffect(
      T(s, dir, "customer").select(col("c_mktsegment").as("g"),
        expr("CAST(round(c_acctbal, 0) AS BIGINT)").as("w")),
      col("g"), col("w")),
    Some("""WITH d AS (SELECT c_mktsegment AS g,
      |        CAST(round(c_acctbal, 0) AS BIGINT) AS w
      |      FROM customer
      |      WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL
      |        AND CAST(round(c_acctbal, 0) AS BIGINT) > 0),
      |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(w) AS BIGINT) AS sw,
      |        CAST(sum(w * w) AS BIGINT) AS sww FROM d GROUP BY 1)
      |SELECT g AS grp, n, sw AS sum_w,
      |  CAST((2 * CAST(n AS HUGEINT) * sww * 10000 +
      |    CAST(sw AS HUGEINT) * sw) // (2 * CAST(sw AS HUGEINT) * sw)
      |    AS DOUBLE) / 10000.0 AS deff,
      |  CAST((2 * CAST(sw AS HUGEINT) * sw * 10000 + sww) // (2 * sww)
      |    AS DOUBLE) / 10000.0 AS n_eff
      |FROM a ORDER BY grp""".stripMargin))

  /** [[Inference.wilcoxonSignedRank]]: did per-customer kilodollar
    * order volume shift 1994 → 1995, pairing customers active in both
    * years. */
  private val q312 = QDef("q312_wilcoxon_signed_rank",
    (s, dir) => {
      val per = T(s, dir, "orders")
        .where(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
        .groupBy("o_custkey")
        .agg(sum(when(year(col("o_orderdate")) === 1994,
            expr("CAST(round(o_totalprice / 1000.0, 0) AS BIGINT)"))
          .otherwise(0L)).as("pre"),
          sum(when(year(col("o_orderdate")) === 1995,
            expr("CAST(round(o_totalprice / 1000.0, 0) AS BIGINT)"))
          .otherwise(0L)).as("post"),
          max(when(year(col("o_orderdate")) === 1994, 1L).otherwise(0L))
            .as("h94"),
          max(when(year(col("o_orderdate")) === 1995, 1L).otherwise(0L))
            .as("h95"))
        .where(col("h94") === 1 && col("h95") === 1)
      Inference.wilcoxonSignedRank(per, col("pre"), col("post"))
    },
    Some("""WITH per AS (SELECT o_custkey,
      |        CAST(sum(CASE WHEN year(o_orderdate) = 1994 THEN
      |          CAST(round(o_totalprice / 1000.0, 0) AS BIGINT)
      |          ELSE 0 END) AS BIGINT) AS pre,
      |        CAST(sum(CASE WHEN year(o_orderdate) = 1995 THEN
      |          CAST(round(o_totalprice / 1000.0, 0) AS BIGINT)
      |          ELSE 0 END) AS BIGINT) AS post,
      |        max(CASE WHEN year(o_orderdate) = 1994 THEN 1 ELSE 0 END)
      |          AS h94,
      |        max(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END)
      |          AS h95
      |      FROM orders
      |      WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
      |      GROUP BY 1),
      |d AS (SELECT abs(post - pre) AS ad,
      |        CASE WHEN post - pre > 0 THEN 1 ELSE 0 END AS pos
      |      FROM per WHERE h94 = 1 AND h95 = 1 AND post - pre <> 0),
      |byv AS (SELECT ad, CAST(count(*) AS BIGINT) AS m,
      |        CAST(sum(pos) AS BIGINT) AS mp FROM d GROUP BY 1),
      |rk AS (SELECT m, mp,
      |        CAST(sum(m) OVER (ORDER BY ad ROWS BETWEEN UNBOUNDED
      |          PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |      FROM byv),
      |tm AS (SELECT m, mp, mp * (2 * cum - m + 1) AS w2,
      |        m * m * m - m AS tc FROM rk),
      |ag AS (SELECT CAST(sum(m) AS BIGINT) AS n,
      |        CAST(sum(w2) AS BIGINT) AS w2,
      |        CAST(sum(tc) AS BIGINT) AS tc FROM tm)
      |SELECT n AS n_pairs,
      |  CAST(CASE WHEN w2 < 0
      |    THEN -((2 * CAST(-w2 AS HUGEINT) * 10000 + 2) // 4)
      |    ELSE (2 * CAST(w2 AS HUGEINT) * 10000 + 2) // 4 END AS DOUBLE)
      |    / 10000.0 AS w_plus,
      |  round((CAST(w2 AS DOUBLE) / 2.0 -
      |      CAST(n AS DOUBLE) * (n + 1) / 4.0) /
      |    nullif(sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24.0 -
      |      CAST(tc AS DOUBLE) / 48.0), 0.0), 4) AS z
      |FROM ag""".stripMargin))

  /** [[Similarity.silhouetteByLabel]]: do the embedding labels separate
    * in vector space — centroid-based mean silhouette per label. */
  private val q313 = QDef("q313_silhouette",
    (s, dir) => Similarity.silhouetteByLabel(T(s, dir, "embeddings"),
      col("vec_id"), col("embedding"), col("label")),
    Some("""WITH e AS (SELECT vec_id AS pid, label AS lb,
      |        list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)
      |          * 1000000.0, 0) AS BIGINT)) AS xq
      |      FROM embeddings
      |      WHERE vec_id IS NOT NULL AND label IS NOT NULL
      |        AND embedding IS NOT NULL),
      |ex AS (SELECT lb, u.s['i'] AS i, u.s['x'] AS x
      |      FROM (SELECT lb, unnest(list_transform(
      |              range(1, len(xq) + 1), k -> {'i': k, 'x': xq[k]}))
      |              AS s
      |            FROM e) u),
      |cd AS (SELECT lb, i,
      |        CASE WHEN sx < 0 THEN -((2 * (-sx) + n) // (2 * n))
      |          ELSE (2 * sx + n) // (2 * n) END AS c
      |      FROM (SELECT lb, i, CAST(sum(x) AS BIGINT) AS sx,
      |              CAST(count(*) AS BIGINT) AS n
      |            FROM ex GROUP BY 1, 2)),
      |cv AS (SELECT lb AS cl, list(c ORDER BY i) AS cv FROM cd
      |       GROUP BY 1),
      |di AS (SELECT p.pid, p.lb, c.cl,
      |        sqrt(CAST(list_sum(list_transform(range(1, len(p.xq) + 1),
      |          k -> (p.xq[k] - c.cv[k]) * (p.xq[k] - c.cv[k])))
      |          AS DOUBLE)) AS dist
      |      FROM e p CROSS JOIN cv c),
      |ab AS (SELECT pid, lb,
      |        max(CASE WHEN lb = cl THEN dist END) AS a,
      |        min(CASE WHEN lb <> cl THEN dist END) AS b
      |      FROM di GROUP BY 1, 2),
      |s6 AS (SELECT lb, CAST(round((b - a) /
      |        nullif(greatest(a, b), 0.0) * 1000000.0, 0) AS BIGINT)
      |        AS s6 FROM ab),
      |ag AS (SELECT lb, CAST(count(*) AS BIGINT) AS n_points,
      |        CAST(sum(s6) AS BIGINT) AS ss6 FROM s6 GROUP BY 1)
      |SELECT lb AS label, n_points,
      |  CAST(CASE WHEN ss6 < 0
      |    THEN -((2 * CAST(-ss6 AS HUGEINT) * 10000 +
      |      n_points * 1000000) // (2 * n_points * 1000000))
      |    ELSE (2 * CAST(ss6 AS HUGEINT) * 10000 + n_points * 1000000)
      |      // (2 * n_points * 1000000) END AS DOUBLE) / 10000.0
      |    AS mean_silhouette
      |FROM ag ORDER BY label""".stripMargin))

  /** [[Sampling.neymanAllocation]]: variance-minimizing allocation of a
    * 1000-unit sample across nations for estimating mean balance. */
  private val q314 = QDef("q314_neyman_allocation",
    (s, dir) => Sampling.neymanAllocation(
      T(s, dir, "customer")
        .where(col("c_nationkey").isNotNull && col("c_acctbal").isNotNull),
      col("c_nationkey"),
      expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)"), totalN = 1000L),
    Some("""WITH d AS (SELECT c_nationkey AS h,
      |        CAST(round(c_acctbal * 100, 0) AS BIGINT) AS x
      |      FROM customer
      |      WHERE c_nationkey IS NOT NULL AND c_acctbal IS NOT NULL),
      |a AS (SELECT h, CAST(count(*) AS BIGINT) AS nh,
      |        CAST(sum(x) AS BIGINT) AS sx,
      |        CAST(sum(x * x) AS BIGINT) AS sxx FROM d GROUP BY 1),
      |m AS (SELECT h, nh,
      |        sqrt((CAST(nh AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) /
      |          (CAST(nh AS DOUBLE) *
      |            nullif(CAST(nh - 1 AS DOUBLE), 0.0))) AS sh
      |      FROM a),
      |w AS (SELECT h, nh, sh, CAST(nh AS DOUBLE) * sh AS nhsh FROM m),
      |t AS (SELECT sum(nhsh) AS tt FROM w)
      |SELECT h AS stratum, nh AS n_pop, round(sh, 4) AS s_h,
      |  round(nhsh / nullif(tt, 0.0), 4) AS share,
      |  CAST(round(nhsh / nullif(tt, 0.0) * 1000.0, 0) AS BIGINT)
      |    AS n_alloc
      |FROM w CROSS JOIN t ORDER BY stratum""".stripMargin))

  /** [[Inference.kruskalWallis]]: rank-based one-way ANOVA of order
    * quantity across return flags — tie-corrected H sealed as an
    * integer rational. */
  private val q315 = QDef("q315_kruskal_wallis",
    (s, dir) => Inference.kruskalWallis(T(s, dir, "lineitem"),
      col("l_returnflag"), col("l_quantity")),
    Some("""WITH d AS (SELECT l_returnflag AS g,
      |        CAST(l_quantity AS BIGINT) AS x
      |      FROM lineitem
      |      WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL),
      |byv AS (SELECT x, CAST(count(*) AS BIGINT) AS m FROM d GROUP BY 1),
      |sp AS (SELECT x, m,
      |        CAST(sum(m) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED
      |          PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |        m * m * m - m AS tc
      |      FROM byv),
      |pg AS (SELECT g, CAST(count(*) AS BIGINT) AS ng,
      |        CAST(sum(2 * cum - m + 1) AS BIGINT) AS r2
      |      FROM d JOIN sp USING (x) GROUP BY 1),
      |nn AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
      |        CAST(count(*) AS BIGINT) AS k FROM pg),
      |ti AS (SELECT CAST(coalesce(sum(tc), 0) AS BIGINT) AS t FROM sp),
      |tm AS (SELECT n, k,
      |        CAST(round(CAST(r2 AS DOUBLE) * r2 /
      |          (4.0 * ng * n * (n + 1)) * 1000000.0, 0) AS BIGINT) AS u6
      |      FROM pg CROSS JOIN nn),
      |ag AS (SELECT n, k, CAST(sum(u6) AS BIGINT) AS su6 FROM tm
      |       GROUP BY 1, 2),
      |fx AS (SELECT n, k,
      |        12 * su6 - 3 * (n + 1) * 1000000 AS h6,
      |        (12 * CAST(su6 AS HUGEINT) - 3 * (n + 1) * 1000000) *
      |          (CAST(n AS HUGEINT) * n * n - n) AS cnum,
      |        nullif(CAST(1000000 AS HUGEINT) *
      |          (CAST(n AS HUGEINT) * n * n - n - t), 0) AS cden
      |      FROM ag CROSS JOIN ti)
      |SELECT n AS n_rows, k AS k_groups,
      |  CAST(CASE WHEN h6 < 0
      |    THEN -((2 * CAST(-h6 AS HUGEINT) + 100) // 200)
      |    ELSE (2 * CAST(h6 AS HUGEINT) + 100) // 200 END AS DOUBLE)
      |    / 10000.0 AS h,
      |  CAST(CASE WHEN cnum < 0
      |    THEN -((2 * (-cnum) * 10000 + cden) // (2 * cden))
      |    ELSE (2 * cnum * 10000 + cden) // (2 * cden) END AS DOUBLE)
      |    / 10000.0 AS h_tie_corrected
      |FROM fx""".stripMargin))

  /** [[Inference.moodsMedian]]: above/below-global-median split of
    * event values per type — the robust k-group location test. */
  private val q316 = QDef("q316_moods_median",
    (s, dir) => Inference.moodsMedian(
      T(s, dir, "events")
        .where(col("event_type").isNotNull && col("value").isNotNull),
      col("event_type"),
      expr("CAST(round(value * 100, 0) AS BIGINT)")),
    Some("""WITH d AS (SELECT event_type AS g,
      |        CAST(round(value * 100, 0) AS BIGINT) AS x
      |      FROM events
      |      WHERE event_type IS NOT NULL AND value IS NOT NULL),
      |md AS (SELECT quantile_cont(x, 0.5) AS m FROM d),
      |ce AS (SELECT g,
      |        CAST(sum(CASE WHEN CAST(x AS DOUBLE) > m THEN 1 ELSE 0 END)
      |          AS BIGINT) AS ab,
      |        CAST(sum(CASE WHEN CAST(x AS DOUBLE) > m THEN 0 ELSE 1 END)
      |          AS BIGINT) AS be
      |      FROM d CROSS JOIN md GROUP BY 1),
      |tt AS (SELECT CAST(sum(ab) AS BIGINT) AS ta,
      |        CAST(sum(be) AS BIGINT) AS tb,
      |        CAST(count(*) AS BIGINT) AS k FROM ce),
      |tm AS (SELECT k, ta + tb AS n,
      |        CAST(round((CAST(ab AS DOUBLE) -
      |            CAST(ab + be AS DOUBLE) * ta / (ta + tb)) *
      |          (CAST(ab AS DOUBLE) -
      |            CAST(ab + be AS DOUBLE) * ta / (ta + tb)) /
      |          (CAST(ab + be AS DOUBLE) * ta / (ta + tb)) * 1000000.0,
      |          0) AS BIGINT) +
      |        CAST(round((CAST(be AS DOUBLE) -
      |            CAST(ab + be AS DOUBLE) * tb / (ta + tb)) *
      |          (CAST(be AS DOUBLE) -
      |            CAST(ab + be AS DOUBLE) * tb / (ta + tb)) /
      |          (CAST(ab + be AS DOUBLE) * tb / (ta + tb)) * 1000000.0,
      |          0) AS BIGINT) AS t6
      |      FROM ce CROSS JOIN tt),
      |ag AS (SELECT k, n, CAST(sum(t6) AS BIGINT) AS s6 FROM tm
      |       GROUP BY 1, 2)
      |SELECT n AS n_rows, k AS k_groups,
      |  CAST(CASE WHEN s6 < 0
      |    THEN -((2 * CAST(-s6 AS HUGEINT) + 100) // 200)
      |    ELSE (2 * CAST(s6 AS HUGEINT) + 100) // 200 END AS DOUBLE)
      |    / 10000.0 AS chi2
      |FROM ag""".stripMargin))

  /** [[Inference.cliffsDelta]]: how often does a returned line's
    * quantity exceed a normal one's — the rank-biserial effect size
    * behind the R-vs-N comparison. */
  private val q317 = QDef("q317_cliffs_delta",
    (s, dir) => Inference.cliffsDelta(T(s, dir, "lineitem"),
      col("l_returnflag"), col("l_quantity"), "R", "N"),
    Some("""WITH d AS (SELECT l_returnflag AS g,
      |        CAST(l_quantity AS BIGINT) AS x
      |      FROM lineitem
      |      WHERE l_quantity IS NOT NULL AND l_returnflag IN ('R', 'N')),
      |byv AS (SELECT x, CAST(count(*) AS BIGINT) AS m,
      |        CAST(sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT)
      |          AS ma
      |      FROM d GROUP BY 1),
      |sp AS (SELECT x, m, ma,
      |        CAST(sum(m) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED
      |          PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |      FROM byv),
      |ag AS (SELECT CAST(sum(ma) AS BIGINT) AS na,
      |        CAST(sum(m - ma) AS BIGINT) AS nb,
      |        CAST(sum(ma * (2 * cum - m + 1)) AS BIGINT) AS r2
      |      FROM sp)
      |SELECT na AS n_a, nb AS n_b,
      |  CAST(CASE WHEN r2 - na * (na + 1) - na * nb < 0
      |    THEN -((2 * CAST(-(r2 - na * (na + 1) - na * nb) AS HUGEINT)
      |      * 10000 + nullif(na * nb, 0)) // (2 * nullif(na * nb, 0)))
      |    ELSE (2 * CAST(r2 - na * (na + 1) - na * nb AS HUGEINT)
      |      * 10000 + nullif(na * nb, 0)) // (2 * nullif(na * nb, 0))
      |    END AS DOUBLE) / 10000.0 AS cliffs_delta
      |FROM ag""".stripMargin))

  /** [[Inference.friedman]]: do users rank the five event types the
    * same way — repeated-measures rank test over zero-filled per-user
    * type counts (blocks complete by construction). */
  private val q318 = QDef("q318_friedman",
    (s, dir) => {
      val e = T(s, dir, "events")
        .where(col("user_id").isNotNull && col("event_type").isNotNull)
      val users = e.select(col("user_id").as("u")).distinct()
      val types = e.select(col("event_type").as("j")).distinct()
      val spine = users.crossJoin(broadcast(types))
      val counts = e.groupBy(col("user_id").as("u"),
        col("event_type").as("j")).agg(count(lit(1)).as("x"))
      val filled = spine.join(counts, Seq("u", "j"), "left")
        .select(col("u"), col("j"), coalesce(col("x"), lit(0L)).as("x"))
      Inference.friedman(filled, col("u"), col("j"), col("x"))
    },
    Some("""WITH e AS (SELECT user_id AS u, event_type AS j FROM events
      |      WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
      |us AS (SELECT DISTINCT u FROM e),
      |ty AS (SELECT DISTINCT j FROM e),
      |cn AS (SELECT u, j, CAST(count(*) AS BIGINT) AS x FROM e
      |       GROUP BY 1, 2),
      |fl AS (SELECT us.u AS u, ty.j AS j, coalesce(cn.x, 0) AS x
      |      FROM us CROSS JOIN ty
      |      LEFT JOIN cn ON cn.u = us.u AND cn.j = ty.j),
      |byuv AS (SELECT u, x, CAST(count(*) AS BIGINT) AS m FROM fl
      |       GROUP BY 1, 2),
      |sp AS (SELECT u, x, m,
      |        CAST(sum(m) OVER (PARTITION BY u ORDER BY x ROWS BETWEEN
      |          UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |        m * m * m - m AS tc
      |      FROM byuv),
      |rk AS (SELECT fl.j AS j, 2 * cum - m + 1 AS r2
      |      FROM fl JOIN sp ON fl.u = sp.u AND fl.x = sp.x),
      |cs AS (SELECT j, CAST(sum(r2) AS BIGINT) AS r2j FROM rk
      |       GROUP BY 1),
      |ti AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n,
      |        CAST(coalesce(sum(tc), 0) AS BIGINT) AS t FROM sp),
      |ag AS (SELECT CAST(count(*) AS BIGINT) AS k,
      |        CAST(sum(CAST(r2j AS HUGEINT) * r2j) AS HUGEINT) AS sr2
      |      FROM cs),
      |fx AS (SELECT n, k,
      |        (3 * sr2 - 3 * CAST(n AS HUGEINT) * n * k * (k + 1) *
      |          (k + 1)) * (CAST(n AS HUGEINT) * k * (k * k - 1))
      |          AS qnum,
      |        nullif(CAST(n AS HUGEINT) * k * (k + 1) *
      |          (CAST(n AS HUGEINT) * k * (k * k - 1) - t), 0) AS qden
      |      FROM ag CROSS JOIN ti)
      |SELECT n AS n_blocks, k AS k_treatments,
      |  CAST(CASE WHEN qnum < 0
      |    THEN -((2 * (-qnum) * 10000 + qden) // (2 * qden))
      |    ELSE (2 * qnum * 10000 + qden) // (2 * qden) END AS DOUBLE)
      |    / 10000.0 AS q_tie_corrected
      |FROM fx""".stripMargin))

  /** [[Sampling.tokenBudgetPlan]]: integer-parts mixture plan over a
    * 10M-token budget — epochs and tokens-served per source, all exact
    * rationals. */
  private val q319 = QDef("q319_token_budget_plan",
    (s, dir) => Sampling.tokenBudgetPlan(
      T(s, dir, "documents")
        .select(col("source"), size(split(col("text"), " ")).as("nt")),
      col("source"), col("nt"),
      Seq("src0" -> 3L, "src1" -> 2L, "src2" -> 2L, "src3" -> 1L),
      budget = 10000000L),
    Some("""WITH d AS (SELECT source AS src,
      |        CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
      |        CASE source WHEN 'src0' THEN 3 WHEN 'src1' THEN 2
      |          WHEN 'src2' THEN 2 WHEN 'src3' THEN 1 ELSE 0 END AS p
      |      FROM documents WHERE source IS NOT NULL AND text IS NOT NULL),
      |per AS (SELECT src, p, CAST(count(*) AS BIGINT) AS n_docs,
      |        CAST(sum(nt) AS BIGINT) AS tokens
      |      FROM d WHERE p > 0 GROUP BY 1, 2),
      |tt AS (SELECT CAST(sum(CAST(p AS HUGEINT) * tokens) AS HUGEINT)
      |        AS den FROM per)
      |SELECT src AS source, n_docs, tokens, CAST(p AS BIGINT)
      |    AS mix_parts,
      |  CAST((2 * CAST(p AS HUGEINT) * 10000000 * 10000 +
      |    nullif(den, 0)) // (2 * nullif(den, 0)) AS DOUBLE) / 10000.0
      |    AS epochs,
      |  CAST((2 * CAST(p AS HUGEINT) * tokens * 10000000 * 10000 +
      |    nullif(den, 0)) // (2 * nullif(den, 0)) AS DOUBLE) / 10000.0
      |    AS tokens_served
      |FROM per CROSS JOIN tt ORDER BY source""".stripMargin))

  /** [[Profile.fdHistogram]]: Freedman–Diaconis auto-binned histogram
    * of document lengths — integer-corrected ∛n, pure integer bin
    * arithmetic. */
  private val q320 = QDef("q320_fd_histogram",
    (s, dir) => Profile.fdHistogram(T(s, dir, "documents"),
      col("n_chars")),
    Some("""WITH d AS (SELECT CAST(n_chars AS BIGINT) AS x FROM documents
      |      WHERE n_chars IS NOT NULL),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |        CAST(min(x) AS BIGINT) AS lo, CAST(max(x) AS BIGINT) AS hi,
      |        CAST(round(quantile_cont(x * 4, 0.75), 0) AS BIGINT) -
      |          CAST(round(quantile_cont(x * 4, 0.25), 0) AS BIGINT)
      |          AS iqr4
      |      FROM d),
      |cb AS (SELECT n, lo, hi, iqr4,
      |        CAST(pow(CAST(n AS DOUBLE), 1.0 / 3.0) AS BIGINT) AS c0
      |      FROM st),
      |cc AS (SELECT n, lo, hi, iqr4,
      |        CASE WHEN (c0 + 1) * (c0 + 1) * (c0 + 1) <= n THEN c0 + 1
      |          WHEN c0 * c0 * c0 > n THEN c0 - 1 ELSE c0 END AS c
      |      FROM cb),
      |nbx AS (SELECT lo, iqr4, c,
      |        greatest(CASE WHEN iqr4 > 0
      |          THEN ((hi - lo) * 2 * c + iqr4 - 1) // iqr4
      |          ELSE 1 END, 1) AS nb
      |      FROM cc),
      |bins AS (SELECT CASE WHEN nb = 1 OR iqr4 <= 0 THEN 0
      |          ELSE least(((x - lo) * 2 * c) // iqr4, nb - 1) END AS bin,
      |        nb, x
      |      FROM d CROSS JOIN nbx)
      |SELECT CAST(bin AS BIGINT) AS bin, CAST(nb AS BIGINT) AS n_bins,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(min(x) AS BIGINT) AS bin_min, CAST(max(x) AS BIGINT)
      |    AS bin_max
      |FROM bins GROUP BY 1, 2 ORDER BY bin""".stripMargin))

  /** [[Packing.paddingWaste]]: per length band, the padding a fixed
    * 512-token slot layout wastes — the "do we need a packer" table. */
  private val q321 = QDef("q321_padding_waste",
    (s, dir) => Packing.paddingWaste(
      T(s, dir, "documents")
        .select(size(split(col("text"), " ")).as("nt")),
      col("nt"), maxLen = 512L),
    Some("""WITH d AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT)
      |          AS nt
      |      FROM documents WHERE text IS NOT NULL),
      |f AS (SELECT nt, (nt + 511) // 512 AS slots,
      |        least((nt * 10) // 512, 10) AS band
      |      FROM d WHERE nt > 0),
      |a AS (SELECT band, CAST(count(*) AS BIGINT) AS n_docs,
      |        CAST(sum(nt) AS BIGINT) AS tokens,
      |        CAST(sum(slots) AS BIGINT) AS slots
      |      FROM f GROUP BY 1)
      |SELECT band, n_docs, tokens, slots,
      |  slots * 512 - tokens AS padding,
      |  CAST((2 * CAST(tokens AS HUGEINT) * 10000 + slots * 512) //
      |    (2 * slots * 512) AS DOUBLE) / 10000.0 AS efficiency
      |FROM a ORDER BY band""".stripMargin))

  /** [[Dedup.jaccardThresholdCurve]]: one-pass near-dup pair counts at
    * 0.6/0.7/0.8/0.9 — the dedup-cutoff tuning table; thresholds
    * decided by integer comparison, never a double. */
  private val q322 = QDef("q322_jaccard_threshold_curve",
    (s, dir) => Dedup.jaccardThresholdCurve(T(s, dir, "documents"),
      col("text"), col("doc_id"), col("source")),
    Some("""WITH tok AS (SELECT DISTINCT doc_id AS id, source AS blk,
      |        unnest(list_distinct(string_split(text, ' '))) AS t
      |      FROM documents
      |      WHERE doc_id IS NOT NULL AND source IS NOT NULL),
      |sz AS (SELECT id, CAST(count(*) AS BIGINT) AS sz FROM tok
      |       GROUP BY 1),
      |iv AS (SELECT a.id AS id_a, b.id AS id_b,
      |        CAST(count(*) AS BIGINT) AS inter
      |      FROM tok a JOIN tok b ON a.blk = b.blk AND a.t = b.t
      |        AND a.id < b.id
      |      GROUP BY 1, 2),
      |pr AS (SELECT inter, sa.sz + sb.sz - inter AS uni
      |      FROM iv JOIN sz sa ON sa.id = iv.id_a
      |      JOIN sz sb ON sb.id = iv.id_b),
      |sp AS (SELECT CAST(unnest([6, 7, 8, 9]) AS BIGINT) AS t10),
      |ct AS (SELECT t10, CAST(count(*) AS BIGINT) AS n_pairs
      |      FROM pr CROSS JOIN sp WHERE inter * 10 >= t10 * uni
      |      GROUP BY 1)
      |SELECT CAST(sp.t10 AS DOUBLE) / 10.0 AS threshold,
      |  coalesce(ct.n_pairs, CAST(0 AS BIGINT)) AS n_pairs
      |FROM sp LEFT JOIN ct ON sp.t10 = ct.t10
      |ORDER BY threshold""".stripMargin))

  /** [[Dedup.bagFingerprintDups]]: word-order-invariant duplicate
    * clusters — the template-refill detector md5(text) misses. */
  private val q323 = QDef("q323_bag_fingerprint_dups",
    (s, dir) => Dedup.bagFingerprintDups(T(s, dir, "documents"),
      col("doc_id"), col("text")),
    Some("""WITH f AS (SELECT doc_id,
      |        list_sort(string_split(text, ' ')) AS fp,
      |        CAST(length(text) AS BIGINT) AS nc
      |      FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
      |cl AS (SELECT fp, CAST(count(*) AS BIGINT) AS sz,
      |        CAST(sum(nc) AS BIGINT) AS chars,
      |        CAST(min(nc) AS BIGINT) AS keep_chars
      |      FROM f GROUP BY 1)
      |SELECT sz, CAST(count(*) AS BIGINT) AS n_clusters,
      |  CAST(sum(sz - 1) AS BIGINT) AS n_excess_docs,
      |  CAST(sum(chars - keep_chars) AS BIGINT) AS chars_saved
      |FROM cl GROUP BY 1 ORDER BY sz""".stripMargin))

  /** [[Dedup.prefixBoilerplate]]: documents sharing their first 8
    * tokens — the crawled-banner/header template census. */
  private val q324 = QDef("q324_prefix_boilerplate",
    (s, dir) => Dedup.prefixBoilerplate(T(s, dir, "documents"),
      col("doc_id"), col("text"), k = 8, minDocs = 2),
    Some("""WITH p AS (SELECT doc_id,
      |        array_to_string(string_split(text, ' ')[1:8], ' ')
      |          AS prefix
      |      FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL)
      |SELECT prefix, CAST(count(*) AS BIGINT) AS n_docs
      |FROM p GROUP BY 1 HAVING count(*) >= 2
      |ORDER BY n_docs DESC, prefix""".stripMargin))

  /** [[Trend.sequentialMonitor]]: daily-look cumulative two-proportion
    * z against the Pocock-style constant boundary over the parity-arm
    * purchase conversion. */
  private val q325 = QDef("q325_sequential_monitor",
    (s, dir) => {
      val per = T(s, dir, "events")
        .where(col("user_id").isNotNull && col("ts").isNotNull)
        .groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("d0"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
        .select(col("d0"),
          when(col("user_id") % 2 === 0, "A").otherwise("B").as("v"),
          col("conv"))
      Trend.sequentialMonitor(per, col("d0"), col("v"), col("conv"),
        "A", "B")
    },
    Some("""WITH per AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0,
      |        max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |          AS conv
      |      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |      GROUP BY 1),
      |v AS (SELECT d0 AS d,
      |        CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS v,
      |        CAST(conv AS BIGINT) AS c FROM per),
      |byd AS (SELECT d,
      |        CAST(sum(CASE WHEN v = 'A' THEN 1 ELSE 0 END) AS BIGINT)
      |          AS na,
      |        CAST(sum(CASE WHEN v = 'B' THEN 1 ELSE 0 END) AS BIGINT)
      |          AS nb,
      |        CAST(sum(CASE WHEN v = 'A' THEN c ELSE 0 END) AS BIGINT)
      |          AS ca,
      |        CAST(sum(CASE WHEN v = 'B' THEN c ELSE 0 END) AS BIGINT)
      |          AS cb
      |      FROM v GROUP BY 1),
      |cum AS (SELECT d,
      |        CAST(sum(na) OVER w AS BIGINT) AS cna,
      |        CAST(sum(nb) OVER w AS BIGINT) AS cnb,
      |        CAST(sum(ca) OVER w AS BIGINT) AS cca,
      |        CAST(sum(cb) OVER w AS BIGINT) AS ccb
      |      FROM byd WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED
      |        PRECEDING AND CURRENT ROW)),
      |zz AS (SELECT d, cna, cnb, cca, ccb,
      |        (CAST(cca AS DOUBLE) / cna - CAST(ccb AS DOUBLE) / cnb) /
      |        nullif(sqrt((CAST(cca + ccb AS DOUBLE) / (cna + cnb)) *
      |          (1.0 - CAST(cca + ccb AS DOUBLE) / (cna + cnb)) *
      |          (1.0 / cna + 1.0 / cnb)), 0.0) AS z
      |      FROM cum WHERE cna > 0 AND cnb > 0)
      |SELECT d AS look_day, cna AS n_a, cnb AS n_b,
      |  CAST((2 * CAST(cca AS HUGEINT) * 10000 + cna) // (2 * cna)
      |    AS DOUBLE) / 10000.0 AS rate_a,
      |  CAST((2 * CAST(ccb AS HUGEINT) * 10000 + cnb) // (2 * cnb)
      |    AS DOUBLE) / 10000.0 AS rate_b,
      |  round(z, 4) AS z,
      |  CAST(CASE WHEN abs(z) >= 2.413 THEN 1 ELSE 0 END AS BIGINT)
      |    AS crossed
      |FROM zz ORDER BY look_day""".stripMargin))

  /** [[Dedup.ngramContainmentPairsBanded]]: the q255 scale twin (the
    * q60/q61/q305 convention) — rare-first prefix-filter candidates with
    * the min-side size condition instead of the every-same-block-pair
    * join, exact distinct-gram verify, SAME oracle: the driver's gate
    * pins bit-identical output. */
  private val q326 = QDef("q326_ngram_containment_banded",
    (s, dir) => Dedup.ngramContainmentPairsBanded(T(s, dir, "documents"),
        col("text"), col("doc_id"), col("source"), n = 1, minC = 0.9)
      .withColumn("containment", round(col("containment"), 4))
      .orderBy("id_a", "id_b"),
    Some(InferenceQueries.containmentOracle))

  /** [[EventStreams.runCdcApply]]: the CDC SINK, oracle-gated — stream
    * the events fixture through the foreachBatch crash-safe parquet
    * merge (fresh state dir per invocation, the q20 side-effect
    * convention) and gate the POST-APPLY STATE against DuckDB's
    * latest-wins CTE: version-wins per user key, (ts, event_id)
    * tie-break, exactly the q93 batch semantics — so the streamed
    * multi-batch merge provably converges to the batch answer.
    * Resume/crash-recovery semantics stay unit-pinned
    * (SketchGraphSpec). */
  private val q327 = QDef("q327_cdc_apply_state",
    (s, dir) => {
      val statePath = java.nio.file.Files
        .createTempDirectory("graft_cdc_q327").toString + "/state"
      EventStreams.runCdcApply(s, dir, statePath,
          name = "graft_stream_cdc_q327")
        .select(col("k").as("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("value"))
        .orderBy("user_id")
    },
    Some("""WITH x AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |        value, row_number() OVER (PARTITION BY user_id
      |          ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      |      FROM events)
      |SELECT user_id, ts_us, event_id, value FROM x WHERE rn = 1
      |ORDER BY user_id""".stripMargin))

  /** [[Multimodal.sampleFrames]] oracle gate: the video-shaped payload
    * (binary media column = UTF-8 text bytes, the q34 fixture
    * convention) modeled as fixed 64-byte frames, keep every 3rd —
    * the frame-sampling plumbing a video curation pipeline runs before
    * per-frame featurization. The DuckDB mirror slices the VARCHAR
    * directly: the documents fixture is pure ASCII by construction
    * (verified 0 non-ASCII rows at every SF), so byte offsets equal
    * char offsets and md5(substr(text,…)) hashes exactly the frame
    * bytes. One generator (flatMap) pass, no shuffle — at scale the
    * fan-out multiplies rows, not bytes read. */
  private val q328 = QDef("q328_frame_sample",
    (s, dir) => Multimodal.sampleFrames(
        Multimodal.mediaRows(T(s, dir, "documents")),
        frameBytes = 64, every = 3)
      .toDF()
      .select(col("doc_id"), col("frame_idx"),
        octet_length(col("frame")).cast("long").as("n_bytes"),
        Dedup.hash60(col("frame")).as("content_hash"))
      .orderBy("doc_id", "frame_idx"),
    Some("""SELECT doc_id, CAST(i AS INT) AS frame_idx,
      | CAST(length(substr(text, CAST(i*64+1 AS BIGINT), 64)) AS BIGINT)
      |   AS n_bytes,
      | ('0x' || substr(md5(substr(text, CAST(i*64+1 AS BIGINT), 64)),
      |   1, 15))::BIGINT AS content_hash
      |FROM (SELECT doc_id, text,
      |       unnest(range(0, CAST(ceil(length(text)/64.0) AS BIGINT)))
      |         AS i
      |      FROM documents)
      |WHERE i % 3 = 0 ORDER BY doc_id, frame_idx""".stripMargin))

  /** [[Multimodal.resize]] oracle gate: the stub resize's Spark-side
    * plumbing (deterministic stride sampling to the area-ratio byte
    * count, metadata rewrite) pinned end-to-end — the DuckDB mirror
    * re-derives the per-doc (width, height) from doc_id, replays the
    * same IEEE-double outLen/stride arithmetic (`floor(x+0.5)` is
    * exactly JVM `math.round`; `CAST(floor(…))` is exactly positive
    * `toInt`), reconstructs the sampled string char-by-char (ASCII
    * fixture: chars == bytes), and hashes it. Narrow per-partition
    * transform — no shuffle at any scale. */
  private val q329 = QDef("q329_media_resize",
    (s, dir) => Multimodal.resize(
        Multimodal.mediaRows(T(s, dir, "documents")),
        targetW = 64, targetH = 64)
      .toDF()
      .select(col("doc_id"), col("width"), col("height"),
        octet_length(col("media")).cast("long").as("n_bytes"),
        Dedup.hash60(col("media")).as("content_hash"))
      .orderBy("doc_id"),
    Some("""WITH m AS (SELECT doc_id, text,
      |        CAST(doc_id % 640 + 16 AS BIGINT) AS w,
      |        CAST(doc_id % 480 + 16 AS BIGINT) AS h,
      |        CAST(length(text) AS BIGINT) AS len
      |      FROM documents),
      |o AS (SELECT doc_id, text, len,
      |       greatest(1, least(len, CAST(floor(
      |         len * (4096.0 / (w * h)) + 0.5) AS BIGINT))) AS out_len
      |      FROM m),
      |r AS (SELECT doc_id, out_len,
      |       list_aggregate(list_transform(range(0, out_len),
      |         i -> substr(text, least(len - 1, CAST(floor(
      |           i * greatest(1.0, CAST(len AS DOUBLE) / out_len))
      |           AS BIGINT)) + 1, 1)), 'string_agg', '') AS rz
      |      FROM o)
      |SELECT doc_id, CAST(64 AS INTEGER) AS width,
      |  CAST(64 AS INTEGER) AS height,
      |  CAST(out_len AS BIGINT) AS n_bytes,
      |  ('0x' || substr(md5(rz), 1, 15))::BIGINT AS content_hash
      |FROM r ORDER BY doc_id""".stripMargin))

  /** Frame-level duplicate census: [[q328]]'s sampled frames hashed and
    * grouped — the cross-video frame dedup a curation pipeline runs to
    * find reused intros/templates (near-exact at the frame granularity;
    * the document-level twins are q21/q324). One hash aggregation over
    * the generator output; candidates ∝ distinct frames. */
  private val q330 = QDef("q330_frame_dedup_census",
    (s, dir) => Multimodal.sampleFrames(
        Multimodal.mediaRows(T(s, dir, "documents")),
        frameBytes = 64, every = 3)
      .toDF()
      .select(Dedup.hash60(col("frame")).as("frame_hash"))
      .groupBy("frame_hash").agg(count(lit(1)).as("n_copies"))
      .where(col("n_copies") > 1)
      .orderBy(desc("n_copies"), col("frame_hash")),
    Some("""WITH f AS (SELECT ('0x' || substr(md5(substr(text,
      |        CAST(i*64+1 AS BIGINT), 64)), 1, 15))::BIGINT AS frame_hash
      |      FROM (SELECT text, unnest(range(0,
      |             CAST(ceil(length(text)/64.0) AS BIGINT))) AS i
      |            FROM documents)
      |      WHERE i % 3 = 0)
      |SELECT frame_hash, CAST(count(*) AS BIGINT) AS n_copies
      |FROM f GROUP BY 1 HAVING count(*) > 1
      |ORDER BY n_copies DESC, frame_hash""".stripMargin))

  /** [[Curate.tfidfCosinePairsBanded]]: the banded scale twin of q266
    * (the q60/q61/q305/q326 convention — SAME oracle, the driver's gate
    * pins bit-identical output). The sf1 scale probe measured q266's
    * naive (block, term) self-join at 102× wall under the 10× dup-rich
    * clone corpus — the last pair-similarity family member without a
    * prefix-filtered path; this is it (L2 Bayardo prefix, exact
    * integer-dot verify — see the operator's Scaladoc for the
    * losslessness argument). */
  private val q331 = QDef("q331_tfidf_cosine_banded",
    (s, dir) => Curate.tfidfCosinePairsBanded(T(s, dir, "documents"),
        col("doc_id"), col("text"), col("source"), minCos = 0.6)
      .withColumn("cos", round(col("cos"), 4))
      .orderBy("id_a", "id_b"),
    Some(InferenceQueries.cosineOracle))

  // ---------------------------------------------------- exact-substring dedup

  /** DuckDB twin of Dedup.hash28/hash60 (the ExtQueries convention). */
  private def hashSql(e: String, hexLen: Int) =
    s"('0x' || substr(md5($e), 1, $hexLen))::BIGINT"

  /** Shared CTE chain for q332/q333: token positions, 5-token window
    * occurrences, and the corpus-repeated window set. Window STRINGS on
    * the oracle side vs xxhash64 fingerprints on the Spark side — the
    * q174 injectivity convention. */
  private val spanCtes =
    """d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |base AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_toks FROM d),
      |occ AS (SELECT doc_id, u.s['p'] AS p, u.s['g'] AS g
      |        FROM (SELECT doc_id, unnest(CASE WHEN len(tk) >= 5 THEN
      |                list_transform(range(1, len(tk) - 3), i ->
      |                  {'p': i,
      |                   'g': array_to_string(list_slice(tk, i, i + 4), ' ')})
      |              ELSE [] END) AS s FROM d) u),
      |rep AS (SELECT g FROM occ GROUP BY g HAVING count(*) >= 2)""".stripMargin

  /** [[Dedup.repeatedSpans]]: ExactSubstr-style census of maximal
    * corpus-repeated 5-token spans, per document, zero rows explicit. */
  private val q332 = QDef("q332_repeated_spans",
    (s, dir) => Dedup.repeatedSpans(T(s, dir, "documents"), col("text"),
      col("doc_id"), w = 5).orderBy("doc_id"),
    Some(s"""WITH $spanCtes,
      |hit AS (SELECT occ.doc_id, occ.p FROM occ JOIN rep USING (g)),
      |m AS (SELECT doc_id, p, p + 5 AS pe,
      |        max(p + 5) OVER (PARTITION BY doc_id ORDER BY p
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mp
      |      FROM hit),
      |g2 AS (SELECT doc_id, p, pe,
      |        CASE WHEN mp IS NULL OR p > mp THEN 1 ELSE 0 END AS nw
      |      FROM m),
      |g3 AS (SELECT doc_id, p, pe,
      |        sum(nw) OVER (PARTITION BY doc_id ORDER BY p) AS grp
      |      FROM g2),
      |sp AS (SELECT doc_id, grp, min(p) AS s, max(pe) AS e
      |       FROM g3 GROUP BY 1, 2),
      |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
      |        CAST(sum(e - s) AS BIGINT) AS rt FROM sp GROUP BY 1),
      |fin AS (SELECT b.doc_id, b.n_toks,
      |        coalesce(a.n_spans, CAST(0 AS BIGINT)) AS n_spans,
      |        coalesce(a.rt, CAST(0 AS BIGINT)) AS rep_tokens
      |      FROM base b LEFT JOIN agg a USING (doc_id))
      |SELECT doc_id, n_toks, n_spans, rep_tokens,
      |  ${Seal.sqlRatio4("rep_tokens", "n_toks")} AS rep_frac
      |FROM fin ORDER BY doc_id""".stripMargin))

  /** [[Dedup.scrubRepeatedSpans]]: the removal half — keep-first scrub
    * of corpus-repeated 5-token windows, per-doc token accounting plus
    * the 60-bit hash of the reassembled text. */
  private val q333 = QDef("q333_span_scrub",
    (s, dir) => Dedup.scrubRepeatedSpans(T(s, dir, "documents"),
      col("text"), col("doc_id"), w = 5).orderBy("doc_id"),
    Some(s"""WITH $spanCtes,
      |hit AS (SELECT occ.doc_id, occ.p, occ.g FROM occ JOIN rep USING (g)),
      |rnk AS (SELECT doc_id, p, row_number() OVER
      |          (PARTITION BY g ORDER BY doc_id, p) AS rn FROM hit),
      |rmw AS (SELECT doc_id, p FROM rnk WHERE rn > 1),
      |m AS (SELECT doc_id, p, p + 5 AS pe,
      |        max(p + 5) OVER (PARTITION BY doc_id ORDER BY p
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mp
      |      FROM rmw),
      |g2 AS (SELECT doc_id, p, pe,
      |        CASE WHEN mp IS NULL OR p > mp THEN 1 ELSE 0 END AS nw
      |      FROM m),
      |g3 AS (SELECT doc_id, p, pe,
      |        sum(nw) OVER (PARTITION BY doc_id ORDER BY p) AS grp
      |      FROM g2),
      |sp AS (SELECT doc_id, grp, min(p) AS s, max(pe) AS e
      |       FROM g3 GROUP BY 1, 2),
      |rmp AS (SELECT doc_id, unnest(range(s, e)) AS i FROM sp),
      |tp AS (SELECT doc_id, u.s['i'] AS i, u.s['t'] AS t
      |       FROM (SELECT doc_id, unnest(list_transform(
      |               range(1, len(tk) + 1), k -> {'i': k, 't': tk[k]}))
      |               AS s FROM d) u),
      |kept AS (SELECT tp.doc_id, tp.i, tp.t
      |       FROM tp LEFT JOIN rmp
      |         ON tp.doc_id = rmp.doc_id AND tp.i = rmp.i
      |       WHERE rmp.i IS NULL),
      |cl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
      |        string_agg(t, ' ' ORDER BY i) AS clean
      |       FROM kept GROUP BY 1),
      |fin AS (SELECT b.doc_id, b.n_toks,
      |        coalesce(c.n_kept, CAST(0 AS BIGINT)) AS n_kept,
      |        b.n_toks - coalesce(c.n_kept, CAST(0 AS BIGINT))
      |          AS n_removed,
      |        coalesce(c.clean, '') AS clean
      |      FROM base b LEFT JOIN cl c USING (doc_id))
      |SELECT doc_id, n_toks, n_kept, n_removed,
      |  ${hashSql("clean", 15)} AS clean_hash
      |FROM fin ORDER BY doc_id""".stripMargin))

  // --------------------------------------------------------- LSH calibration

  private val sigSql16 = Dedup.minhashParams(16)
    .map { case (a, b) =>
      s"list_min(list_transform(hh, x -> (x*$a + $b) % ${Dedup.MinhashPrime}))" }
    .mkString("[", ", ", "]")

  /** 16-perm MinHash signature CTEs (the ExtQueries q25 chain) plus the
    * within-block exact-Jaccard side binned in integer space. */
  private val lshCtes =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT doc_id, list_distinct(t) AS shingles
      |       FROM toks WHERE len(t) >= 1),
      |hs AS (SELECT doc_id, list_transform(shingles, s -> ${hashSql("s", 7)}) AS hh
      |       FROM sh WHERE len(shingles) > 0),
      |sig AS (SELECT doc_id, $sigSql16 AS sig FROM hs),
      |gr AS (SELECT doc_id, source,
      |        list_distinct(list_transform(list_distinct(string_split(text, ' ')),
      |          s -> ${hashSql("s", 15)})) AS g FROM documents),
      |ex AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |        CAST(len(list_intersect(a.g, b.g)) AS BIGINT) AS i,
      |        CAST(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))
      |          AS BIGINT) AS u
      |       FROM gr a JOIN gr b
      |       ON a.source = b.source AND a.doc_id < b.doc_id)""".stripMargin

  private def bandPlanCtes(b: Int, numPerm: Int): String = {
    val r = numPerm / b
    s"""bd$b AS (SELECT doc_id, bb, list_slice(sig, $r*bb + 1, $r*bb + $r)
      |         AS bucket FROM sig, range(0, $b) AS t$b(bb)),
      |cd$b AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |         FROM bd$b a JOIN bd$b b
      |         ON a.bb = b.bb AND a.bucket = b.bucket
      |           AND a.doc_id < b.doc_id),
      |cap$b AS (SELECT CAST($b AS INTEGER) AS n_bands,
      |          CAST($r AS INTEGER) AS rows_per_band, e.bin10,
      |          CAST(count(*) AS BIGINT) AS n_pairs,
      |          CAST(sum(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_caught
      |         FROM exq e LEFT JOIN cd$b c
      |         ON e.id_a = c.id_a AND e.id_b = c.id_b
      |         GROUP BY 3)""".stripMargin
  }

  /** [[Dedup.bandPlanCapture]]: measured S-curve of three MinHash band
    * plans over the 16-perm UNIGRAM signature — per (plan × Jaccard
    * bin), the fraction of true within-block near-dup pairs each
    * banding catches. Truth and signature share the unigram similarity
    * space on purpose: calibrating shingle-space candidates against
    * unigram-space truth reads as a broken plan (probed: capture ≈ 0
    * everywhere). The "measure, don't guess" readout behind q25's
    * banding choice. */
  private val q334 = QDef("q334_lsh_band_plan",
    (s, dir) => Dedup.bandPlanCapture(T(s, dir, "documents"), col("text"),
      col("doc_id"), col("source"), shingleSize = 1, numPerm = 16,
      plans = Seq(2, 4, 8), minBin10 = 5)
      .orderBy("n_bands", "bin10"),
    Some(s"""WITH $lshCtes,
      |exq AS (SELECT id_a, id_b, (i * 10) // u AS bin10 FROM ex
      |        WHERE (i * 10) // u >= 5),
      |${Seq(2, 4, 8).map(bandPlanCtes(_, 16)).mkString(",\n")},
      |caps AS (SELECT * FROM cap2 UNION ALL SELECT * FROM cap4
      |         UNION ALL SELECT * FROM cap8),
      |spine AS (SELECT CAST(p.b AS INTEGER) AS n_bands,
      |          CAST(p.r AS INTEGER) AS rows_per_band, t.bin10
      |         FROM (VALUES (2, 8), (4, 4), (8, 2)) AS p(b, r),
      |           range(5, 11) AS t(bin10)),
      |fin AS (SELECT s.n_bands, s.rows_per_band, s.bin10,
      |        coalesce(c.n_pairs, CAST(0 AS BIGINT)) AS n_pairs,
      |        coalesce(c.n_caught, CAST(0 AS BIGINT)) AS n_caught
      |       FROM spine s LEFT JOIN caps c
      |       USING (n_bands, rows_per_band, bin10))
      |SELECT n_bands, rows_per_band, bin10, n_pairs, n_caught,
      |  CASE WHEN n_pairs > 0
      |    THEN ${Seal.sqlRatio4("n_caught", "n_pairs")} END AS capture
      |FROM fin ORDER BY n_bands, bin10""".stripMargin))

  /** [[Dedup.lshPlanEval]]: one-row recall / precision / F1 of the
    * shipped (4-band × 4-row) LSH plan against exact within-block
    * Jaccard ≥ 0.6 truth — integer-space thresholds and counts
    * throughout. */
  private val q335 = QDef("q335_lsh_plan_eval",
    (s, dir) => Dedup.lshPlanEval(T(s, dir, "documents"), col("text"),
      col("doc_id"), col("source"), shingleSize = 1, numPerm = 16,
      bands = 4, minBin10 = 6).orderBy("n_true"),
    Some(s"""WITH $lshCtes,
      |bands AS (SELECT doc_id, b, list_slice(sig, 4*b + 1, 4*b + 4)
      |          AS bucket FROM sig, range(0, 4) AS rb(b)),
      |rawpairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |             FROM bands a JOIN bands b
      |             ON a.b = b.b AND a.bucket = b.bucket
      |               AND a.doc_id < b.doc_id),
      |tr AS (SELECT id_a, id_b, 1 AS tt FROM ex WHERE i * 10 >= 6 * u),
      |ds AS (SELECT doc_id, source FROM documents),
      |cd AS (SELECT DISTINCT r.id_a, r.id_b, 1 AS cc
      |       FROM rawpairs r JOIN ds a ON r.id_a = a.doc_id
      |         JOIN ds b ON r.id_b = b.doc_id
      |       WHERE a.source = b.source),
      |j AS (SELECT coalesce(tr.tt, 0) AS tt, coalesce(cd.cc, 0) AS cc
      |      FROM tr FULL JOIN cd USING (id_a, id_b)),
      |ag AS (SELECT CAST(sum(tt) AS BIGINT) AS n_true,
      |        CAST(sum(cc) AS BIGINT) AS n_cand,
      |        CAST(sum(tt * cc) AS BIGINT) AS n_hit FROM j),
      |fin AS (SELECT n_true, n_cand, n_hit, n_true + n_cand AS tc,
      |        n_hit * 2 AS h2 FROM ag)
      |SELECT n_true, n_cand, n_hit,
      |  CASE WHEN n_true > 0
      |    THEN ${Seal.sqlRatio4("n_hit", "n_true")} END AS recall,
      |  CASE WHEN n_cand > 0
      |    THEN ${Seal.sqlRatio4("n_hit", "n_cand")} END AS precision,
      |  CASE WHEN tc > 0 THEN ${Seal.sqlRatio4("h2", "tc")} END AS f1
      |FROM fin ORDER BY n_true""".stripMargin))

  def all: Seq[QDef] = Seq(q307, q308, q309, q310, q311, q312, q313, q314,
    q315, q316, q317, q318, q319, q320, q321, q322, q323, q324, q325,
    q326, q327, q328, q329, q330, q331, q332, q333, q334, q335)
}
