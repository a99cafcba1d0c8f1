package graft

import org.apache.spark.sql.functions._
import Queries.QDef

/** Round-9 inference batch (q236+): multi-group classical tests over
  * the star-schema metrics — one-way ANOVA and its Brown-Forsythe
  * robust variant, Cramér's V association strength, and Cronbach's
  * alpha reliability. Same oracle conventions as [[Queries]]
  * (FIXTURES.md): integer quantization before every cross-row sum,
  * fixed-point s²/n terms ([[Inference]]), one sealed round(,4)
  * division per statistic, total ORDER BY (single-row reports are
  * order-free).
  */
object InferenceQueries {
  private def T(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.t(s, dir, n)

  /** [[Inference.anovaF]]: do the five order priorities differ in mean
    * order value? Kilodollar quantization keeps n·Σv² long-safe at any
    * fixture SF (and documents the coarseness/scale trade the operator
    * contract demands). */
  private val q236 = QDef("q236_anova_f",
    (s, dir) => Inference.anovaF(T(s, dir, "orders"),
      col("o_orderpriority"),
      expr("CAST(round(o_totalprice / 1000.0, 0) AS BIGINT)")),
    Some("""WITH d AS (SELECT o_orderpriority AS g,
      |        CAST(round(o_totalprice / 1000.0, 0) AS BIGINT) AS v
      |      FROM orders
      |      WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
      |pg AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(v) AS BIGINT) AS s,
      |        CAST(sum(v * v) AS BIGINT) AS ss FROM d GROUP BY 1),
      |t AS (SELECT n, s, ss,
      |        CAST(round(CAST(s AS DOUBLE) * s / n * 10000.0, 0) AS BIGINT)
      |          AS tg FROM pg),
      |a AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n,
      |        CAST(sum(s) AS BIGINT) AS st, CAST(sum(ss) AS BIGINT) AS sst,
      |        CAST(sum(tg) AS BIGINT) AS stg FROM t),
      |b AS (SELECT k, n, st, sst, stg,
      |        CAST(round(CAST(st AS DOUBLE) * st / n * 10000.0, 0) AS BIGINT)
      |          AS tall FROM a)
      |SELECT k AS k_groups, n AS n_rows,
      |  round(CAST(stg - tall AS DOUBLE) / 10000.0, 4) AS ss_between,
      |  round(CAST(sst * 10000 - stg AS DOUBLE) / 10000.0, 4) AS ss_within,
      |  round((CAST(stg - tall AS DOUBLE) / 10000.0 /
      |      nullif(CAST(k - 1 AS DOUBLE), 0.0)) /
      |    nullif(CAST(sst * 10000 - stg AS DOUBLE) / 10000.0 /
      |      nullif(CAST(n - k AS DOUBLE), 0.0), 0.0), 4) AS f_stat
      |FROM b""".stripMargin))

  /** [[Inference.brownForsythe]]: the same priority comparison on
    * absolute deviations from group MEDIANS — the robust twin that
    * stays valid under the unequal variances q236 assumes away.
    * Doubled deviations |2v − 2·med| keep everything integer. */
  private val q237 = QDef("q237_brown_forsythe",
    (s, dir) => Inference.brownForsythe(T(s, dir, "orders"),
      col("o_orderpriority"),
      expr("CAST(round(o_totalprice / 1000.0, 0) AS BIGINT)")),
    Some("""WITH d0 AS (SELECT o_orderpriority AS g,
      |        CAST(round(o_totalprice / 1000.0, 0) AS BIGINT) AS v
      |      FROM orders
      |      WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
      |m AS (SELECT g, CAST(round(2 * median(v), 0) AS BIGINT) AS m2
      |      FROM d0 GROUP BY 1),
      |d AS (SELECT d0.g AS g, abs(2 * v - m2) AS v
      |      FROM d0 JOIN m ON d0.g = m.g),
      |pg AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(v) AS BIGINT) AS s,
      |        CAST(sum(v * v) AS BIGINT) AS ss FROM d GROUP BY 1),
      |t AS (SELECT n, s, ss,
      |        CAST(round(CAST(s AS DOUBLE) * s / n * 10000.0, 0) AS BIGINT)
      |          AS tg FROM pg),
      |a AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n,
      |        CAST(sum(s) AS BIGINT) AS st, CAST(sum(ss) AS BIGINT) AS sst,
      |        CAST(sum(tg) AS BIGINT) AS stg FROM t),
      |b AS (SELECT k, n, st, sst, stg,
      |        CAST(round(CAST(st AS DOUBLE) * st / n * 10000.0, 0) AS BIGINT)
      |          AS tall FROM a)
      |SELECT k AS k_groups, n AS n_rows,
      |  round(CAST(stg - tall AS DOUBLE) / 10000.0, 4) AS ss_between,
      |  round(CAST(sst * 10000 - stg AS DOUBLE) / 10000.0, 4) AS ss_within,
      |  round((CAST(stg - tall AS DOUBLE) / 10000.0 /
      |      nullif(CAST(k - 1 AS DOUBLE), 0.0)) /
      |    nullif(CAST(sst * 10000 - stg AS DOUBLE) / 10000.0 /
      |      nullif(CAST(n - k AS DOUBLE), 0.0), 0.0), 4) AS f_stat
      |FROM b""".stripMargin))

  /** [[Inference.cramersV]]: strength of the priority × status
    * association — the effect-size companion to a raw chi-square
    * (q130 tests a different pair). The r·c spine LEFT-JOINs the cell
    * table so ZERO cells still contribute their full e term. */
  private val q238 = QDef("q238_cramers_v",
    (s, dir) => Inference.cramersV(T(s, dir, "orders"),
      col("o_orderpriority"), col("o_orderstatus")),
    Some("""WITH d AS (SELECT o_orderpriority AS x, o_orderstatus AS y
      |      FROM orders
      |      WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL),
      |ce AS (SELECT x, y, CAST(count(*) AS BIGINT) AS o FROM d GROUP BY 1, 2),
      |rx AS (SELECT x, CAST(sum(o) AS BIGINT) AS rx FROM ce GROUP BY 1),
      |cy AS (SELECT y, CAST(sum(o) AS BIGINT) AS cy FROM ce GROUP BY 1),
      |tt AS (SELECT CAST(sum(o) AS BIGINT) AS n,
      |        CAST(count(DISTINCT x) AS BIGINT) AS r,
      |        CAST(count(DISTINCT y) AS BIGINT) AS c FROM ce),
      |fu AS (SELECT rx.rx AS rx, cy.cy AS cy, coalesce(ce.o, 0) AS o
      |       FROM rx CROSS JOIN cy
      |       LEFT JOIN ce ON ce.x = rx.x AND ce.y = cy.y),
      |tm AS (SELECT n, r, c,
      |        CAST(round((CAST(o AS DOUBLE) -
      |            CAST(rx AS DOUBLE) * cy / n) *
      |          (CAST(o AS DOUBLE) - CAST(rx AS DOUBLE) * cy / n) /
      |          (CAST(rx AS DOUBLE) * cy / n) * 1000000.0, 0) AS BIGINT)
      |          AS t
      |       FROM fu CROSS JOIN tt),
      |ag AS (SELECT n, r, c, CAST(sum(t) AS BIGINT) AS chifix
      |       FROM tm GROUP BY 1, 2, 3)
      |SELECT n AS n_rows, r AS levels_x, c AS levels_y,
      |  round(CAST(chifix AS DOUBLE) / 1000000.0, 4) AS chi2,
      |  round(sqrt(CAST(chifix AS DOUBLE) / 1000000.0 /
      |    nullif(CAST(n * least(r - 1, c - 1) AS DOUBLE), 0.0)), 4)
      |    AS cramers_v
      |FROM ag""".stripMargin))

  /** [[Inference.cronbachAlpha]]: do per-user counts of the five event
    * types move together (one underlying "engagement" trait)? Item
    * scores are (user, event_type) counts; users missing a type score
    * 0 via the zero-fill-by-omission device the operator documents. */
  private val q239 = QDef("q239_cronbach_alpha",
    (s, dir) => Inference.cronbachAlpha(
      T(s, dir, "events"), col("user_id"), col("event_type"), lit(1L)),
    Some("""WITH c AS (SELECT user_id AS u, event_type AS it,
      |        CAST(count(*) AS BIGINT) AS x
      |      FROM events
      |      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      |      GROUP BY 1, 2),
      |ti AS (SELECT it, CAST(sum(x) AS BIGINT) AS s,
      |        CAST(sum(x * x) AS BIGINT) AS ss FROM c GROUP BY 1),
      |tu AS (SELECT u, CAST(sum(x) AS BIGINT) AS t FROM c GROUP BY 1),
      |ts AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(t) AS BIGINT) AS st,
      |        CAST(sum(t * t) AS BIGINT) AS stt FROM tu),
      |ag AS (SELECT ts.n AS n, ts.st AS st, ts.stt AS stt,
      |        CAST(count(*) AS BIGINT) AS k,
      |        CAST(sum(ts.n * ss - s * s) AS BIGINT) AS num
      |       FROM ti CROSS JOIN ts GROUP BY 1, 2, 3)
      |SELECT k AS k_items, n AS n_units,
      |  round(CAST(k AS DOUBLE) / nullif(CAST(k - 1 AS DOUBLE), 0.0) *
      |    (1.0 - CAST(num AS DOUBLE) /
      |      nullif(CAST(n * stt - st * st AS DOUBLE), 0.0)), 4) AS alpha
      |FROM ag""".stripMargin))

  def all: Seq[QDef] = Seq(q236, q237, q238, q239)
}
