package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[org.apache.spark.sql.graft.RankToMinStruct]]: the keep-first
  * window → min-struct aggregate optimizer rule, injected via
  * GraftExtensions. Pins (a) the rewrite fires on the eligible shape
  * and produces the identical result, (b) Max for descending
  * (keep-latest), (c) every ineligibility guard leaves the Window
  * untouched. */
class RankRewriteSpec extends SparkSpec {

  private def withExtSession[T](body: SparkSession => T): T = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[4]")
        .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
        .getOrCreate()
      body(s2)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  private def hasWindow(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.nonEmpty

  private def hasAgg(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.nonEmpty

  private def fixture(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq((1L, 30L, "c"), (1L, 10L, "a"), (1L, 20L, "b"),
      (2L, 5L, "x"), (3L, 7L, "y"), (3L, 6L, "z"))
      .toDF("k", "o", "payload")
  }

  test("rn = 1 ascending rewrites to a min-struct Aggregate, result-equal") {
    withExtSession { s2 =>
      val w = Window.partitionBy("k").orderBy("o")
      val q = fixture(s2).withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
      assert(!hasWindow(q), s"window survived:\n${q.queryExecution.optimizedPlan}")
      assert(hasAgg(q))
      val got = q.orderBy("k")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getInt(3))).toList
      assert(got === List((1L, 10L, "a", 1), (2L, 5L, "x", 1),
        (3L, 6L, "z", 1)))
    }
  }

  test("descending order rewrites to MAX (keep-latest); rn < 2 also fires") {
    withExtSession { s2 =>
      val w = Window.partitionBy("k").orderBy(col("o").desc)
      val q = fixture(s2).withColumn("rn", row_number().over(w))
        .where(col("rn") < 2)
      assert(!hasWindow(q))
      val got = q.orderBy("k").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toList
      assert(got === List((1L, 30L), (2L, 5L), (3L, 7L)))
    }
  }

  test("rn = 1 AND another predicate: rank conjunct peeled, rest post-filters") {
    withExtSession { s2 =>
      val w = Window.partitionBy("k").orderBy("o")
      val q = fixture(s2).withColumn("rn", row_number().over(w))
        .where(col("rn") === 1 && col("payload") =!= "a")
      assert(!hasWindow(q), s"window survived:\n${q.queryExecution.optimizedPlan}")
      // group 1's winner is ("a") and must be FILTERED OUT, not replaced
      // by the next-ranked row — the post-filter runs above the aggregate
      val got = q.orderBy("k").collect()
        .map(r => (r.getLong(0), r.getString(2))).toList
      assert(got === List((2L, "x"), (3L, "z")))
      // a conjunct referencing the rank: ConstantPropagation substitutes
      // rn := 1 (rn = 1 is conjoined), so the rewrite STILL fires and the
      // result matches the substituted predicate 1 + o > 0 ≡ always true
      val q2 = fixture(s2).withColumn("rn", row_number().over(w))
        .where(col("rn") === 1 && col("rn") + col("o") > 0)
      assert(!hasWindow(q2))
      assert(q2.orderBy("k").collect().map(_.getLong(1)).toList ===
        List(10L, 5L, 6L))
    }
  }

  test("SQL spelling through the extensions session fires too") {
    withExtSession { s2 =>
      fixture(s2).createOrReplaceTempView("t_rank_rewrite")
      val q = s2.sql("""SELECT k, o, payload FROM (
        |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY o) AS rn
        |  FROM t_rank_rewrite) WHERE rn = 1""".stripMargin)
      assert(!hasWindow(q))
      assert(q.orderBy("k").collect().map(_.getLong(1)).toList ===
        List(10L, 5L, 6L))
    }
  }

  test("guards: rank 2 / nullable order key / mixed direction / rank() stay windowed") {
    withExtSession { s2 =>
      import s2.implicits._
      val f = fixture(s2)
      val w = Window.partitionBy("k").orderBy("o")
      // rn = 2 is not keep-first
      assert(hasWindow(f.withColumn("rn", row_number().over(w))
        .where(col("rn") === 2)))
      // nullable order key: null-ordering semantics not provably equal
      val nullable = f.withColumn("on",
        when(col("o") > 0, col("o")))
      val wn = Window.partitionBy("k").orderBy("on")
      assert(hasWindow(nullable.withColumn("rn", row_number().over(wn))
        .where(col("rn") === 1)))
      // mixed direction
      val wm = Window.partitionBy("k").orderBy(col("o").asc, col("payload").desc)
      assert(hasWindow(f.withColumn("rn", row_number().over(wm))
        .where(col("rn") === 1)))
      // rank() (not row_number) can emit several rank-1 rows under ties
      assert(hasWindow(f.withColumn("rn", rank().over(w))
        .where(col("rn") === 1)))
    }
    // and the plain session (no extensions) never rewrites
    val wMain = Window.partitionBy("k").orderBy("o")
    assert(hasWindow(fixture(spark).withColumn("rn", row_number().over(wMain))
      .where(col("rn") === 1)))
  }

  test("guards: global window (no PARTITION BY) stays windowed — empty input parity") {
    withExtSession { s2 =>
      import s2.implicits._
      // grouping-less Aggregate emits one NULL row on EMPTY input where
      // the window emits zero — the rule must not fire on a global spec
      val wg = Window.orderBy("o")
      val full = fixture(s2).withColumn("rn", row_number().over(wg))
        .where(col("rn") === 1)
      assert(hasWindow(full), s"global window rewritten:\n${full.queryExecution.optimizedPlan}")
      assert(full.count() === 1L)
      val empty = fixture(s2).where(col("k") < 0)
        .withColumn("rn", row_number().over(wg)).where(col("rn") === 1)
      assert(empty.count() === 0L, "empty input must produce zero rows")
    }
  }

  test("guards: non-orderable payload (MapType) stays windowed and executes") {
    withExtSession { s2 =>
      // Min(struct(..., map)) would pass analysis (rule runs
      // post-analysis) and crash at planning — guard must leave the
      // Window so the query keeps working exactly as on a stock session
      val w = Window.partitionBy("k").orderBy("o")
      val q = fixture(s2)
        .withColumn("m", map(col("payload"), col("o")))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
      assert(hasWindow(q), s"map payload rewritten:\n${q.queryExecution.optimizedPlan}")
      assert(q.count() === 3L)
    }
  }

  test("rewrite preserves output nullability (KnownNotNull on non-null sources)") {
    withExtSession { s2 =>
      val w = Window.partitionBy("k").orderBy("o")
      val q = fixture(s2).withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
      assert(!hasWindow(q))
      // fixture columns are non-nullable (Seq.toDF of AnyVal/String);
      // the rewritten plan must not widen them to nullable
      val stockSchema = fixture(s2)
        .withColumn("rn", row_number().over(w)).schema
      assert(q.schema.map(f => (f.name, f.nullable)) ===
        stockSchema.map(f => (f.name, f.nullable)))
    }
  }

  test("rewrite result equals the stock-plan result on the fixture table") {
    // the scrubRepeatedSpans-shaped workload: keep-first occurrence per
    // fingerprint over the real documents fixture, both sessions
    def keepFirst(s: SparkSession, dir: String): List[(Long, Long, Long)] = {
      val d = Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")))
        .select(xxhash64(col("col")).as("g"), col("doc_id"),
          (col("pos") + 1).cast("long").as("p"))
      val w = Window.partitionBy("g").orderBy("doc_id", "p")
      d.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select("g", "doc_id", "p")
        .orderBy("g").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    }
    val stock = keepFirst(spark, sf)
    val rewritten = withExtSession(s2 => keepFirst(s2, sf))
    assert(rewritten === stock)
  }
}
