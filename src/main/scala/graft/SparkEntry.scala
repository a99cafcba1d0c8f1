package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The query inventory lives in [[Queries]] / [[ExtQueries]]; this object is
  * the thin registration surface the driver introspects. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q16 is the reference's `state_summary` workload (SURVEY §7.2.1). */
  def entry(spark: SparkSession): DataFrame =
    queries("q16_group_agg_mixed")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.all.collect { case Queries.QDef(n, _, Some(sql)) => n -> sql }.toMap
}
