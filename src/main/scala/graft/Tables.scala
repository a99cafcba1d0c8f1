package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture loaders (TESTDATA.md / FIXTURES.md).
  *
  * Every query receives the scale-factor directory at call time; tables are
  * plain parquet reads so Catalyst handles column pruning + filter pushdown
  * into the scan. At cluster scale these would be partitioned/bucketed
  * catalog tables — the loader is the single seam to swap that in.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark refuses to read
      // natively: land it as long nanos, then truncate to microseconds
      // (integral DIV — a double division would lose precision at 1e18).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
}
