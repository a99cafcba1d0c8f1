package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed staging tables — the co-located-join story at cluster scale.
  *
  * A dataset staged with `bucketBy(n, key).sortBy(key)` carries its hash
  * partitioning in the catalog: every later equi-join or aggregation on
  * the bucket key reads the buckets directly and plans with ZERO Exchange
  * (and zero Sort, thanks to sortBy) on that side. For a fact table joined
  * repeatedly on the same key — the reference's GEOID joins, a training
  * pipeline's doc_id joins — this converts a per-query shuffle of the big
  * side into a one-time cost at staging. The no-Exchange plan property is
  * pinned by the unit suite.
  */
object Staging {
  /** Stage `df` as a bucketed, per-bucket-sorted managed parquet table.
    * Idempotent: drops any prior table AND its location first (with the
    * in-memory catalog, a dropped table's files survive the session and
    * would otherwise block re-creation). */
  def stageBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = new java.io.File(warehouse, table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(loc)
    }
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
  }

  def load(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
