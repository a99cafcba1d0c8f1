package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one or more queries.
  *
  * Usage: runMain graft.Explain <sfDir> <queryName>...
  * With no query names, dumps every registered query. Used to audit the
  * scale-critical plan properties (PushedFilters on the parquet scan,
  * BroadcastHashJoin on small dims, ReusedExchange on self-joins, wide
  * WholeStageCodegen spans) — see PLANS.md.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"[explain] failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
