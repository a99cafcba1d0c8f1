package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: run queries N times each and print per-iteration wall times,
  * separating steady-state cost from first-run codegen/IO warmup.
  *
  * Usage: runMain graft.Time <sfDir> <iterations> <queryName>...
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = if (args.length > 1) args(1).toInt else 3
    val names = if (args.length > 2) args.drop(2).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-28s ${times.map(t => f"$t%7.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
