package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe: measure [[org.apache.spark.sql.graft.RankToMinStruct]]'s
  * win on the workload it exists for — keep-first over a key space with
  * one boilerplate heavy hitter. Synthesizes `n` rows where every
  * `hotEvery`-th row shares fingerprint 0 (the hot key) and the rest
  * are singletons, then times the row_number-window spelling on a stock
  * session vs the same code on a GraftExtensions session (where the
  * rule rewrites it to the min-struct aggregate).
  *
  * Usage: runMain graft.tools.RankRewriteProbe [n] [hotEvery]
  */
object RankRewriteProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val hotEvery = if (args.length > 1) args(1).toLong else 4L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    def build(ext: Boolean): SparkSession = {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val b = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
      (if (ext) b.withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
       else b).getOrCreate()
    }
    def run(s: SparkSession, tag: String): Unit = {
      val d = s.range(n)
        .select(when(col("id") % hotEvery === 0, 0L).otherwise(col("id"))
            .as("g"),
          col("id").as("doc_id"), (col("id") % 1000).as("p"))
      // order key must be formally NON-NULLABLE for the rule to fire
      // (id is; id % k is nullable by Remainder's contract) — p rides
      // along as carried payload
      val w = Window.partitionBy("g").orderBy("doc_id")
      val q = d.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1).select("g", "doc_id")
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val windowed = q.queryExecution.optimizedPlan.collectFirst {
        case wn: org.apache.spark.sql.catalyst.plans.logical.Window => wn
      }.nonEmpty
      println(f"$tag%-10s window=$windowed%-5s " +
        times.map(t => f"$t%7.2f").mkString(" ") + "  (3 runs)")
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
    println(s"n=$n rows, hot key holds ${n / hotEvery} of them")
    run(build(ext = false), "stock")
    run(build(ext = true), "rewritten")
  }
}
