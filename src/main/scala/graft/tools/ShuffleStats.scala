package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev tool: measured shuffle/spill volumes per query — the evidence behind
  * PLANS.md's "one shuffle of X" claims. Runs each named query to a noop
  * sink with a task-metrics listener and prints shuffle write/read bytes,
  * spill, and task count.
  *
  * Usage: runMain graft.tools.ShuffleStats <sfDir> [query...]
  */
object ShuffleStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
                else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val write = new AtomicLong; val read = new AtomicLong
    val spill = new AtomicLong; val tasks = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          tasks.incrementAndGet()
        }
      }
    })
    println(f"${"query"}%-28s ${"shufW_MB"}%9s ${"shufR_MB"}%9s ${"spill_MB"}%9s ${"tasks"}%6s")
    names.foreach { n =>
      write.set(0); read.set(0); spill.set(0); tasks.set(0)
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      // the listener bus is async; give it a beat to drain before reading
      Thread.sleep(800)
      println(f"$n%-28s ${write.get / 1e6}%9.1f ${read.get / 1e6}%9.1f " +
        f"${spill.get / 1e6}%9.1f ${tasks.get}%6d")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
