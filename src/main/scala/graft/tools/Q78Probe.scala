package graft.tools
import org.apache.spark.sql.SparkSession
object Q78Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = { nJobs.incrementAndGet(); () }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val info = s.stageInfo
        val ms = info.completionTime.getOrElse(0L) - info.submissionTime.getOrElse(0L)
        if (ms > 300) System.err.println(f"[stage] ${info.stageId}%5d ${ms/1000.0}%7.2fs tasks=${info.numTasks} ${info.name.take(80)}")
        ()
      }
    })
    (1 to 3).foreach { i =>
      nJobs.set(0)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q78_stream_conversion_join")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[q78] rep$i ${(System.nanoTime()-t0)/1e9}%7.2fs jobs=${nJobs.get()}")
    }
    spark.stop()
  }
}
