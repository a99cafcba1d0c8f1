package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** The CROSS-ROUND bench ruler (r12 judge directive 6): the driver
  * reseeds /root/testdata every round, which moved untouched queries
  * +11–23% round-over-round and forced per-query forensics. This tool
  * freezes ONE copy of the sf0.1 fixture (`bench_frozen/` at the repo
  * root — git-ignored, and deliberately OUTSIDE target/ because the
  * r13 full test suite cleaned target/ and silently re-based the ruler;
  * created on first run, regenerated only by deleting it) and times the
  * core24 suite on it with the Bench discipline (pinned tmp, untimed
  * warmup pass, two timed passes, min per query, noop sink) — a number
  * comparable across rounds BY CONSTRUCTION. One JSON line per run
  * appends to `FROZEN_BENCH.jsonl` in the repo root (committed, so the
  * series survives). If the frozen dir was lost (target/ wipe), the
  * first run of the next round re-freezes from the then-current
  * fixture and the line records the re-base via `frozen_created`. */
object FrozenBench {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tag = sys.env.getOrElse("SPARK_GRAFT_ROUND", "r?")
    val frozen = new java.io.File("bench_frozen")
    val meta = new java.io.File(frozen, "_frozen_meta.txt")
    if (!frozen.isDirectory || !meta.isFile) {
      graft.Staging.deleteRecursively(frozen)
      frozen.mkdirs()
      Option(new java.io.File(src).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => Files.copy(f.toPath,
          Paths.get(frozen.getPath, f.getName),
          StandardCopyOption.REPLACE_EXISTING))
      Files.write(meta.toPath,
        s"frozen from $src at ${java.time.Instant.now()} ($tag)"
          .getBytes("UTF-8"))
      ()
    }
    val created = new String(Files.readAllBytes(meta.toPath), "UTF-8").trim
    val benchTmp = new java.io.File("target/bench_tmp_frozen")
    graft.Staging.deleteRecursively(benchTmp)
    benchTmp.mkdirs()
    System.setProperty("java.io.tmpdir", benchTmp.getAbsolutePath)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", benchTmp.getAbsolutePath)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val core = graft.SparkEntry.queries.toSeq
      .filter(_._1.matches("q(0[1-9]|1[0-9]|2[0-4])_.*")).sortBy(_._1)
    def dropBlocks(): Unit = spark.sparkContext.getPersistentRDDs
      .values.foreach(_.unpersist(blocking = true))
    def pass(timed: Boolean): Map[String, Double] = core.map {
      case (name, fn) =>
        System.gc()
        val t0 = System.nanoTime()
        fn(spark, frozen.getPath).write.format("noop")
          .mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        dropBlocks()
        name -> dt
    }.toMap
    pass(timed = false) // warmup
    val p1 = pass(timed = true)
    val p2 = pass(timed = true)
    val mins = core.map { case (n, _) => n -> math.min(p1(n), p2(n)) }
    val total = mins.map(_._2).sum
    def fmt(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = mins.map { case (n, v) =>
      "\"" + n.takeWhile(_ != '_') + "\":" + fmt(v) }.mkString("{", ",", "}")
    val line = s"""{"round":"$tag","frozen_core24":${fmt(total)},""" +
      s""""queries":$qs,"frozen_created":"$created"}"""
    println(line)
    val out = new java.io.FileWriter("FROZEN_BENCH.jsonl", true)
    try out.write(line + "\n") finally out.close()
    spark.stop()
  }
}
