package graft

import org.apache.spark.sql.functions._

/** Pins the integer-space round(,4) device on engineered boundary
  * values — exact ties at ±.00005 must round half away from zero, and
  * the long-overflow regime must survive the decimal(38,0) promotion. */
class SealSpec extends SparkSpec {
  import spark.implicits._

  test("ratio4 boundary and sign cases") {
    val df = Seq(
      (1L, 20000L),      // exact tie 0.00005 -> 0.0001
      (-1L, 20000L),     // -0.00005 -> -0.0001
      (3L, 8L),          // 0.375 exact
      (1L, 32L),         // 0.03125 tie -> 0.0313
      (-1L, 32L),        // -> -0.0313
      (7L, 2L),          // 3.5 exact
      (0L, 5L))          // 0
      .toDF("num", "den")
    val got = df.select(Seal.ratio4("num", "den").as("r")).collect()
      .map(_.getDouble(0)).toSeq
    assert(got === Seq(0.0001, -0.0001, 0.375, 0.0313, -0.0313, 3.5, 0.0))
  }

  test("pow4 boundary cases at m = 6 and m = 9, and m = 4 display") {
    val df = Seq(50L, -50L, 149L, 150L, -150L, 123456L).toDF("k")
    val got6 = df.select(Seal.pow4("k", 6).as("r")).collect()
      .map(_.getDouble(0)).toSeq
    assert(got6 === Seq(0.0001, -0.0001, 0.0001, 0.0002, -0.0002, 0.1235))
    val df9 = Seq(50000L, 150000L, 5000000000000L).toDF("k")
    val got9 = df9.select(Seal.pow4("k", 9).as("r")).collect()
      .map(_.getDouble(0)).toSeq
    assert(got9 === Seq(0.0001, 0.0002, 5000.0))
    val df4 = Seq(12345L, -5L).toDF("k")
    assert(df4.select(Seal.pow4("k", 4).as("r")).collect()
      .map(_.getDouble(0)).toSeq === Seq(1.2345, -0.0005))
  }

  test("ratio4c (column form) matches ratio4 on the boundary cases") {
    val df = Seq((1L, 20000L), (-1L, 20000L), (3L, 8L), (1L, 32L),
      (-1L, 32L), (7L, 2L), (0L, 5L)).toDF("num", "den")
    val got = df.select(Seal.ratio4c(col("num"), col("den")).as("r"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got === Seq(0.0001, -0.0001, 0.375, 0.0313, -0.0313, 3.5, 0.0))
  }

  test("ratio4 survives magnitudes where 2*num*10000 overflows a long") {
    // num = 9e17: 2*num*1e4 = 1.8e22 >> Long.MaxValue; decimal carries it
    val df = Seq((900000000000000000L, 1000000000000000000L)).toDF("num", "den")
    assert(df.select(Seal.ratio4("num", "den").as("r")).collect()
      .head.getDouble(0) === 0.9)
  }
}
