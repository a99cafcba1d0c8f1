package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class GeoidOpsSpec extends SparkSpec {
  import spark.implicits._

  test("build + parse roundtrip on literal components") {
    val df = Seq((6, 37, 123456, 1)).toDF("s", "c", "t", "b")
      .withColumn("geoid", GeoidOps.buildGeoid(col("s"), col("c"), col("t"), col("b")))
    val parsed = df.select(GeoidOps.parseGeoid(col("geoid")).map(_._2): _*)
    assert(rows(parsed).head.toSeq === Seq("06", "037", "123456", "1"))
    assert(rows(df.select("geoid")).head.getString(0) === "060371234561")
  }

  test("property: parse(build(s,c,t,b)) == zero-padded components (200 samples)") {
    val gen = for {
      s <- Gen.choose(0, 99); c <- Gen.choose(0, 999)
      t <- Gen.choose(0, 999999); b <- Gen.choose(0, 9)
    } yield (s, c, t, b)
    val samples = Gen.listOfN(200, gen).apply(Gen.Parameters.default, Seed(42L)).get
    val df = samples.toDF("s", "c", "t", "b")
      .withColumn("geoid", GeoidOps.buildGeoid(col("s"), col("c"), col("t"), col("b")))
    val got = rows(df.select(Seq(col("s"), col("c"), col("t"), col("b")) ++
      GeoidOps.parseGeoid(col("geoid")).map(_._2): _*))
    got.foreach { r =>
      val (s, c, t, b) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(Seq(r.getString(4), r.getString(5), r.getString(6), r.getString(7)) ===
        Seq(f"$s%02d", f"$c%03d", f"$t%06d", f"$b%01d"))
    }
  }

  test("null component propagates null geoid (pandas concat semantics)") {
    val df = Seq((Some(6), Option.empty[Int])).toDF("s", "c")
      .withColumn("geoid", GeoidOps.buildGeoid(col("s"), col("c")))
    assert(rows(df.select("geoid")).head.isNullAt(0))
  }

  test("coarsen truncates by level; unknown level throws") {
    val df = Seq("060371234561").toDF("geoid")
    assert(rows(df.select(GeoidOps.coarsen(col("geoid"), "county"))).head.getString(0) === "06037")
    assert(rows(df.select(GeoidOps.coarsen(col("geoid"), "state"))).head.getString(0) === "06")
    assertThrows[IllegalArgumentException](GeoidOps.coarsen(col("geoid"), "galaxy"))
  }
}
