package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Sessionization (batch session_window vs flatMapGroupsWithState) and
  * as-of join semantics on hand-computed frames + the sf0.001 fixture. */
class SessionAsofSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("sessions: inclusive boundary — new session only when gap > threshold") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 00:29:59"), 2L), // < 30 min after prev -> same
      (1L, ts("2024-01-01 00:59:59"), 3L), // exactly 30:00 after -> still same
      (1L, ts("2024-01-01 01:30:00"), 4L), // 30:01 after -> NEW
      (2L, ts("2024-01-01 12:00:00"), 5L)
    ).toDF("user_id", "ts", "event_id")
    val s = Sessionize.sessions(ev, "30 minutes")
      .orderBy("user_id", "session_start")
      .select("user_id", "n_events").as[(Long, Long)].collect().toSeq
    assert(s === Seq((1L, 3L), (1L, 1L), (2L, 1L)))
  }

  test("userStats matches hand count") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 00:10:00"), 2L),
      (1L, ts("2024-01-01 02:00:00"), 3L),
      (2L, ts("2024-01-01 00:00:00"), 4L)
    ).toDF("user_id", "ts", "event_id")
    val s = Sessionize.userStats(ev, "30 minutes").orderBy("user_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(s === Seq((1L, 2L, 3L, 2L), (2L, 1L, 1L, 1L)))
  }

  test("statefulSessions (flatMapGroupsWithState) emits exactly the closed sessions") {
    implicit val s = spark
    val ev = Tables.t(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[Sessionize.SessEvent]
    val streamed = Sessionize.statefulSessions(ev, 1800L * 1000000)
      .select(col("user_id"), col("start_us"), col("n_events"))
    // batch truth: all sessions minus each user's last (still open in state)
    val batch = Sessionize.sessions(Tables.t(spark, sf, "events"), "30 minutes")
      .select(col("user_id"), unix_micros(col("session_start")).as("start_us"),
        col("n_events"), col("session_end"))
    val lastPerUser = batch.groupBy("user_id")
      .agg(max("session_end").as("session_end"))
    val closed = batch.join(lastPerUser, Seq("user_id", "session_end"), "left_anti")
      .drop("session_end")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(closed).isEmpty && closed.exceptAll(streamed).isEmpty)
  }

  test("statefulSessions: a late in-gap event extends the open session, never regresses it") {
    implicit val s = spark
    import spark.implicits._
    // batch 1 establishes last=1000s; batch 2 delivers a LATE event at
    // 100s (within the 30 min gap of 1000s) then one at 2000s — the open
    // session must span [100s, 2000s] with 3 events, not restart
    val gapUs = 1800L * 1000000
    val all = Seq(Sessionize.SessEvent(7L, 1000L * 1000000),
      Sessionize.SessEvent(7L, 100L * 1000000),
      Sessionize.SessEvent(7L, 2000L * 1000000),
      // a far-future event closes the open session so it is emitted
      Sessionize.SessEvent(7L, 100000L * 1000000)).toDS()
    val out = Sessionize.statefulSessions(all, gapUs).collect()
    assert(out.length === 1)
    assert(out.head.start_us === 100L * 1000000 && out.head.n_events === 3L)
  }

  test("asof backward: a NULL right timestamp is never carried as a match") {
    val left = Seq((1L, 100L)).toDF("k", "ts")
    val right = Seq((1L, Option.empty[Long], "ghost"),
      (1L, Some(300L), "late")).toDF("k", "rts", "payload")
    val out = AsofJoin.backward(left, col("k"), col("ts"),
      right, col("k"), col("rts"), Seq("payload"), lit(0L))
      .collect().head
    assert(out.isNullAt(2)) // no right row at/before ts=100 -> null, not ghost
  }

  test("streaming session_window equals batch sessions closed before the watermark") {
    val streamed = EventStreams.runSessions(spark, sf, name = "graft_sess_spec")
    val batch = Sessionize.sessions(Tables.t(spark, sf, "events"), "30 minutes")
    // final watermark = max event time - 1 hour; sessions whose END is at or
    // before it are finalized and emitted in append mode (Spark emits at
    // exact equality — see the boundary pin test below)
    val maxTs = Tables.t(spark, sf, "events").agg(max("ts")).collect().head.getTimestamp(0)
    val cutoff = new java.sql.Timestamp(maxTs.getTime - 3600 * 1000)
    val closed = batch.where(col("session_end") <= lit(cutoff))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(closed).isEmpty)
    // every closed batch session is emitted (watermark can only lag behind)
    assert(closed.exceptAll(streamed).isEmpty)
  }

  test("append-mode hourly agg equals batch windows closed before the watermark") {
    val streamed = EventStreams.runHourlyAppend(spark, sf, "graft_hourly_append_spec")
    val ev = Tables.t(spark, sf, "events")
    // batch truth: q23's hourly aggregation, restricted to windows whose END
    // is at or before the final watermark (max event time - 1 hour)
    val maxTs = ev.agg(max("ts")).collect().head.getTimestamp(0)
    val cutoff = new java.sql.Timestamp(maxTs.getTime - 3600 * 1000)
    val closed = ev
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .where(col("h") + expr("INTERVAL 1 HOUR") <= lit(cutoff))
      .select(date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
        col("event_type"), col("n"), col("sum_value"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(closed).isEmpty && closed.exceptAll(streamed).isEmpty)
  }

  test("stream-stream interval join equals the batch range join (q52 twin)") {
    val streamed = EventStreams.runConversionJoin(spark, sf, "graft_conv_spec")
      .groupBy("signup_id").agg(count(lit(1)).as("n"))
    val ev = Tables.t(spark, sf, "events")
    val batch = RangeJoin.countInWindow(
        ev.filter(col("event_type") === "signup"), col("event_id"), col("ts"),
        ev.filter(col("event_type") === "click"), col("ts"),
        windowSec = 3600, bucketSec = 3600)
      .select(col("__lid").as("signup_id"), col("n_in_window").as("n"))
      .where(col("n") > 0) // inner stream join emits matched signups only
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stream outer join: unmatched emits only once the watermark " +
    "proves no match can arrive; later state is held") {
    // crafted stream (the sf fixture's unmatched signups ALL clear the
    // final watermark, so it can't exercise the held-back path):
    //   signup A t0        + click t0+30m  -> matched pair
    //   signup B t0+2h     no click        -> B+1h <= wm -> emits (B, -1)
    //   signup C T-2h30m   no click        -> C+1h  > wm -> HELD, no row
    //   signup D T-1us     + click E at T  -> matched (also sets wm)
    // wm = min(max s_ts, max c_ts) - 2h = T - 2h - 1us
    import java.sql.Timestamp
    val t0 = 1700000000000L // ms
    val T = t0 + 10L * 3600 * 1000
    def ev(id: Long, ms: Long, typ: String) =
      (id, new Timestamp(ms), id, typ, 1.0, "{}")
    val rows = Seq(
      ev(1L, t0, "signup"), ev(10L, t0 + 1800 * 1000, "click"),
      ev(2L, t0 + 7200 * 1000, "signup"),
      ev(3L, T - 9000 * 1000, "signup"),
      ev(4L, T - 1, "signup"), ev(11L, T, "click"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_outer_spec").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir + "/__tmp")
    val part = new java.io.File(dir + "/__tmp").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      new java.io.File(dir + "/events.parquet").toPath)
    val out = EventStreams
      .runConversionJoinOuter(spark, dir, "graft_outer_spec")
      .orderBy("signup_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(out === List((1L, 10L), (2L, -1L), (4L, 11L)))
  }

  test("append emission when final watermark EQUALS a window end (oracle boundary pin)") {
    // q38/q71's append-mode oracle uses a strict cutoff (window_end < max(ts)
    // - 1h). The sf fixtures never land max(ts) - 1h exactly on an hour
    // boundary, so this pins Spark's emission convention at exact equality:
    // final event at 02:00:00 sharp -> final watermark 01:00:00 == end of the
    // [00:00, 01:00) window.
    val tmp = java.nio.file.Files.createTempDirectory("graft_wm_boundary").toFile
    val fixDir = new java.io.File(tmp, "fix"); fixDir.mkdirs()
    val baseNs = java.time.Instant.parse("2026-01-01T00:00:00Z").toEpochMilli * 1000000L
    def ns(min: Long): Long = baseNs + min * 60L * 1000000000L
    val ev = Seq(
      (1L, ns(10), 1L, "a", 1.0, ""),
      (2L, ns(20), 1L, "a", 2.0, ""),
      (3L, ns(90), 1L, "a", 3.0, ""),   // [01:00,02:00) stays open
      (4L, ns(120), 1L, "b", 4.0, "")   // exactly 02:00:00 -> watermark 01:00:00
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val outDir = new java.io.File(tmp, "out")
    ev.coalesce(1).write.mode("overwrite").parquet(outDir.getAbsolutePath)
    val part = outDir.listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(fixDir, "events.parquet").toPath)
    val emitted = EventStreams
      .runHourlyAppend(spark, fixDir.getAbsolutePath, "graft_wm_boundary_spec")
      .select("hour_ts").as[String].collect().toSet
    // Spark append mode emits a window when the watermark reaches its end
    // INCLUSIVELY: end == watermark is emitted (verified empirically here —
    // advisor round-4 flagged the convention as unpinned, and the pin
    // exposed that the original strict-< oracle cutoff was wrong). The
    // q38/q71 oracles therefore use `window_end <= max(ts) - delay`. Still-
    // open windows ([01:00,02:00), [02:00,03:00)) must not appear.
    assert(!emitted.contains("2026-01-01 01:00:00"))
    assert(!emitted.contains("2026-01-01 02:00:00"))
    assert(emitted === Set("2026-01-01 00:00:00"),
      s"emission convention changed: $emitted")
  }

  test("streaming dedup emits each key once (equals batch distinct)") {
    val streamed = EventStreams.runDedup(spark, sf, Seq("user_id", "event_type"),
      name = "graft_dedup_spec")
    val batchKeys = Tables.t(spark, sf, "events")
      .select("user_id", "event_type").distinct().count()
    assert(streamed.count() === batchKeys)
    assert(streamed.select("user_id", "event_type").distinct().count() === batchKeys)
  }

  test("asof backward: latest right at/before left ts; ties broken by greatest tie") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "a"),
                   (1L, ts("2024-01-01 12:00:00"), "b"),
                   (2L, ts("2024-01-01 10:00:00"), "c"))
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L),
      (1L, ts("2024-01-01 10:00:00"), 101L), // exactly at left a -> matches a
      (1L, ts("2024-01-01 10:00:00"), 102L), // same ts, greater id -> wins
      (1L, ts("2024-01-01 11:00:00"), 103L)  // between a and b
    ).toDF("k", "ts", "rid")
    val out = AsofJoin.backward(left, col("k"), col("ts"),
        right.withColumn("rts", col("ts")), col("k"), col("ts"),
        rightVals = Seq("rid"), rightTie = col("rid"))
      .orderBy("tag").select("tag", "rid")
      .as[(String, Option[Long])].collect().toSeq
    assert(out === Seq(("a", Some(102L)), ("b", Some(103L)), ("c", None)))
  }

  test("asof backward: null fields of the matched row are NOT backfilled from older rows") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "L")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), Some(10L), Some(20L)),
      (1L, ts("2024-01-01 11:00:00"), Option.empty[Long], Some(30L))
    ).toDF("k", "ts", "a", "b")
    val out = AsofJoin.backward(left, col("k"), col("ts"),
        right, col("k"), col("ts"),
        rightVals = Seq("a", "b"), rightTie = col("b"))
      .select("a", "b").as[(Option[Long], Option[Long])].collect().head
    // the matched (latest) right row is (a=null, b=30) — a must stay null,
    // not be fused with the older row's a=10
    assert(out === ((None, Some(30L))))
  }

  test("RangeJoin.countInWindow: boundary inclusion/exclusion, zero-match rows kept") {
    val left = Seq((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 20:00:00")))
      .toDF("id", "ts")
    val right = Seq(
      ts("2024-01-01 10:00:00"), // == left start -> in
      ts("2024-01-01 10:59:59"), // just inside
      ts("2024-01-01 11:00:00"), // == start+window -> out
      ts("2024-01-01 09:59:59")  // before -> out
    ).toDF("ts")
    val got = RangeJoin.countInWindow(left, col("id"), col("ts"),
        right, col("ts"), windowSec = 3600, bucketSec = 600)
      .orderBy("__lid").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L), (2L, 0L)))
  }

  test("connectedComponents: chain, star, and singleton-pair topologies") {
    // chain 1-2-3-4 (diameter 3), star 10-{11,12,13}, pair 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L), (20L, 21L))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("property: connectedComponents == driver-side union-find (random graphs)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val edgeGen = for {
      a <- Gen.choose(0L, 39L); b <- Gen.choose(0L, 39L) if a != b
    } yield (math.min(a, b), math.max(a, b))
    (0 until 3).foreach { round =>
      val edges = Gen.listOfN(30, edgeGen)
        .apply(Gen.Parameters.default, Seed(100L + round)).get.distinct
      // reference: plain union-find over the same edges
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // min-id representative per component
      val expMin = nodes.groupBy(find).flatMap { case (_, ns) =>
        val m = ns.min; ns.map(_ -> m)
      }
      val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      assert(got === expMin, s"round $round")
    }
  }

  test("property: asof backward == naive per-row max filter (random data)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowGen = for {
      k <- Gen.choose(0L, 4L); t <- Gen.choose(0L, 50L)
    } yield (k, t)
    val ls = Gen.listOfN(40, rowGen).apply(Gen.Parameters.default, Seed(7L)).get
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
    val rs = Gen.listOfN(40, rowGen).apply(Gen.Parameters.default, Seed(8L)).get
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
    val left = ls.toDF("k", "ts", "lid")
    val right = rs.toDF("k", "ts", "rid")
    val got = AsofJoin.backward(left, col("k"), col("ts"),
        right, col("k"), col("ts"), rightVals = Seq("rid"), rightTie = col("rid"))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    ls.foreach { case (k, t, lid) =>
      val cand = rs.filter(r => r._1 == k && r._2 <= t)
      val exp = if (cand.isEmpty) None
        else Some(cand.maxBy(r => (r._2, r._3))._3) // latest ts, then greatest rid
      assert(got(lid) === exp, s"left row $lid")
    }
  }

  test("empty-input edges: asof with no right rows, CC with no edges, sample fracs 0/1") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "a")).toDF("k", "ts", "tag")
    val right = Seq.empty[(Long, java.sql.Timestamp, Long)].toDF("k", "ts", "rid")
    val asof = AsofJoin.backward(left, col("k"), col("ts"),
        right, col("k"), col("ts"), rightVals = Seq("rid"), rightTie = col("rid"))
      .select("tag", "rid").as[(String, Option[Long])].collect().toSeq
    assert(asof === Seq(("a", None)))

    val noEdges = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(noEdges).count() === 0)

    val d = Tables.t(spark, sf, "documents")
    assert(Sampling.hashSample(d, col("doc_id"), 0.0).count() === 0)
    assert(Sampling.hashSample(d, col("doc_id"), 1.0).count() === d.count())
  }

  test("ivfTopK: self-match first; results subset of brute-force ordering") {
    val e = Tables.t(spark, sf, "embeddings")
    val cents = Similarity.collectCentroids(e, col("embedding"), col("vec_id"), 8)
    val q = e.orderBy("vec_id").limit(1)
    val ivf = Similarity.ivfTopK(e, col("embedding"), col("vec_id"),
      q, col("embedding"), k = 10, centroids = cents, nProbe = 3)
      .as[(Long, Double)].collect().toSeq
    assert(ivf.head._1 === 0L && math.abs(ivf.head._2 - 1.0) < 1e-9)
    val brute = Similarity.bruteForceTopK(e, col("embedding"), col("vec_id"),
      q, col("embedding"), k = 500).as[(Long, Double)].collect().toMap
    // every ivf hit carries its true cosine
    ivf.foreach { case (id, c) => assert(math.abs(brute(id) - c) < 1e-9) }
  }

  test("kmeansCentroids: training moves centroids and beats the lowest-id codebook on recall") {
    val e = Tables.t(spark, sf, "embeddings")
    val trained = Similarity.kmeansCentroids(e, col("embedding"), col("vec_id"),
      c = 16, iters = 2)
    val init = Similarity.collectCentroids(e, col("embedding"), col("vec_id"), 16)
    assert(trained.map(_._1) === init.map(_._1)) // cell ids stay the init vec_ids
    // training actually iterated: at least one centroid left its init vector
    // (trained centroids are member SUMS, so compare directions via cosine)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val moved = trained.zip(init).count { case ((_, t), (_, i0)) => cos(t, i0) < 1 - 1e-9 }
    assert(moved > 0, "no centroid moved — k-means degenerated to init")

    // recall@10 against brute force, averaged over 20 query vectors
    val brute = Similarity.bruteForceTopK _
    val qids = (0 until 500 by 25).map(_.toLong)
    def recall(cents: Seq[(Long, Array[Double])]): Double = {
      val hits = qids.map { qid =>
        val q = e.filter(col("vec_id") === qid)
        val exact = rows(brute(e, col("embedding"), col("vec_id"),
          q, col("embedding"), 10)).map(_.getLong(0)).toSet
        val approx = rows(Similarity.ivfTopK(e, col("embedding"), col("vec_id"),
          q, col("embedding"), k = 10, centroids = cents, nProbe = 4))
          .map(_.getLong(0)).toSet
        (exact intersect approx).size / 10.0
      }
      hits.sum / hits.size
    }
    val rTrained = recall(trained)
    val rInit = recall(init)
    info(f"recall@10 trained=$rTrained%.3f lowest-id=$rInit%.3f")
    assert(rTrained >= 0.5, f"trained recall too low: $rTrained%.3f (0.600 when pinned)")
    assert(rTrained >= rInit - 1e-9,
      f"k-means ($rTrained%.3f) should not lose to lowest-id init ($rInit%.3f)")
  }

  test("scdIntervals: half-open chain per key, tieBreak orders equal versions, latest current") {
    val df = Seq(
      (1L, "price", 100L, 10L),
      (1L, "price", 105L, 11L), // same version later tiebreak -> second
      (1L, "price", 105L, 9L),  // same version lower tiebreak -> first of the tie
      (1L, "stock", 50L, 20L),
      (2L, "price", 7L, 30L)
    ).toDF("ent", "attr", "ver", "obs_id")
    val got = Sessionize.scdIntervals(df, Seq(col("ent"), col("attr")),
      col("ver"), col("obs_id"))
      .select("ent", "attr", "obs_id", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Long, Option[Long], Long)].collect().toSet
    assert(got === Set(
      (1L, "price", 10L, 100L, Some(105L), 0L),
      (1L, "price", 9L, 105L, Some(105L), 0L), // tie: 9 precedes 11
      (1L, "price", 11L, 105L, None, 1L),
      (1L, "stock", 20L, 50L, None, 1L),
      (2L, "price", 30L, 7L, None, 1L)))
  }
}
