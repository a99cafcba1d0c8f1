package graft

import org.apache.spark.sql.functions._

/** Unit pins for the round-5 curation operators wired as q79–q84: PII
  * redaction, TF-IDF term scoring, SemDeDup, mixture resampling, length
  * curriculum, winnowing fingerprints. Each test crafts inputs where the
  * expected answer is hand-checkable.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------- PII redaction

  test("redactPii: each category replaced with its token, counts on original text") {
    val docs = Seq(
      (1L, "write to alice.b+spam@corp.example.org today"),
      (2L, "call 415-555-0199 or 650-555-0100 now"),
      (3L, "server at 10.0.255.7 and 192.168.1.1"),
      (4L, "mixed bob@ex.io 415-555-0100 10.1.2.3"),
      (5L, "clean text with no pii at all")
    ).toDF("id", "t")
    val out = docs.select(col("id"),
        TextAnalysis.redactPii(col("t")).as("r"),
        TextAnalysis.piiCounts(col("t")).as("c"))
      .orderBy("id")
      .select(col("id"), col("r"), col("c.n_email"), col("c.n_phone"), col("c.n_ip"))
      .as[(Long, String, Int, Int, Int)].collect().toSeq
    assert(out(0) === ((1L, "write to <EMAIL> today", 1, 0, 0)))
    assert(out(1) === ((2L, "call <PHONE> or <PHONE> now", 0, 2, 0)))
    assert(out(2) === ((3L, "server at <IP> and <IP>", 0, 0, 2)))
    assert(out(3) === ((4L, "mixed <EMAIL> <PHONE> <IP>", 1, 1, 1)))
    assert(out(4) === ((5L, "clean text with no pii at all", 0, 0, 0)))
  }

  // ----------------------------------------------------------------- TF-IDF

  test("tfidfTopTerms: rare term outranks frequent term; ubiquitous term scores 0") {
    // "every" in all 4 docs (idf=0); "rare" only in doc 1; "mid" in 2 of 4
    val docs = Seq(
      (1L, "every rare mid mid"),
      (2L, "every mid"),
      (3L, "every every filler"),
      (4L, "every other words here")
    ).toDF("doc_id", "text")
    val out = Curate.tfidfTopTerms(docs, col("doc_id"), col("text"), k = 2)
      .where(col("doc_id") === 1).orderBy("rank")
      .select("term", "tf", "df", "tfidf")
      .as[(String, Long, Long, Double)].collect().toSeq
    // doc 1: mid tf=2 df=2 -> 2*ln(2)=1.3863; rare tf=1 df=1 -> ln(4)=1.3863
    // equal rounded scores -> term asc tie-break puts "mid" first
    assert(out.map(_._1) === Seq("mid", "rare"))
    assert(out(0) === (("mid", 2L, 2L, 1.3863)))
    assert(out(1) === (("rare", 1L, 1L, 1.3863)))
    // "every" (df=4=N) must score exactly 0 and never make top-k by score
    val every = Curate.tfidfTopTerms(docs, col("doc_id"), col("text"), k = 10)
      .where(col("term") === "every").select("tfidf")
      .as[Double].collect().toSeq
    assert(every.nonEmpty && every.forall(_ === 0.0))
  }

  // --------------------------------------------------------------- SemDeDup

  test("semanticDedup: near-dup in same cluster dropped (keep-first), cross-cluster kept") {
    // axis-aligned centroids; vectors 1,2 near +x (cos=1 to each other),
    // vector 3 near +y, vector 4 in +x cluster but orthogonal-ish direction
    val cents = Seq((0L, Array(1.0, 0.0, 0.0)), (1L, Array(0.0, 1.0, 0.0)))
    val vecs = Seq(
      (1L, Seq(10.0, 1.0, 0.0)),  // cluster 0, kept (first)
      (2L, Seq(20.0, 2.0, 0.0)),  // cluster 0, cos(v1,v2)=1 -> dropped
      (3L, Seq(0.0, 10.0, 1.0)),  // cluster 1, kept (alone near +y)
      (4L, Seq(5.0, 4.0, 8.0))    // cluster 0, low cos to v1 -> kept
    ).toDF("vec_id", "emb")
    val out = Dedup.semanticDedup(vecs, col("emb"), col("vec_id"), cents, minCos = 0.9)
      .orderBy("vec_id").as[(Long, Long, Int)].collect().toSeq
    assert(out === Seq((1L, 0L, 1), (2L, 0L, 0), (3L, 1L, 1), (4L, 0L, 1)))
  }

  // ------------------------------------------------------- mixture sampling

  test("mixtureSample: integer weights exact, zero excluded, fractional within band, epochs 1..n") {
    val docs = (1L to 400L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val weights = Seq("src0" -> 0.0, "src1" -> 2.0, "src2" -> 1.5, "src3" -> 1.0)
    val out = Sampling.mixtureSample(docs, col("doc_id"), col("source"), weights, "t")
    val bySrc = out.groupBy("source")
      .agg(count(lit(1)).as("n"), max("epoch").as("me"), min("epoch").as("mn"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(!bySrc.contains("src0"))                       // excluded
    assert(bySrc("src1") === ((200L, 2L, 1L)))            // exactly 2 epochs each
    assert(bySrc("src3") === ((100L, 1L, 1L)))            // exactly 1 epoch each
    val (n2, me2, _) = bySrc("src2")                      // 100 docs, w=1.5
    assert(me2 === 2L && n2 > 100L && n2 < 200L)          // some got the 2nd copy
    // deterministic: same inputs -> identical multiset
    val again = Sampling.mixtureSample(docs, col("doc_id"), col("source"), weights, "t")
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  // ------------------------------------------------------- length curriculum

  test("lengthCurriculum: buckets ordered by length, positions contiguous 1..size, deterministic") {
    val docs = (1L to 80L).map(i => (i, (i % 40) + 1)).toDF("id", "n")
    val out = Sampling.lengthCurriculum(docs, col("id"), col("n"), nBuckets = 4, salt = "s")
      .select("id", "n", "bucket", "pos")
      .as[(Long, Long, Int, Long)].collect().toSeq
    assert(out.size === 80)
    // monotone: any doc in a higher bucket is at least as long as any doc below
    val byBucket = out.groupBy(_._3).toSeq.sortBy(_._1)
    assert(byBucket.map(_._1) === Seq(1, 2, 3, 4))
    // cut-based buckets are strictly range-disjoint: bucket b holds values
    // in (c_{b-1}, c_b], so every doc below is strictly shorter than every
    // doc above (ties with a cut land in the lower bucket)
    byBucket.sliding(2).foreach {
      case Seq((_, lo), (_, hi)) =>
        assert(lo.map(_._2).max < hi.map(_._2).min)
      case _ =>
    }
    // positions are a contiguous 1..size permutation within each bucket
    byBucket.foreach { case (_, g) =>
      assert(g.map(_._4).sorted === (1L to g.size).toSeq)
    }
  }

  // ------------------------------------------------------------- winnowing

  test("winnowingFingerprints: shared run of >= w+k-1 tokens guarantees a shared fingerprint") {
    val shared = "alpha beta gamma delta epsilon zeta eta" // 7 tokens = w+k-1 for k=4,w=4
    val docs = Seq(
      (1L, s"one two $shared three four five six seven"),
      (2L, s"nine ten eleven twelve $shared thirteen"),
      (3L, "completely different words with nothing common here at all")
    ).toDF("doc_id", "text")
    val fps = Dedup.winnowingFingerprints(docs, col("text"), col("doc_id"), k = 4, w = 4)
      .as[(Long, Long)].collect().toSeq
    val f1 = fps.filter(_._1 == 1L).map(_._2).toSet
    val f2 = fps.filter(_._1 == 2L).map(_._2).toSet
    val f3 = fps.filter(_._1 == 3L).map(_._2).toSet
    assert((f1 & f2).nonEmpty, "docs sharing a 7-token run must share a fingerprint")
    assert((f1 & f3).isEmpty && (f2 & f3).isEmpty)
  }

  test("winnowingFingerprints: short doc (fewer grams than w) keeps its global min") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text") // 2 grams < w=4
    val fps = Dedup.winnowingFingerprints(docs, col("text"), col("doc_id"), k = 4, w = 4)
      .as[(Long, Long)].collect().toSeq
    assert(fps.size === 1) // exactly the min of the 2 gram hashes
  }

  // ------------------------------------------------------ sliding chunking

  test("slidingChunks: full coverage, overlap = size-stride, short doc -> one chunk") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tok: starts 0,3,6
      (2L, "a b c")                                   // short: one 3-token chunk
    ).toDF("doc_id", "text")
    val out = Packing.slidingChunks(docs, col("text"), col("doc_id"), size = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(out.filter(_._1 == 1L).map(_._3) === Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10")) // 1-token overlap
    assert(out.filter(_._1 == 2L) === Seq((2L, 0L, "a b c", 3L)))
    // every source token appears in some chunk (coverage)
    val covered = out.filter(_._1 == 1L).flatMap(_._3.split(" ")).toSet
    assert(covered === (1 to 10).map(i => s"t$i").toSet)
  }

  test("winnowingPairs: density ~2/(w+1) of grams, pairs require minShared") {
    val d = Tables.t(spark, sf, "documents")
    val nGrams = d.select(sum(greatest(size(split(col("text"), " ")) - 3, lit(0))))
      .as[Long].head()
    val nFps = Dedup.winnowingFingerprints(d, col("text"), col("doc_id"), k = 4, w = 4)
      .count()
    // winnowing keeps ~2/(w+1)=0.4 of grams; fixture dups push it lower.
    // sanity-bound the compression instead of pinning a constant
    assert(nFps < nGrams * 6 / 10 && nFps > nGrams / 10,
      s"fingerprint density out of range: $nFps of $nGrams grams")
  }

  // ------------------------------------------------- dup-ngram / vocab prune

  test("dupNgramFraction: repeated phrase counted, short docs 0, boundary exact") {
    val docs = Seq(
      (1L, "a b a b a"),     // bigrams: ab ba ab ba -> 2/4; trigrams: aba bab aba -> 1/3
      (2L, "x y z"),         // all distinct -> 0
      (3L, "q w"),           // shorter than n=3 -> 0
      (4L, "t t t t")        // bigrams: tt tt tt -> 2/3; trigrams: ttt ttt -> 1/2
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        TextAnalysis.dupNgramFraction(col("text"), 2).as("d2"),
        TextAnalysis.dupNgramFraction(col("text"), 3).as("d3"))
      .orderBy("doc_id").as[(Long, Double, Double)].collect().toSeq
    assert(out === Seq((1L, 0.5, 0.3333), (2L, 0.0, 0.0),
      (3L, 0.0, 0.0), (4L, 0.6667, 0.5)))
  }

  test("vocabPrune: rare terms -> <unk>, token order preserved, oov rate exact") {
    val docs = Seq(
      (1L, "cat dog cat rare1"),
      (2L, "cat dog"),
      (3L, "dog rare2 cat")
    ).toDF("doc_id", "text")
    // df: cat=3, dog=3, rare1=1, rare2=1; minDf=2 prunes the rares
    val out = Curate.vocabPrune(docs, col("doc_id"), col("text"), minDf = 2)
      .orderBy("doc_id").as[(Long, String, Double)].collect().toSeq
    assert(out === Seq(
      (1L, "cat dog cat <unk>", 0.25),
      (2L, "cat dog", 0.0),
      (3L, "dog <unk> cat", 0.3333)))
  }

  // ------------------------------------------------- property pins (driver-
  // side references replay the documented algorithm on random inputs)

  private def gen[T](g: org.scalacheck.Gen[T], seed: Long): T =
    g.apply(org.scalacheck.Gen.Parameters.default,
      org.scalacheck.rng.Seed(seed)).get

  /** Driver-side twin of Dedup.hash60/hash28: md5 hex prefix -> long. */
  private def md5PrefixLong(s: String, hexLen: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(hexLen), 16)
  }

  private val textGen = org.scalacheck.Gen.choose(1, 20).flatMap(n =>
    org.scalacheck.Gen.listOfN(n,
      org.scalacheck.Gen.oneOf("a", "b", "c", "d", "e", "f", "g")).map(_.mkString(" ")))

  test("property: winnowingFingerprints == driver-side window-min reference") {
    val k = 3; val w = 3
    (0 until 3).foreach { round =>
      val docs = gen(org.scalacheck.Gen.listOfN(30, textGen), 700L + round)
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val expected = docs.flatMap { case (id, t) =>
        val toks = t.split(" ")
        if (toks.length < k) Nil
        else {
          val grams = toks.sliding(k).map(g => md5PrefixLong(g.mkString(" "), 7)).toSeq
          val fps =
            if (grams.length >= w) grams.sliding(w).map(_.min).toSeq.distinct
            else Seq(grams.min)
          fps.map(fp => (id, fp))
        }
      }.toSet
      val got = Dedup.winnowingFingerprints(docs.toDF("doc_id", "text"),
        col("text"), col("doc_id"), k, w)
        .as[(Long, Long)].collect().toSet
      assert(got === expected, s"round $round")
    }
  }

  test("property: slidingChunks == driver-side sliding-window reference") {
    val size = 5; val stride = 3
    (0 until 3).foreach { round =>
      val docs = gen(org.scalacheck.Gen.listOfN(30, textGen), 800L + round)
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val expected = docs.flatMap { case (id, t) =>
        val toks = t.split(" ", -1)
        val nc = math.max(math.ceil((toks.length - size).toDouble / stride).toLong + 1, 1L)
        (0L until nc).map { i =>
          val chunk = toks.slice((i * stride).toInt, (i * stride).toInt + size)
          (id, i, chunk.mkString(" "), chunk.length.toLong)
        }
      }.toSet
      val got = Packing.slidingChunks(docs.toDF("doc_id", "text"),
        col("text"), col("doc_id"), size, stride)
        .as[(Long, Long, String, Long)].collect().toSet
      assert(got === expected, s"round $round")
    }
  }

  test("property: mixtureSample == driver-side floor+hash-band reference") {
    val weights = Seq("s0" -> 0.0, "s1" -> 0.75, "s2" -> 1.0, "s3" -> 2.25)
    val wmap = weights.toMap
    (0 until 3).foreach { round =>
      val docs = gen(org.scalacheck.Gen.listOfN(60,
        org.scalacheck.Gen.oneOf("s0", "s1", "s2", "s3")), 900L + round)
        .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val expected = docs.flatMap { case (id, src) =>
        val w = wmap(src)
        val frac = w - math.floor(w)
        val extra = if (md5PrefixLong(s"${id}mx", 15) % 1000000L <
          (frac * 1000000L).toLong) 1L else 0L
        val n = math.floor(w).toLong + extra
        (1L to n).map(e => (id, src, e))
      }.toSet
      val got = Sampling.mixtureSample(docs.toDF("doc_id", "source"),
        col("doc_id"), col("source"), weights, "mx")
        .select("doc_id", "source", "epoch")
        .as[(Long, String, Long)].collect().toSet
      assert(got === expected, s"round $round")
    }
  }

  test("property: tfidfTopTerms == driver-side tf/df/ln reference") {
    (0 until 3).foreach { round =>
      val docs = gen(org.scalacheck.Gen.listOfN(25, textGen), 1000L + round)
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val n = docs.size
      val tf = docs.flatMap { case (id, t) =>
        t.split(" ").groupBy(identity).map { case (term, g) => (id, term, g.length.toLong) }
      }
      val dfreq = tf.groupBy(_._2).map { case (term, g) => term -> g.size.toLong }
      def score(tfv: Long, dfv: Long): Double =
        BigDecimal(tfv * math.log(n.toDouble / dfv))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val expected = tf.groupBy(_._1).flatMap { case (id, terms) =>
        terms.map { case (_, term, tfv) => (term, tfv, dfreq(term), score(tfv, dfreq(term))) }
          .sortBy { case (term, _, _, sc) => (-sc, term) }
          .take(3).zipWithIndex
          .map { case ((term, tfv, dfv, sc), i) => (id, i + 1L, term, tfv, dfv, sc) }
      }.toSet
      val got = Curate.tfidfTopTerms(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), k = 3)
        .as[(Long, Long, String, Long, Long, Double)].collect().toSet
      assert(got === expected, s"round $round")
    }
  }

  // ------------------------------------------------------------------ bloom

  test("bloomBitset/bloomMightContain: no false negatives; planted non-members rejected") {
    val mBits = 1 << 17
    val members = (1 to 100).map(i => s"member-key-$i")
    val bits = Dedup.bloomBitset(members.toDF("k"), col("k"), mBits, kHash = 4)
    val probes = (members.map((_, true)) ++
      (1 to 50).map(i => (s"absent-key-$i", false))).toDF("k", "is_member")
    val wrong = probes
      .where(Dedup.bloomMightContain(bits, col("k"), mBits, 4) =!= col("is_member"))
      .collect()
    // members MUST pass (no false negatives); at 100 keys in 2^17 bits the
    // deterministic hash family happens to reject all 50 planted absentees
    assert(wrong.isEmpty, s"bloom disagreed on: ${wrong.mkString(", ")}")
  }

  test("bloomPassageHits: planted contamination counted, short docs clean") {
    def toks(prefix: String, a: Int, b: Int) = (a until b).map(i => s"$prefix$i").mkString(" ")
    val corpus = Seq(
      (1L, toks("c", 0, 20)),          // passages [c0..c9], [c10..c19]
      (2L, toks("d", 0, 10))           // passage [d0..d9]
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, toks("c", 0, 10) + " " + toks("x", 0, 10)), // shares [c0..c9]
      (11L, toks("y", 0, 25)),                          // 2 passages, clean
      (12L, "just three tokens"),                       // no passage surface
      (13L, toks("c", 10, 20) + " " + toks("d", 0, 10)) // shares both
    ).toDF("doc_id", "text")
    val got = Dedup.bloomPassageHits(batch, corpus, col("text"), col("doc_id"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (10L, 2L, 1L, 0L),
      (11L, 2L, 0L, 1L),
      (12L, 0L, 0L, 1L),
      (13L, 2L, 2L, 0L)))
  }

  // ------------------------------------------------------------- domain cap

  test("capPerGroup: equals the single-window answer under heavy skew") {
    val rnd = new scala.util.Random(7)
    // hot group with 400 rows + five 7-row groups; duplicate values so the
    // id tie-break is exercised
    val rows = (1 to 400).map(i => (s"hot", rnd.nextInt(40).toDouble, i.toLong)) ++
      (for (g <- 1 to 5; i <- 1 to 7)
        yield (s"g$g", rnd.nextInt(10).toDouble, (1000 + g * 100 + i).toLong))
    val df = rows.toDF("grp", "value", "id")
    val expected = rows.groupBy(_._1).flatMap { case (_, g) =>
      g.sortBy { case (_, v, id) => (-v, id) }.take(5).zipWithIndex
        .map { case ((grp, v, id), i) => (grp, v, id, i + 1L) }
    }.toSet
    for (salts <- Seq(1, 3, 8)) {
      val got = Curate.capPerGroup(df, col("grp"),
        Seq(desc("value"), col("id")), col("id"), n = 5, salts = salts)
        .select(col("grp"), col("value"), col("id"), col("rk"))
        .as[(String, Double, Long, Long)].collect().toSet
      assert(got === expected, s"salts=$salts")
    }
  }

  test("capPerGroup: groups smaller than n keep every row with correct ranks") {
    val df = Seq(("a", 3.0, 1L), ("a", 1.0, 2L), ("b", 9.0, 3L)).toDF("grp", "value", "id")
    val got = Curate.capPerGroup(df, col("grp"),
      Seq(desc("value"), col("id")), col("id"), n = 5, salts = 4)
      .select(col("grp"), col("id"), col("rk"))
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("a", 1L, 1L), ("a", 2L, 2L), ("b", 3L, 1L)))
  }

  // ------------------------------------------------------------------- BM25

  test("property: bm25TopTerms == driver-side Okapi reference") {
    val k1 = 1.2; val b = 0.75
    (0 until 3).foreach { round =>
      val docs = gen(org.scalacheck.Gen.listOfN(25, textGen), 900L + round)
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val n = docs.size
      val toks = docs.map { case (id, t) => (id, t.split(" ").toSeq) }
      val avgdl = toks.map(_._2.size).sum.toDouble / n
      val tf = toks.flatMap { case (id, ts) =>
        ts.groupBy(identity).map { case (term, g) =>
          (id, term, g.size.toLong, ts.size.toLong) }
      }
      val dfreq = tf.groupBy(_._2).map { case (term, g) => term -> g.size.toLong }
      def score(tfv: Long, dfv: Long, dl: Long): Double = {
        val idf = math.log(1.0 + (n - dfv + 0.5) / (dfv + 0.5))
        val raw = idf * tfv * (k1 + 1.0) / (tfv + k1 * (1.0 - b + b * dl / avgdl))
        BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val expected = tf.groupBy(_._1).flatMap { case (id, terms) =>
        terms.map { case (_, term, tfv, dl) =>
          (term, tfv, dfreq(term), dl, score(tfv, dfreq(term), dl)) }
          .sortBy { case (term, _, _, _, sc) => (-sc, term) }
          .take(3).zipWithIndex
          .map { case ((term, tfv, dfv, dl, sc), i) => (id, i + 1L, term, tfv, dfv, dl, sc) }
      }.toSet
      val got = Curate.bm25TopTerms(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), k = 3)
        .as[(Long, Long, String, Long, Long, Long, Double)].collect().toSet
      assert(got === expected, s"round $round")
    }
  }

  test("bm25Search: matched-term counts, score ordering, absent docs drop") {
    val docs = Seq((1L, "hash join hash probe"), (2L, "join side build"),
      (3L, "scan only text here")).toDF("doc_id", "text")
    val got = Curate.bm25Search(docs, col("doc_id"), col("text"),
      Seq("hash", "join"), k = 10)
      .as[(Long, Long, Double)].collect()
    assert(got.map(_._1).toSeq === Seq(1L, 2L)) // d3 matches nothing
    assert(got(0)._2 === 2L && got(1)._2 === 1L) // matched-term counts
    assert(got(0)._3 > got(1)._3) // two matched terms outscore one
  }

  // -------------------------------------------------------- latest snapshot

  test("latestSnapshot: max version wins, tieBreak decides equal versions, payload rides") {
    val df = Seq(
      (1L, "page", 10L, 100L, "v1"),
      (1L, "page", 30L, 101L, "v3"),   // winner: highest version
      (1L, "page", 30L, 99L, "stale"), // same version, lower tiebreak
      (1L, "api", 5L, 50L, "only"),
      (2L, "page", 7L, 70L, "solo")
    ).toDF("uid", "kind", "ver", "fetch_id", "body")
    val got = Dedup.latestSnapshot(df, keys = Seq("uid", "kind"),
      version = "ver", tieBreak = "fetch_id")
      .select("uid", "kind", "ver", "fetch_id", "body")
      .as[(Long, String, Long, Long, String)].collect().toSet
    assert(got === Set(
      (1L, "page", 30L, 101L, "v3"),
      (1L, "api", 5L, 50L, "only"),
      (2L, "page", 7L, 70L, "solo")))
  }

  // -------------------------------------------------------- weighted sample

  test("weightedSample: matches driver-side Efraimidis-Spirakis reference") {
    val rows = (1L to 200L).map(i => (i, 10L + (i * 7) % 90)) // weights 10..99
    val df = rows.toDF("id", "w")
    def priority(id: Long, w: Long): Double = {
      val u = (md5PrefixLong(id.toString, 15) + 1).toDouble / 1152921504606846976.0
      BigDecimal(-math.log(u) * 1000000.0 / w)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = rows.map { case (id, w) => (id, w, priority(id, w)) }
      .sortBy { case (id, _, p) => (p, id) }.take(20)
    val got = Sampling.weightedSample(df, col("id"), col("w"), n = 20)
      .orderBy("priority", "id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === expected)
    // higher weight must never hurt: doubling every weight halves priorities
    // monotonically, so the same hash draw keeps relative order
    val doubled = Sampling.weightedSample(
      df.withColumn("w", col("w") * 2), col("id"), col("w"), n = 20)
      .orderBy("priority", "id").select("id").as[Long].collect().toSeq
    assert(doubled === expected.map(_._1))
  }

  // ---------------------------------------- property pins, round-5 operators

  test("property: bloomPassageHits == driver-side exact passage containment") {
    val pk = 3
    (0 until 3).foreach { round =>
      val corpus = gen(org.scalacheck.Gen.listOfN(15, textGen), 1100L + round)
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val batch = gen(org.scalacheck.Gen.listOfN(15, textGen), 1200L + round)
        .zipWithIndex.map { case (t, i) => (100L + i, t) }
      def passages(t: String): Seq[String] =
        t.split(" ").grouped(pk).filter(_.length == pk).map(_.mkString(" ")).toSeq
      val corpusSet = corpus.flatMap(c => passages(c._2)).toSet
      val expected = batch.map { case (id, t) =>
        val ps = passages(t)
        val hits = ps.count(corpusSet.contains)
        (id, ps.size.toLong, hits.toLong, if (hits == 0) 1L else 0L)
      }.toSet
      val got = Dedup.bloomPassageHits(batch.toDF("doc_id", "text"),
        corpus.toDF("doc_id", "text"), col("text"), col("doc_id"), pk = pk)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === expected, s"round $round")
    }
  }

  test("property: latestSnapshot == driver-side (version, tiebreak) argmax") {
    (0 until 3).foreach { round =>
      val rnd = new scala.util.Random(1300 + round)
      val rows = (1 to 120).map(i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(3).toLong, rnd.nextInt(5).toLong,
          i.toLong, rnd.nextInt(100).toDouble))
      val expected = rows.groupBy(r => (r._1, r._2)).values.map(g =>
        g.maxBy(r => (r._3, r._4))).toSet
      val got = Dedup.latestSnapshot(
        rows.toDF("k1", "k2", "ver", "obs", "payload"),
        keys = Seq("k1", "k2"), version = "ver", tieBreak = "obs")
        .select("k1", "k2", "ver", "obs", "payload")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      assert(got === expected, s"round $round")
    }
  }

  test("property: scdIntervals == driver-side sorted-lead reference") {
    (0 until 3).foreach { round =>
      val rnd = new scala.util.Random(1400 + round)
      val rows = (1 to 100).map(i =>
        (rnd.nextInt(6).toLong, rnd.nextInt(40).toLong, i.toLong))
      val expected = rows.groupBy(_._1).values.flatMap { g =>
        val sorted = g.sortBy(r => (r._2, r._3))
        sorted.zipWithIndex.map { case ((k, v, id), i) =>
          val next = if (i + 1 < sorted.size) Some(sorted(i + 1)._2) else None
          (k, id, v, next, if (next.isEmpty) 1L else 0L)
        }
      }.toSet
      val got = Sessionize.scdIntervals(rows.toDF("k", "ver", "obs"),
        Seq(col("k")), col("ver"), col("obs"))
        .select("k", "obs", "valid_from", "valid_to", "is_current")
        .as[(Long, Long, Long, Option[Long], Long)].collect().toSet
      assert(got === expected, s"round $round")
    }
  }

  // -------------------------------------------------------- random projection

  test("randomProjection: equals the driver-side sign-matrix fold; JL distances sane") {
    val rnd = new scala.util.Random(11)
    val dim = 32; val out = 16
    val vecs = (1L to 40L).map(i =>
      (i, Array.fill(dim)(rnd.nextInt(255) - 127).map(_.toDouble)))
    def sign(k: Int, d: Int): Double =
      if (md5PrefixLong(s"${k}_$d", 7) % 2 == 0) 1.0 else -1.0
    def proj(v: Array[Double]): Array[Double] =
      Array.tabulate(out)(k => v.indices.map(d => sign(k, d) * v(d)).sum / 4.0)
    val expected = vecs.map { case (id, v) => (id, proj(v).toSeq) }.toSet
    val got = vecs.toDF("id", "v")
      .select(col("id"), Similarity.randomProjection(col("v"), out, dim).as("p"))
      .as[(Long, Seq[Double])].collect().toSet
    assert(got === expected)
    // JL sanity on this draw: projected pairwise distances within a loose
    // multiplicative band of the originals (no flake margin needed — data
    // and matrix are deterministic; measured [0.56, 1.51] on this seed)
    def dist(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum)
    val ratios = for {
      i <- vecs.indices; j <- (i + 1) until vecs.size
    } yield dist(proj(vecs(i)._2), proj(vecs(j)._2)) / dist(vecs(i)._2, vecs(j)._2)
    assert(ratios.forall(r => r > 0.3 && r < 2.0),
      f"distortion out of band: min=${ratios.min}%.3f max=${ratios.max}%.3f")
  }

  // ------------------------------------------------------------ expectations

  test("Expectations: row checks in one scan, uniqueness and RI counted exactly") {
    import Expectations.Check
    val rows = Seq(
      (1L, "ok", Some(5.0)),
      (2L, "ok", None),        // null value
      (2L, "bad", Some(-1.0)), // dup id + out-of-domain + negative
      (3L, "ok", Some(7.0))
    ).toDF("id", "kind", "v")
    val ref = Seq(1L, 2L).toDF("pk") // id 3 violates RI
    val got = Expectations.report(
      Expectations.rowChecks(rows, Seq(
        Check("v_not_null", col("v").isNull),
        Check("kind_in_domain", !col("kind").isin("ok")),
        Check("v_nonnegative", col("v") < 0))),
      Expectations.uniqueCheck(rows, "id_unique", col("id")),
      Expectations.refIntegrityCheck(rows, "fk_valid", col("id"), ref, col("pk")))
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(
      ("v_not_null", 1L, 0L),
      ("kind_in_domain", 1L, 0L),
      ("v_nonnegative", 1L, 0L),
      ("id_unique", 1L, 0L),   // one offending KEY (id=2), not two rows
      ("fk_valid", 1L, 0L)))
    // a clean table passes everything
    val clean = Expectations.rowChecks(rows.where(col("id") === 1L),
      Seq(Check("v_not_null", col("v").isNull)))
      .as[(String, Long, Long)].collect().toSeq
    assert(clean === Seq(("v_not_null", 0L, 1L)))
  }
}
