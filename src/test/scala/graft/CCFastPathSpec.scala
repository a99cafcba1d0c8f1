package graft

import org.apache.spark.sql.functions._

/** Equality pin for [[Dedup.connectedComponents]]' r13 small-graph
  * fast path: the driver union-find must produce exactly the iterative
  * min-label loop's fixpoint — same endpoint set, same comp = min
  * reachable id — on star, chain, cycle, and fixture-derived graphs.
  * The threshold conf (spark.graft.cc.localEdgeLimit) switches paths,
  * so the pin drives BOTH implementations explicitly. */
class CCFastPathSpec extends SparkSpec {
  import spark.implicits._

  private def both(edges: org.apache.spark.sql.DataFrame)
      : (Seq[(Long, Long)], Seq[(Long, Long)]) = {
    val key = "spark.graft.cc.localEdgeLimit"
    val prev = spark.conf.getOption(key)
    def run(): Seq[(Long, Long)] =
      rows(Dedup.connectedComponents(edges).orderBy("id"))
        .map(r => (r.getLong(0), r.getLong(1)))
    spark.conf.set(key, "1000000")
    val local = run()
    spark.conf.set(key, "0") // force the distributed loop
    val dist = try run() finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    (local, dist)
  }

  test("local union-find == distributed min-label loop (star, chain, cycle, merge)") {
    val edges = Seq(
      // star rooted above its min (root 5, leaves incl. 1: comp must be 1)
      (5L, 7L), (5L, 9L), (5L, 1L),
      // chain 10-11-12-13 (diameter > 1: pointer-jumping territory)
      (10L, 11L), (11L, 12L), (12L, 13L),
      // cycle 20-21-22-20
      (20L, 21L), (21L, 22L), (22L, 20L),
      // two stars merged by a bridge (30..33 + 40..43, bridge 33-40)
      (30L, 31L), (30L, 32L), (30L, 33L), (40L, 41L), (40L, 42L),
      (40L, 43L), (33L, 40L),
      // duplicate + reversed edges (must be inert)
      (5L, 7L), (7L, 5L)
    ).toDF("id_a", "id_b")
    val (local, dist) = both(edges)
    assert(local === dist)
    // spot semantics: the 5-star labels to 1, the bridge merges to 30
    val m = local.toMap
    assert(m(5L) == 1L && m(9L) == 1L && m(43L) == 30L && m(22L) == 20L)
  }

  test("local union-find == distributed loop on fixture star edges") {
    val docs = Tables.t(spark, sf, "documents")
    val edges = Dedup.minhashStarEdges(docs, col("text"), col("doc_id"),
      shingleSize = 3, numPerm = 16, bands = 4)
    val (local, dist) = both(edges)
    assert(local === dist)
    assert(local.nonEmpty)
  }

  test("empty edge list -> empty labels on both paths") {
    val edges = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val (local, dist) = both(edges)
    assert(local.isEmpty && dist.isEmpty)
  }
}
