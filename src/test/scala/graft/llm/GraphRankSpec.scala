package graft.llm

import graft.SparkSpec

/** Integer-micro PageRank: exact agreement with an in-test reference
  * implementation of the same integer recurrence, structural properties
  * (star center ranks highest, mass conservation), and the
  * max-rank/min-id survivorship rule of centralRepresentatives. */
class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  /** In-test reference: the SAME integer recurrence, driver-side. */
  private def refRanks(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = deg.keySet
    val n = nodes.size.toLong
    var r = nodes.map(_ -> 1000000L / n).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (src, _) => r(src) / deg(src) }.sum).toMap
      r = nodes.map(v => v -> (150000L / n + 85L * in(v) / 100L)).toMap
    }
    r
  }

  private def sparkRanks(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    GraphRank.pageRank(pairs.toDF("doc_id_a", "doc_id_b")).collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap

  test("path graph matches the reference integer recurrence exactly") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(sparkRanks(pairs) === refRanks(pairs, 4))
  }

  test("star graph: center ranks highest, leaves tie, mass ~conserved") {
    val pairs = (1L to 6L).map(l => (0L, l))
    val r = sparkRanks(pairs)
    assert(r === refRanks(pairs, 4))
    assert((1L to 6L).forall(l => r(0L) > r(l)))
    assert((1L to 6L).map(r).distinct.size === 1)
    // floor division loses < 1 micro per node per step
    val total = r.values.sum
    assert(total <= 1000000L && total > 1000000L - 10L * r.size)
  }

  test("two components rank independently (no cross-component mass)") {
    val pairs = Seq((1L, 2L), (10L, 11L), (11L, 12L), (10L, 12L))
    val r = sparkRanks(pairs)
    assert(r === refRanks(pairs, 4))
    assert(r.keySet === Set(1L, 2L, 10L, 11L, 12L))
  }

  /** In-test reference for the personalized variant. */
  private def refPpr(pairs: Seq[(Long, Long)], seed: Long,
      iters: Int): Map[Long, Long] = {
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = deg.keySet
    var r = nodes.map(v => v -> (if (v == seed) 1000000L else 0L)).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (src, _) => r(src) / deg(src) }.sum).toMap
      r = nodes.map(v =>
        v -> ((if (v == seed) 150000L else 0L) + 85L * in.getOrElse(v, 0L) / 100L)).toMap
    }
    r
  }

  test("personalized: matches reference; mass decays with graph distance") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val got = GraphRank.personalizedPageRank(
      pairs.toDF("doc_id_a", "doc_id_b"), 1L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === refPpr(pairs, 1L, 4))
    // the seed dominates (non-lazy walks oscillate by parity along a path,
    // so no strict per-hop monotonicity claim); beyond the 4-hop horizon = 0
    assert(got.values.max === got(1L))
    assert(got(6L) === 0L)      // 5 hops from the seed, walk length 4
    assert(got(5L) > 0L)        // exactly 4 hops: reached on the last round
  }

  test("personalized: seed outside the graph yields all-zero ranks") {
    val pairs = Seq((1L, 2L))
    val got = GraphRank.personalizedPageRank(
      pairs.toDF("doc_id_a", "doc_id_b"), 99L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L))
  }

  private def triStats(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] =
    GraphRank.triangleStats(pairs.toDF("doc_id_a", "doc_id_b")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("triangleStats: clique vs chain at equal size") {
    // triangle: every node deg 2, 1 triangle, coefficient 1.0 (1e6 micros)
    val tri = triStats(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    assert(tri === Map(
      1L -> ((2L, 1L, 1000000L)), 2L -> ((2L, 1L, 1000000L)),
      3L -> ((2L, 1L, 1000000L))))
    // 3-chain: same 3 nodes, zero triangles, middle coefficient 0
    val chain = triStats(Seq((1L, 2L), (2L, 3L)))
    assert(chain(2L) === ((2L, 0L, 0L)))
    assert(chain(1L) === ((1L, 0L, 0L)))
  }

  test("triangleStats: K4 counts each triangle once per corner; open wedge partial") {
    val k4 = triStats(Seq((1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 3L), (2L, 4L), (3L, 4L)))
    // K4: 4 triangles total, each node in 3 of them, deg 3, coeff 1.0
    assert(k4.values.forall(_ === ((3L, 3L, 1000000L))))
    // triangle + pendant: node 1 deg 3, still only 1 triangle ->
    // coefficient 2e6*1/(3*2) = 333333 (floor)
    val pend = triStats(Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)))
    assert(pend(1L) === ((3L, 1L, 333333L)))
    assert(pend(4L) === ((1L, 0L, 0L)))
  }

  test("degree-ordered triangles == id-ordered triangles on mixed topologies") {
    // K4 + pendant + triangle-with-tail + disconnected chain + a hub whose
    // degree dominates (the orientation actually reorders its edges)
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), // K4
      (4L, 5L),                                                   // pendant
      (10L, 11L), (11L, 12L), (10L, 12L), (12L, 13L),             // tri+tail
      (20L, 21L), (21L, 22L),                                     // chain
      (30L, 31L), (30L, 32L), (30L, 33L), (30L, 34L), (31L, 32L)) // hub
    val df = pairs.toDF("doc_id_a", "doc_id_b")
    val simple = GraphRank.triangleStats(df).orderBy("doc_id").collect().toSeq
    val ordered = GraphRank.triangleStatsDegreeOrdered(df)
      .orderBy("doc_id").collect().toSeq
    assert(ordered === simple)
    // and the hub's triangle is found despite every hub edge re-orienting
    val hub = ordered.find(_.getLong(0) == 30L).get
    assert(hub.getLong(2) === 1L)
  }

  test("weighted PageRank: equal weights reduce to uniform exactly; skew prefers the closer mate") {
    // floor((r·w)/(deg·w)) == floor(r/deg) for any positive w, so the
    // equal-weight run must be BIT-identical to the uniform tier
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L))
    val uniform = sparkRanks(pairs)
    val equalW = GraphRank.weightedPageRank(
      pairs.toDF("doc_id_a", "doc_id_b")
        .withColumn("w", org.apache.spark.sql.functions.lit(800000L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(equalW === uniform)

    // a path 1-2-3 with a strong 1-2 edge and a borderline 2-3 edge: node
    // 1 receives most of 2's mass, so it outranks 3 (at equal degree the
    // uniform tier would tie them)
    val skew = Seq((1L, 2L, 990000L), (2L, 3L, 800000L))
      .toDF("doc_id_a", "doc_id_b", "w")
    val r = GraphRank.weightedPageRank(skew).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) > r(3L),
      s"weighted rank did not prefer the high-similarity mate: $r")
    val tied = sparkRanks(Seq((1L, 2L), (2L, 3L)))
    assert(tied(1L) === tied(3L), "uniform tier should tie the endpoints")
  }

  test("centralRepresentatives: max rank wins, ties break to min doc_id") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (9L, 7L))
      .toDF("doc_id", "cluster_id")
    val ranks = Seq((1L, 50L), (2L, 90L), (3L, 90L), (7L, 10L), (9L, 10L))
      .toDF("doc_id", "rank_micros")
    val out = GraphRank.centralRepresentatives(labels, ranks)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((2L, 90L, 3L)))   // 2 beats 3 on doc_id at equal rank
    assert(out(7L) === ((7L, 10L, 2L)))
  }
}
