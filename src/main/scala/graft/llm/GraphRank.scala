package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-centrality weighting over the near-duplicate similarity graph:
  * fixed-iteration PageRank (Page et al. 1999, the power-iteration form every
  * web-scale corpus pipeline runs), used to pick the most *central* document
  * of each duplicate cluster as its canonical representative — a
  * quality-aware alternative to min-id survivorship: the doc most similar to
  * the rest of its cluster is the least likely to be the truncated/mangled
  * copy.
  *
  * Determinism across engines: ranks are carried as integer MICRO-units
  * (`BIGINT`), every step is integer arithmetic (`div`-division, exact sums
  * of longs), so DuckDB replays the identical values with `//` — no float
  * summation order to disagree on. Damping 0.85 is the literal
  * `(85 * x) div 100`; the teleport base is `150000 div n`.
  *
  * Scale shape (100 TB corpus, |E| ≈ verified near-dup pairs): the classic
  * Pregel cost model — per iteration one join of the rank table (|V| rows,
  * narrow) against the edge table on `src` plus one aggregation shuffled on
  * `dst`. With edges bucketed by `src` and ranks co-partitioned the join is
  * shuffle-free; the rank table never exceeds one row per graph node, so
  * iterations cost O(|E|) with a fixed small constant. Iteration count is
  * FIXED (default 4), the standard practice for rank-as-a-feature: power
  * iteration's residual decays by the damping factor per round, and a
  * survivorship signal needs stable ordering, not convergence to 1e-9.
  * Lineage: edges+degrees are checkpointed once (reused every round); the
  * per-round rank plan composes 4 joins, shallow enough to leave to Catalyst
  * (for larger `iters`, checkpoint every few rounds like
  * [[Dedup.connectedComponentsFast]]).
  *
  * Symmetrized graph = every node has degree >= 1 and in-degree = out-degree,
  * so there are no dangling nodes and the contribution aggregation reaches
  * every node each round (no left-join backfill needed).
  */
object GraphRank {

  /** The symmetrized, degree-annotated edge table (src, dst, deg) of an
    * a<b pair table — the shared graph prep every operator here consumes.
    * Callers that run SEVERAL graph operators per session should build
    * this once into a mart (LlmQueries.symGraphEdges) and pass it to the
    * `*OnGraph` variants; the pair-table entry points below remain the
    * self-contained spelling. */
  def symmetrize(pairs: DataFrame, aCol: String = "doc_id_a",
      bCol: String = "doc_id_b"): DataFrame = {
    val edges = pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    edges.join(deg, "src")
  }

  /** Node set of a [[symmetrize]]d edge table. */
  def nodesOf(edgesDeg: DataFrame): DataFrame =
    edgesDeg.select(col("src").as("doc_id")).distinct()

  /** Undirected (doc_id, deg) degree table of a [[symmetrize]]d edge
    * table — the symmetrized out-degree IS the undirected degree. */
  def degreesOf(edgesDeg: DataFrame): DataFrame =
    edgesDeg.select(col("src").as("doc_id"), col("deg")).distinct()

  /** Shared graph prep for the self-contained rank entry points:
    * [[symmetrize]] and checkpoint (stats-free) the edge table and the
    * node set — both re-read every iteration. */
  private def checkpointedGraph(pairs: DataFrame, aCol: String,
      bCol: String): (DataFrame, DataFrame) = {
    // Stats-free on purpose: see the connectedComponents scaladoc for why
    // localCheckpoint's carried stats are poison on re-referenced plans.
    val edgesDeg = org.apache.spark.sql.GraftSqlBridge.localCheckpointNoStats(
      symmetrize(pairs, aCol, bCol))
    val nodes = org.apache.spark.sql.GraftSqlBridge.localCheckpointNoStats(
      nodesOf(edgesDeg))
    (edgesDeg, nodes)
  }

  /** Integer-micro PageRank over an undirected pair graph.
    *
    * @param pairs one row per undirected edge, endpoints `aCol` < `bCol`
    *              distinct (the near-dup pair-table contract)
    * @return (doc_id, rank_micros) — rank mass in integer micros; total mass
    *         ~= 1e6 (floor-division rounding loses at most one micro per
    *         node per round)
    */
  def pageRank(pairs: DataFrame, aCol: String = "doc_id_a",
      bCol: String = "doc_id_b", iters: Int = 4): DataFrame = {
    val (edgesDeg, nodes) = checkpointedGraph(pairs, aCol, bCol)
    pageRankOnGraph(edgesDeg, nodes, iters)
  }

  /** [[pageRank]] over a PREBUILT (materialized) symmetrized graph — the
    * mart path: one graph prep per session feeds every rank variant and
    * the triangle tiers' degree reads. `edgesDeg`/`nodes` must be
    * plan-stable (checkpointed or persisted) — they are re-read every
    * iteration. */
  def pageRankOnGraph(edgesDeg: DataFrame, nodes: DataFrame,
      iters: Int = 4): DataFrame = {
    // Broadcast scalar |V| — the house pattern for plan-side constants.
    val n = broadcast(nodes.agg(count(lit(1)).as("n")))

    var ranks = nodes.crossJoin(n)
      .select(col("doc_id"), expr("1000000 div n").as("rank_micros"))
    for (_ <- 1 to iters) {
      val contrib = ranks
        .join(edgesDeg, ranks("doc_id") === edgesDeg("src"))
        .select(col("dst").as("doc_id"),
          expr("rank_micros div deg").as("c"))
      ranks = contrib.groupBy("doc_id").agg(sum("c").as("cs"))
        .crossJoin(n)
        .select(col("doc_id"),
          expr("150000 div n + (85 * cs) div 100").as("rank_micros"))
    }
    ranks
  }

  /** Personalized PageRank from a seed document: the teleport mass lands
    * entirely on `seedId` instead of uniformly, so rank measures
    * graph-diffusion PROXIMITY to the seed — the standard random-walk
    * "related documents" primitive (graph-based retrieval over the
    * similarity graph). Same integer-micro recurrence and per-iteration
    * cost as [[pageRank]]; the only change is the teleport term:
    * `r0 = 1e6·[v = seed]`, `r' = 150000·[v = seed] + (85·Σ in) div 100`.
    * Nodes the walk hasn't reached carry rank 0 (kept, so the output is
    * total over the graph's nodes and the zero/nonzero split is visible). */
  def personalizedPageRank(pairs: DataFrame, seedId: Long,
      aCol: String = "doc_id_a", bCol: String = "doc_id_b",
      iters: Int = 4): DataFrame = {
    val (edgesDeg, nodes) = checkpointedGraph(pairs, aCol, bCol)
    personalizedPageRankOnGraph(edgesDeg, nodes, seedId, iters)
  }

  /** The WEIGHTED symmetrized graph: (src, dst, w, sw) where `w` is the
    * integer-micro edge weight (the pair mart's verified similarity) and
    * `sw` the source's total outgoing weight — the weighted analog of
    * [[symmetrize]]'s degree annotation. */
  def symmetrizeWeighted(pairs: DataFrame, aCol: String = "doc_id_a",
      bCol: String = "doc_id_b", wCol: String = "w"): DataFrame = {
    val edges = pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"), col(wCol).as("w"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst"),
        col(wCol).as("w")))
    val sw = edges.groupBy("src").agg(sum("w").as("sw"))
    edges.join(sw, "src")
  }

  /** Similarity-weighted PageRank: each node splits its rank among its
    * neighbors PROPORTIONALLY to the verified edge similarity instead of
    * uniformly — `c(u→v) = (r(u) · w(u,v)) div sw(u)` — so centrality
    * prefers the CLOSEST cluster-mates: the doc most similar to its
    * cluster outranks one hanging off the cluster by a borderline edge,
    * even at equal degree. Same integer-micro discipline as [[pageRank]]
    * (weights ≤ 1e6 and ranks ≤ 1e6, so the product stays ≤ 1e12 — exact
    * in a long), same per-iteration join/agg cost shape; the uniform
    * variant is exactly this recurrence with all weights equal. */
  def weightedPageRankOnGraph(edgesW: DataFrame, nodes: DataFrame,
      iters: Int = 4): DataFrame = {
    val n = broadcast(nodes.agg(count(lit(1)).as("n")))
    var ranks = nodes.crossJoin(n)
      .select(col("doc_id"), expr("1000000 div n").as("rank_micros"))
    for (_ <- 1 to iters) {
      val contrib = ranks
        .join(edgesW, ranks("doc_id") === edgesW("src"))
        .select(col("dst").as("doc_id"),
          expr("(rank_micros * w) div sw").as("c"))
      ranks = contrib.groupBy("doc_id").agg(sum("c").as("cs"))
        .crossJoin(n)
        .select(col("doc_id"),
          expr("150000 div n + (85 * cs) div 100").as("rank_micros"))
    }
    ranks
  }

  /** Self-contained [[weightedPageRankOnGraph]] over an a<b pair table
    * carrying an integer-micro weight column. */
  def weightedPageRank(pairs: DataFrame, aCol: String = "doc_id_a",
      bCol: String = "doc_id_b", wCol: String = "w",
      iters: Int = 4): DataFrame = {
    val edgesW = org.apache.spark.sql.GraftSqlBridge.localCheckpointNoStats(
      symmetrizeWeighted(pairs, aCol, bCol, wCol))
    val nodes = org.apache.spark.sql.GraftSqlBridge.localCheckpointNoStats(
      nodesOf(edgesW))
    weightedPageRankOnGraph(edgesW, nodes, iters)
  }

  /** [[personalizedPageRank]] over a PREBUILT symmetrized graph (the mart
    * path — see [[pageRankOnGraph]]). */
  def personalizedPageRankOnGraph(edgesDeg: DataFrame, nodes: DataFrame,
      seedId: Long, iters: Int = 4): DataFrame = {
    val seedMass = (id: Long, m: Long) =>
      when(col("doc_id") === id, lit(m)).otherwise(lit(0L))

    var ranks = nodes.select(col("doc_id"),
      seedMass(seedId, 1000000L).as("rank_micros"))
    for (_ <- 1 to iters) {
      val contrib = ranks
        .join(edgesDeg, ranks("doc_id") === edgesDeg("src"))
        .select(col("dst").as("doc_id"),
          expr("rank_micros div deg").as("c"))
      // left join: unlike the uniform variant, unreached nodes get no
      // contribution rows — they stay at rank 0, not dropped
      ranks = nodes
        .join(contrib.groupBy("doc_id").agg(sum("c").as("cs")), Seq("doc_id"),
          "left")
        .select(col("doc_id"),
          (seedMass(seedId, 150000L) +
            expr("(85 * coalesce(cs, 0)) div 100")).as("rank_micros"))
    }
    ranks
  }

  /** Per-node triangle counts + local clustering coefficient over the
    * undirected pair graph — the density signal that separates a CLIQUE of
    * mutual near-duplicates (template spam, mirrored boilerplate: coefficient
    * ~1) from a CHAIN of drifting revisions (coefficient ~0) even when
    * cluster sizes are identical.
    *
    * Algorithm: the ordered-wedge method (the standard distributed triangle
    * count — Suri & Vassilvitskii, WWW'11 "Counting triangles and the curse
    * of the last reducer"). Pairs are kept in canonical a<b orientation, so
    * each triangle a<b<c is found EXACTLY once as wedge (a<b) + (b<c) closed
    * by edge (a<c): two equi-joins, no orientation dedup, no double count.
    * Per-node counts then credit each triangle to its 3 corners.
    *
    * Scale shape: wedge join shuffles pairs on the middle vertex; closure is
    * an equi-join back on the (a, c) key; per-corner credit is one union +
    * keyed agg. Skewed high-degree middles are the classic hazard ("the
    * last reducer") — [[triangleStatsDegreeOrdered]] is the production
    * tier that bounds it; this id-ordered spelling is the simple tier the
    * shared oracle pins both against. Coefficient is integer micros:
    * (2e6 · triangles) div (deg · (deg−1)), deg>=2 guarded.
    */
  def triangleStats(pairs: DataFrame, aCol: String = "doc_id_a",
      bCol: String = "doc_id_b",
      degrees: Option[DataFrame] = None): DataFrame = {
    val e = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
    // wedges a<b<c closed by (a, c): each triangle once
    val tri = e.as("ab")
      .join(e.as("bc"), col("ab.b") === col("bc.a"))
      .join(e.as("ac"),
        col("ac.a") === col("ab.a") && col("ac.b") === col("bc.b"))
      .select(col("ab.a").as("x"), col("ab.b").as("y"), col("bc.b").as("z"))
    triangleFinish(degrees.getOrElse(pairDegrees(e)), tri)
  }

  /** [[triangleStats]] with DEGREE-ORDERED orientation — the actual "last
    * reducer" mitigation, implemented rather than footnoted: every edge is
    * re-oriented from its lower-(degree, id) endpoint to the higher, and
    * wedges fan out ONLY from the smaller endpoint. In the oriented DAG the
    * out-degree of any node is O(√|E|) (a node keeps an out-edge only
    * toward neighbors of no smaller degree, and fewer than √(2|E|) nodes
    * have degree ≥ √(2|E|)), so the wedge join's per-key fan-out — the
    * quadratic term a degree-10^6 spam hub would otherwise contribute — is
    * bounded regardless of skew. Each triangle is still found exactly once:
    * its minimum-(degree, id) corner is the unique corner with both
    * out-edges, and the closing edge carries exactly one orientation.
    * Output is IDENTICAL to [[triangleStats]] by construction — q167 pins
    * it on q165's oracle (two implementations, one ground truth). */
  def triangleStatsDegreeOrdered(pairs: DataFrame, aCol: String = "doc_id_a",
      bCol: String = "doc_id_b",
      degrees: Option[DataFrame] = None): DataFrame = {
    val e = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
    val degFrame = degrees.getOrElse(pairDegrees(e))
    val deg = degFrame.select(col("doc_id").as("v"), col("deg").as("d"))
    val withDegs = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    // keep the dst's degree on the oriented edge: the wedge join below uses
    // the SAME (deg, id) order to emit each dst pair once, already in the
    // closing edge's orientation — half the wedges, and the closure is a
    // pure existence join
    val o = withDegs.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"),
      when(aFirst, col("db")).otherwise(col("da")).as("dd"))
    val tri = o.as("ab")
      .join(o.as("ac"),
        col("ab.src") === col("ac.src") &&
          (col("ab.dd") < col("ac.dd") ||
            (col("ab.dd") === col("ac.dd") && col("ab.dst") < col("ac.dst"))))
      .join(o.as("bc"),
        col("bc.src") === col("ab.dst") && col("bc.dst") === col("ac.dst"))
      .select(col("ab.src").as("x"), col("ab.dst").as("y"),
        col("ac.dst").as("z"))
    triangleFinish(degFrame, tri)
  }

  /** Undirected (doc_id, deg) degrees straight from an (a, b) pair frame —
    * the self-contained fallback when no [[degreesOf]] mart is passed. */
  private def pairDegrees(e: DataFrame): DataFrame =
    e.select(col("a").as("doc_id"))
      .unionByName(e.select(col("b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("deg"))

  /** Shared finisher: credit each triangle to its 3 corners, join the
    * (doc_id, deg) degree table, emit the integer-micro clustering
    * coefficient. */
  private def triangleFinish(deg: DataFrame, tri: DataFrame): DataFrame = {
    val perNode = tri.select(col("x").as("doc_id"))
      .unionByName(tri.select(col("y").as("doc_id")))
      .unionByName(tri.select(col("z").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("doc_id"), "left")
      .select(col("doc_id"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("clustering_micros",
        when(col("deg") >= 2,
          expr("(2000000 * n_triangles) div (deg * (deg - 1))"))
          .otherwise(lit(0L)))
  }

  /** Canonical representative per duplicate cluster by MAX centrality
    * (ties -> min doc_id): joins a cluster label table (doc_id, cluster_id)
    * with [[pageRank]] output and keeps the top-ranked member. One window
    * over the cluster key — co-partitioned with any cluster-keyed layout. */
  def centralRepresentatives(labels: DataFrame, ranks: DataFrame): DataFrame =
    centralRepsFromMart(labels.select("doc_id", "cluster_id")
      .join(ranks, Seq("doc_id")))

  /** [[centralRepresentatives]] over an already-joined
    * (doc_id, cluster_id, rank_micros) mart — one window, no join. */
  def centralRepsFromMart(mart: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("cluster_id")
    mart
      .withColumn("rn", row_number().over(
        w.orderBy(col("rank_micros").desc, col("doc_id").asc)))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("rep_doc_id"),
        col("rank_micros"), col("cluster_size"))
  }
}
