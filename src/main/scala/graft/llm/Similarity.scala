package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Two paths, mirroring what a 100 TB vector pipeline needs:
  *   - brute-force cosine top-k: one narrow map + TakeOrderedAndProject.
  *     Correctness baseline, O(N) per query — fine for one query, wrong as
  *     the inner loop of N x N.
  *   - multi-probe LSH (random hyperplanes, T tables x R planes): vectors
  *     shuffle once on (table, bucket); queries touch only their buckets.
  *     This is the scale path — candidate counts are governed by bucket
  *     occupancy, not corpus size.
  *
  * Dot products use `zip_with` + `aggregate` (a strict left fold), which is
  * bit-identical to DuckDB's `list_dot_product` over DOUBLE[] — verified —
  * so cosine scores hash-match the oracle exactly.
  */
object Similarity {

  /** Hyperplane LSH geometry: T tables x R planes over DIM dims. Weights are
    * 3-decimal rationals from a fixed seed: exactly representable in the
    * generated DuckDB SQL literals.
    *
    * R sizes the bucket space (2^R per table) and must scale with the corpus:
    * R ~ log2(N / target_bucket_size), else candidate density degenerates
    * toward all-pairs (R=4 at N=2000 measured 41% of all pairs as
    * candidates; R=6 bounds buckets at ~N/64). T trades recall for work:
    * P(candidate) = 1-(1-(1-theta/pi)^R)^T ~ 0.5 at cosine 0.5 with T=8,
    * R=6. At 100 TB, R grows with log(N) and the (table, bucket) key is the
    * partition key. */
  val Dim = 64
  val Tables = 8
  val PlanesPerTable = 6

  /** Plane weights for any (tables × planesPerTable) geometry, from the
    * fixed seed — `planesFor(Tables, PlanesPerTable)` reproduces [[planes]]
    * exactly, so the default geometry (and its generated oracle SQL) is
    * unchanged while callers can grow R with the corpus: the sf0.1→sf1
    * measurement (SCALE.md) showed candidate pairs ~100× at fixed R for 10×
    * vectors; R ≈ log2(N / target_bucket_size) is the deployment rule. */
  def planesFor(tables: Int, planesPerTable: Int): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(7)
    Seq.fill(tables * planesPerTable)(
      Seq.fill(Dim)((rng.nextInt(2001) - 1000) / 1000.0))
  }

  val planes: Seq[Seq[Double]] = planesFor(Tables, PlanesPerTable)

  /** The deployment rule for R: R = max(default, ceil(log2(N / 32))) keeps
    * expected bucket occupancy ~32 as the corpus grows. Resolves to the
    * default (= the generated oracle geometry) for every N <= 2048; the sf1
    * run measured the fixed-R alternative at ~100× candidate growth for
    * 10× vectors. */
  def adaptiveR(n: Long): Int =
    math.max(PlanesPerTable,
      math.ceil(math.log(n / 32.0) / math.log(2.0)).toInt)

  /** The same deployment rule for the IVF cell directory: nlist =
    * max(16, ⌈N/128⌉) holds expected cell occupancy ~128 as the corpus
    * grows — [[semDedup]]'s within-cell pair space is occupancy² × cells,
    * so fixed nlist degenerates quadratically exactly like fixed R did for
    * LSH (q57 measured 6.4× wall for 10× vectors at nlist=16). Resolves to
    * 16 (= the generated oracle geometry) for every N ≤ 2048. */
  def adaptiveNlist(n: Long): Int = {
    val nlist = (n + 127) / 128
    // Geometry guard for the one-row directory fold (centsAsRow /
    // NearestCells): the whole cell directory lives in a single broadcast
    // InternalRow, so nlist × (dim + struct overhead) must stay far under
    // the 2³¹ single-row array-element limit AND broadcast-sized. 2²⁴
    // cells ≈ 16.8M × (8-dim cent + cell + cn) ≈ 1.3 GB is the practical
    // broadcast ceiling — at occupancy 128 that is a 2×10⁹-vector corpus;
    // past it, shard the directory (coarse-quantize hierarchically)
    // rather than silently overflowing the fold.
    require(nlist <= (1L << 24),
      s"adaptiveNlist($n) = $nlist exceeds the one-row cell-directory " +
        "bound (2^24 cells): the broadcast directory fold would not fit " +
        "a single InternalRow/broadcast — shard the directory instead")
    math.max(16, nlist.toInt)
  }

  /** Strict left-fold dot product of two vector columns, elementwise-cast to
    * double. Backed by the codegen'd native expression (graft.expr.DotProduct)
    * — the HOF formulation `aggregate(zip_with(...))` computes the identical
    * value but runs interpreted, which dominated the near-dup verify. */
  def dot(a: Column, b: Column): Column = graft.expr.DotProduct(a, b)

  /** Dot product against a constant plane (literal array). */
  def dotPlane(v: Column, plane: Seq[Double]): Column =
    dot(v, array(plane.map(lit): _*))

  /** cosine(a, b) = dot / (sqrt(|a|^2) * sqrt(|b|^2)). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Per-table LSH bucket ids: bucket_t = sum over planes of sign bits. */
  def buckets(v: Column): Column = bucketsWith(v, Tables, PlanesPerTable)

  /** [[buckets]] for an explicit geometry (see [[planesFor]]). */
  def bucketsWith(v: Column, tables: Int, planesPerTable: Int): Column = {
    val pl = if (tables == Tables && planesPerTable == PlanesPerTable) planes
             else planesFor(tables, planesPerTable)
    array((0 until tables).map { t =>
      (0 until planesPerTable).map { p =>
        when(dotPlane(v, pl(t * planesPerTable + p)) > 0, lit(1L << p))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
  }

  /** Brute-force cosine top-k against the embedding of `queryId`. The 1-row
    * query side is broadcast; the scan side is a narrow map; ORDER BY+LIMIT
    * plans as TakeOrderedAndProject (no global sort). */
  def bruteTopK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = broadcast(
      embeddings.filter(col("vec_id") === queryId)
        .select(col("embedding").as("q_emb")))
    // corpus side spread (Tables.spread): the per-vector cosine is the whole
    // cost and runs upstream of TakeOrderedAndProject's local top-k; the
    // query side stays on the raw frame so its vec_id filter pushes to the
    // scan
    graft.Tables.spread(embeddings).crossJoin(q)
      .select(col("vec_id"), col("label"),
        cosine(col("embedding"), col("q_emb")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  // ---------------------------------------------------------------------------
  // Johnson–Lindenstrauss sign-projection prefilter
  // ---------------------------------------------------------------------------

  /** Projected dimensionality of the JL prefilter (64 -> 32 doubles: half
    * the multiply-adds per candidate score, recall audited by the paired
    * gate query). */
  val JlDim = 32

  /** Candidate budget for the JL prefilter: max(200, N/10) — a fixed 10×
    * corpus-reduction floor. The synthetic embeddings are ISOTROPIC noise
    * (the measured top-20 cosines sit at ~0.21–0.24 against a 0-mean
    * corpus), which is the worst case for any projection: JL's distortion
    * ~sqrt(ln N / m) is the same order as the score gap, so holding recall
    * needs C proportional to N. Real clustered embeddings (near-neighbor
    * cosine ≫ noise floor) separate far above the distortion and take a
    * fixed small C — the gate query reports the measured value either way
    * (0.95 @ sf0.01 with this budget). Floors to 200 for every N ≤ 2000,
    * which is the generated-oracle literal at the correctness SF. Computed
    * in Long and clamped: N/10 overflows Int beyond ~21.4B rows, and a
    * wrapped-negative budget would poison the downstream `.limit`. */
  def adaptiveJlCands(n: Long): Int =
    math.max(200L, n / 10).min(Int.MaxValue.toLong).toInt

  /** Deterministic ±1 JL sign matrix (the 1-bit Achlioptas 2003 variant of
    * the Johnson–Lindenstrauss random projection): sign(j, i) is derived
    * from the engine-portable md5 hash of `"jl|j|i"`, so the "random" matrix
    * is a pure function of (inDim, outDim) — every executor, every session,
    * and the DuckDB oracle all agree on it without shipping state. */
  private[llm] def jlSigns(inDim: Int, outDim: Int = JlDim): Seq[Seq[Double]] =
    (0 until outDim).map { j =>
      (0 until inDim).map { i =>
        val h = graft.expr.Hash60.compute(
          org.apache.spark.unsafe.types.UTF8String.fromString(s"jl|$j|$i"))
        if (h % 2 == 0) 1.0 else -1.0
      }
    }

  /** v (inDim floats/doubles) -> array of [[JlDim]] doubles: one codegen'd
    * constant-plane dot per output coordinate. At 100 TB this column is
    * computed ONCE and persisted next to the embeddings (a narrow map, no
    * shuffle); queries then score against the projected column instead of
    * the full vectors. */
  def jlProject(v: Column, signs: Seq[Seq[Double]]): Column =
    array(signs.map(row => dotPlane(v, row)): _*)

  /** ANN top-k via JL prefilter + exact re-rank: rank the corpus by cosine in
    * the [[JlDim]]-dim PROJECTED space (sign projections preserve angles in
    * expectation — JL lemma), keep the top `cands` ids, then re-rank ONLY
    * those by exact full-width cosine. The scale contract: the wide vectors are
    * touched for `cands` rows per query (an id-keyed point fetch against any
    * bucketed/indexed layout — modeled here by the broadcast semi-join), not
    * for the whole corpus; the corpus-wide pass reads only the narrow
    * projected column. Both top-k stages plan as TakeOrderedAndProject
    * (local heap + merge, no global sort). */
  def jlPrefilterTopK(embeddings: DataFrame, queryId: Long, k: Int,
      cands: Int, inDim: Int = 64): DataFrame = {
    val signs = jlSigns(inDim)
    val q = broadcast(
      embeddings.filter(col("vec_id") === queryId)
        .select(col("embedding").as("q_emb"),
          jlProject(col("embedding"), signs).as("qp")))
    val projected = graft.Tables.spread(embeddings)
      .select(col("vec_id"), jlProject(col("embedding"), signs).as("p"))
    val candIds = projected.crossJoin(q.select(col("qp")))
      .select(col("vec_id"), cosine(col("p"), col("qp")).as("pc"))
      .orderBy(col("pc").desc, col("vec_id").asc)
      .limit(cands)
      .select("vec_id")
    embeddings.join(broadcast(candIds), Seq("vec_id"))
      .crossJoin(q.select(col("q_emb")))
      .select(col("vec_id"), col("label"),
        cosine(col("embedding"), col("q_emb")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Persist the JL projected column next to the vector store — the scale
    * path [[jlProject]]'s doc promises: computed once at index build (a
    * narrow map), queries then scan 32 doubles per vector instead of the
    * wide embeddings. */
  def writeJlProjected(embeddings: DataFrame, path: String,
      inDim: Int = 64): Unit =
    embeddings.select(col("vec_id"), col("label"),
        jlProject(col("embedding"), jlSigns(inDim)).as("p"))
      .write.mode("overwrite").parquet(path)

  /** [[jlPrefilterTopK]] against the PERSISTED projected column: the
    * corpus-wide prefilter reads only the narrow mart (the query's own
    * projected row comes from the same mart — a pushed point read, no
    * re-projection), and the wide vector store is touched for exactly the
    * candidate ids. Result-identical to the inline spelling by
    * construction — q164 gates it on q157's oracle. */
  def jlPrefilterTopKIndexed(spark: org.apache.spark.sql.SparkSession,
      projectedPath: String, embeddings: DataFrame, queryId: Long, k: Int,
      cands: Int): DataFrame = {
    val proj = spark.read.parquet(projectedPath)
    val qp = broadcast(proj.filter(col("vec_id") === queryId)
      .select(col("p").as("qp")))
    val candIds = graft.Tables.spread(proj.select("vec_id", "p"))
      .crossJoin(qp)
      .select(col("vec_id"), cosine(col("p"), col("qp")).as("pc"))
      .orderBy(col("pc").desc, col("vec_id").asc)
      .limit(cands)
      .select("vec_id")
    val q = broadcast(embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb")))
    embeddings.join(broadcast(candIds), Seq("vec_id"))
      .crossJoin(q)
      .select(col("vec_id"), col("label"),
        cosine(col("embedding"), col("q_emb")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  /** LSH ANN: top-k by cosine among vectors sharing >= 1 table-bucket with
    * the query. The bucket computation is a narrow map over the corpus; the
    * candidate filter is a broadcast semi-join on the query's (tiny) bucket
    * list — at scale the corpus side would be pre-partitioned by
    * (table, bucket) and only matching partitions read. */
  def lshTopK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    val withBuckets = graft.Tables.spread(embeddings)
      .select(col("vec_id"), col("label"), col("embedding"),
        posexplode(buckets(col("embedding"))).as(Seq("table_id", "bucket")))
    val qb = broadcast(
      withBuckets.filter(col("vec_id") === queryId)
        .select(col("table_id"), col("bucket"),
          col("embedding").as("q_emb")))
    withBuckets.join(qb, Seq("table_id", "bucket"))
      .select(col("vec_id"), col("label"),
        Similarity.cosine(col("embedding"), col("q_emb")).as("cosine"))
      .groupBy(col("vec_id"), col("label"), col("cosine"))
      .agg(count(lit(1)).as("n_tables"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  /** IVF (inverted-file) ANN — the other standard scale path beside LSH.
    *
    * Coarse quantizer: the first `nlist` vectors serve as centroids
    * (k-means++-style seeding without Lloyd iterations — deterministic, so
    * the oracle can mirror it; production would refine with k-means).
    * Assignment: argmax cosine over centroids (broadcast join + one window —
    * a narrow pass at corpus scale; the cell id is what you'd partition the
    * table by, so a query reads only nprobe partitions of the corpus).
    * Search: the query probes its `nprobe` nearest cells and ranks only the
    * vectors assigned there.
    */
  def ivfAssign(embeddings: DataFrame, nlist: Int): DataFrame =
    ivfAssignWith(embeddings, seedCentroids(embeddings, nlist))

  /** Deterministic seed centroids: the first `nlist` vectors (cell = vec_id). */
  def seedCentroids(embeddings: DataFrame, nlist: Int): DataFrame =
    embeddings.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cell"), col("embedding").as("cent"))

  /** Assignment against an explicit centroid table `(cell, cent)` — the seam
    * that lets [[kmeansTrain]]ed centroids drive the same quantizer. The
    * centroid side is always broadcast (nlist ≪ corpus); assignment is one
    * narrow pass: the argmax folds over the broadcast cell directory
    * per vector (see [[ivfAssignRanked]]), so NOTHING shuffles. */
  def ivfAssignWith(embeddings: DataFrame, centroids: DataFrame): DataFrame =
    ivfAssignRanked(embeddings, centroids, 1)
      .select("vec_id", "label", "embedding", "cell")

  /** The nlist-row cell directory folded into ONE array row (sorted by
    * cell — unique, so order is deterministic), broadcast to every task.
    * `coalesce(1)` keeps the fold exchange-free: a global aggregate over a
    * single input partition needs no partial/final split, so the whole
    * broadcast subtree is one job. nlist ≪ corpus by the adaptive rule
    * (occupancy ~128), so the array row is always broadcast-sized. */
  private[llm] def centsAsRow(centroids: DataFrame): DataFrame =
    broadcast(centroids.coalesce(1)
      .select(struct(col("cell"), col("cent"),
        sqrt(dot(col("cent"), col("cent"))).as("cn")).as("__c"))
      .agg(array_sort(collect_list(col("__c"))).as("__cents")))

  // The assignment ordering semantics (−sim with NaN→−∞, cell tie-break,
  // hoisted norms) live in the native kernel: [[graft.expr.NearestCells]].

  /** One Lloyd (k-means) refinement step for the IVF coarse quantizer: the
    * offline pass production runs to tighten [[ivfAssign]]'s seeded
    * centroids. Emits the refreshed centroids as (cell, dim, centroid)
    * rows — narrow explode + one shuffle on (cell, dim), partial aggregation
    * map-side; no step touches the driver, so it iterates at corpus scale.
    * Means route through DECIMAL(38,6) so the per-dimension sums are
    * order-insensitive (deterministic AND oracle-matchable; float inputs
    * cannot land on decimal rounding ties, so both engines round alike). */
  def kmeansStep(embeddings: DataFrame, nlist: Int): DataFrame =
    kmeansStepWith(embeddings, seedCentroids(embeddings, nlist))

  /** One Lloyd step against explicit centroids (see [[kmeansStep]]).
    * Output stays (cell, dim, centroid) — q53's declared shape.
    * (r20 note: an all-Dim-sums-in-one-aggregate spelling was tried to
    * drop the second exchange; it DOUBLED the stage's CPU — 64 decimal
    * buffers make the generated aggregate update pathological — so the
    * narrow explode + (cell, dim) partial-agg stays. Its exchange carries
    * only ≤ nlist × Dim partial rows per task, already scale-safe.) */
  def kmeansStepWith(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    ivfAssignWith(embeddings, centroids)
      .select(col("cell"), posexplode(col("embedding").cast("array<double>"))
        .as(Seq("dim", "v")))
      .groupBy("cell", "dim")
      .agg((sum(col("v").cast(dec)).cast("double") /
        count(lit(1)).cast("double")).as("centroid"))
  }

  /** Lloyd-iterated training of the IVF coarse quantizer: `iters` rounds of
    * assign + decimal-routed means, starting from [[seedCentroids]]. Returns
    * the trained `(cell, cent: array<double>)` table, ready to feed
    * [[ivfTopK]] / [[semDedup]] via their `centroids` parameter.
    *
    * Scale shape: every round is ONE distributed pass (broadcast-assign +
    * (cell, dim) mean shuffle with map-side partials) and the only state that
    * crosses rounds is the nlist x Dim centroid table — localCheckpoint'ed
    * per round so lineage stays O(1), never collected to the driver. Cells
    * that lose all members keep their previous centroid (the standard
    * empty-cluster rule, and what keeps the cell directory stable for
    * partition layouts built on it). Means are DECIMAL(38,6)-routed like
    * [[kmeansStepWith]], so every round — and therefore the whole training
    * run — is order-insensitive and oracle-matchable. */
  def kmeansTrain(embeddings: DataFrame, nlist: Int, iters: Int): DataFrame = {
    var cents = seedCentroids(embeddings, nlist)
      .select(col("cell"), col("cent").cast("array<double>").as("cent"))
    for (_ <- 1 to iters) {
      val means = kmeansStepWith(embeddings, cents)
        .groupBy("cell")
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("centroid")))),
          s => s.getField("centroid")).as("cent_new"))
      // stats-free: cents enters the round plan twice (assign + carry-
      // forward join), so a plain localCheckpoint's carried statistics
      // would square per round — see GraftSqlBridge.localCheckpointNoStats
      cents = org.apache.spark.sql.GraftSqlBridge.localCheckpointNoStats(
        cents.join(means, Seq("cell"), "left")
          .select(col("cell"),
            coalesce(col("cent_new"), col("cent")).as("cent")))
    }
    cents
  }

  /** IVF top-k: rank candidates from the query's nprobe nearest cells.
    * `centroids` overrides the seeded coarse quantizer with a trained one
    * (from [[kmeansTrain]]); the search shape is identical either way. */
  def ivfTopK(embeddings: DataFrame, queryId: Long, k: Int,
      nlist: Int, nprobe: Int, centroids: Option[DataFrame] = None): DataFrame = {
    val cents = centroids.getOrElse(seedCentroids(embeddings, nlist))
    val assigned = ivfAssignWith(embeddings, cents)
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    val probes = broadcast(cents.crossJoin(broadcast(q))
      .select(col("cell"), cosine(col("cent"), col("q_emb")).as("sim"))
      .orderBy(col("sim").desc, col("cell").asc)
      .limit(nprobe)
      .select("cell"))
    assigned.join(probes, "cell")
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"), col("cell"),
        cosine(col("embedding"), col("q_emb")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Scalar int8 quantization: q = clamp(floor(x * 127/maxabs + 0.5)), with
    * the per-vector scale kept alongside for dequantization — 4x storage
    * cut for ANN candidate generation (exact re-rank reads the fp32 copy).
    * floor(x+0.5) instead of round(): explicit arithmetic both engines
    * compute identically (round() ties differ across engines). */
  def quantizeInt8(embeddings: DataFrame): DataFrame = {
    val maxabs = aggregate(col("embedding"),
      lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double"))))
    val scale = lit(127.0) / col("maxabs")
    embeddings
      .select(col("vec_id"), col("embedding"), maxabs.as("maxabs"))
      .select(col("vec_id"), col("maxabs"), col("embedding"),
        transform(col("embedding"), x =>
          greatest(lit(-127L), least(lit(127L),
            floor(x.cast("double") * scale + lit(0.5)).cast("long")))).as("q"))
      .select(col("vec_id"), col("maxabs"), col("q"),
        // reconstruction error: max |dequant - original|
        aggregate(
          zip_with(col("q"), col("embedding"), (qi, x) =>
            abs(qi.cast("double") * (col("maxabs") / lit(127.0)) - x.cast("double"))),
          lit(0.0), (acc, e) => greatest(acc, e)).as("max_err"))
  }

  /** SemDeDup-style semantic dedup decisions (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication"):
    * cluster the corpus with the IVF coarse quantizer, compare vectors ONLY
    * within their cell, and drop every vector that has a higher-priority
    * (lower vec_id) neighbor at cosine >= threshold — the survivor of each
    * duplicate neighborhood is its minimum id.
    *
    * Scale shape: the pair space is quadratic only within a cell (cell count
    * grows with the corpus, so occupancy is bounded by nlist tuning, same
    * lever as IVF search); both self-join sides read ONE repartition-by-cell
    * exchange (ReuseExchange), and the dup-id set joins back on vec_id — no
    * all-pairs step at any size. */
  def semDedup(embeddings: DataFrame, nlist: Int, threshold: Double,
      centroids: Option[DataFrame] = None): DataFrame = {
    val assigned = ivfAssignWith(embeddings,
        centroids.getOrElse(seedCentroids(embeddings, nlist)))
      .select("vec_id", "embedding", "cell")
      .repartition(col("cell"))
    val a = assigned.as("a")
    val b = assigned.hint("shuffle_hash").as("b")
    val dupIds = a.join(b,
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .filter(cosine(col("a.embedding"), col("b.embedding")) >= threshold)
      .select(col("b.vec_id").as("vec_id"))
      .distinct()
    assigned.select("vec_id", "cell")
      .join(dupIds.withColumn("__dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("__dup"), lit(false)).as("is_dup"))
  }

  /** LSH candidate pairs for [[nearDupPairs]]: same bucket in any table.
    * Geometry is the recall/cost knob — identical vectors collide in EVERY
    * table at any R (sign patterns equal), so exact duplicates are never
    * lost by raising R; near-dup recall at a given cosine is the
    * 1-(1-(1-θ/π)^R)^T curve. */
  def lshCandidates(embeddings: DataFrame,
      tables: Int = Tables, planesPerTable: Int = PlanesPerTable): DataFrame = {
    // Shared shuffle on the bucket key: one exchange feeds both self-join
    // sides (ReuseExchange), so the T*R plane dot products per vector run
    // once, not twice.
    val b = graft.Tables.spread(embeddings).select(col("vec_id"),
      posexplode(bucketsWith(col("embedding"), tables, planesPerTable))
        .as(Seq("table_id", "bucket")))
      .repartition(col("table_id"), col("bucket"))
    val a = b.as("a")
    val c = b.hint("shuffle_hash").as("b")
    a.join(c,
        col("a.table_id") === col("b.table_id") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id_a"), col("b.vec_id").as("vec_id_b"))
      .distinct()
  }

  /** Embedding near-dup pairs: candidates = same bucket in any table
    * (banded-LSH shape, no all-pairs), verified by exact cosine >= threshold. */
  def nearDupPairs(embeddings: DataFrame, threshold: Double,
      tables: Int = Tables, planesPerTable: Int = PlanesPerTable): DataFrame = {
    val candidates = lshCandidates(embeddings, tables, planesPerTable)
    val ea = embeddings.select(col("vec_id").as("vec_id_a"), col("embedding").as("emb_a"))
    val eb = embeddings.select(col("vec_id").as("vec_id_b"), col("embedding").as("emb_b"))
    candidates.join(ea, "vec_id_a").join(eb, "vec_id_b")
      .select(col("vec_id_a"), col("vec_id_b"),
        cosine(col("emb_a"), col("emb_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Multi-probe assignment: each vector lands in its top `probes` cells
    * (not just the nearest) — the recall knob for cell-confined pair
    * emission ([[nearDupPairsIvf]]): a near-dup pair straddling a cell
    * boundary meets as soon as the two probe sets intersect. Same single
    * broadcast cosine pass as [[ivfAssignWith]]; downstream pair space
    * multiplies by ≤ probes². */
  def ivfAssignMulti(embeddings: DataFrame, centroids: DataFrame,
      probes: Int): DataFrame =
    ivfAssignRanked(embeddings, centroids, probes)
      .select("vec_id", "label", "embedding", "cell")

  /** THE rank-kept assignment: every vector's top `maxProbes` cells with
    * the rank column preserved — the one spelling of the
    * cosine-desc/cell-asc assignment order that [[ivfAssignMulti]] and
    * the q121 recall audit both consume (rank 1 of this fold IS
    * [[ivfAssignWith]]'s assignment; a tie-break change here is the only
    * place the probe tiers' ordering can move).
    *
    * Shape (r20): the old spelling joined the corpus against the
    * broadcast directory (materializing corpus × nlist rows) and ranked
    * them through a vec_id window — i.e. the WHOLE cross product crossed
    * an exchange and a sort just to keep the top rows per vector. The
    * fold spelling ranks each vector's nlist candidate cells INSIDE the
    * row (transform over the broadcast directory array + array_sort with
    * [[simCellCmp]] + slice), so assignment is a genuinely narrow pass:
    * zero exchanges at ANY corpus size, identical output (same cosine
    * expression per (vector, cell), same order, same tie-breaks —
    * oracle-hash-pinned by q53/q82/q88/q104/q113/q121). */
  private[llm] def ivfAssignRanked(embeddings: DataFrame,
      centroids: DataFrame, maxProbes: Int): DataFrame =
    assignFold(embeddings, centroids, maxProbes, withCent = false)
      .select("vec_id", "label", "embedding", "cell", "__rn")

  /** [[ivfAssignWith]] with the winning cell's CENTROID carried in-row —
    * the IVFADC family's residual step needs (v − centroid), and carrying
    * `cent` out of the fold saves the cents re-join it used to pay. */
  def ivfAssignWithCent(embeddings: DataFrame, centroids: DataFrame): DataFrame =
    assignFold(embeddings, centroids, 1, withCent = true)
      .select("vec_id", "label", "embedding", "cell", "cent")

  private def assignFold(embeddings: DataFrame, centroids: DataFrame,
      maxProbes: Int, withCent: Boolean): DataFrame = {
    val extra = if (withCent)
      Seq(col("__sc").getField("cent").as("cent")) else Nil
    graft.Tables.spread(embeddings).crossJoin(centsAsRow(centroids))
      .select(col("vec_id"), col("label"), col("embedding"),
        posexplode(graft.expr.NearestCells(col("embedding"), col("__cents"),
          maxProbes, withCent)).as(Seq("__p", "__sc")))
      .select(Seq(col("vec_id"), col("label"), col("embedding"),
        col("__sc").getField("cell").as("cell"),
        (col("__p") + 1).cast("int").as("__rn")) ++ extra: _*)
  }

  /** The IVF-cell tier of [[nearDupPairs]] — the 100 TB path for q34's
    * semantics: candidate pairs are SAME-CELL pairs under the TRAINED
    * coarse quantizer ([[kmeansTrain]], the q82 chain), verified by the
    * identical exact-cosine threshold. This is [[semDedup]]'s confinement
    * applied to pair EMISSION rather than dedup decisions, so the output
    * schema is q34's (vec_id_a, vec_id_b, cosine) drop-in.
    *
    * Contract vs the LSH tier: exact duplicates always land in the same
    * cell (identical vectors assign identically), so they are never lost;
    * near-dups that straddle a cell boundary are the tier's documented
    * recall trade (the SemDeDup contract — multi-probe assignment is the
    * recall knob if needed). In exchange the pair space is occupancy² per
    * cell with occupancy held ~128 by the [[adaptiveNlist]] rule — ONE
    * shuffle on the cell key feeding both self-join sides (ReuseExchange),
    * no T-table bucket explode, no all-pairs step at any size. */
  def nearDupPairsIvf(embeddings: DataFrame, nlist: Int, threshold: Double,
      iters: Int = 2, probes: Int = 1): DataFrame =
    nearDupPairsIvfWith(embeddings, kmeansTrain(embeddings, nlist, iters),
      threshold, probes)

  /** [[nearDupPairsIvf]] against PRE-TRAINED centroids — the seam that
    * lets one training pass feed several probe settings (the q121 recall
    * audit) or a persisted centroid table (the flags-disappear-at-100TB
    * doctrine: geometry is trained once, offline). */
  def nearDupPairsIvfWith(embeddings: DataFrame, cents: DataFrame,
      threshold: Double, probes: Int = 1): DataFrame =
    nearDupPairsFromAssigned(
      (if (probes <= 1) ivfAssignWith(embeddings, cents)
       else ivfAssignMulti(embeddings, cents, probes))
        .select("vec_id", "embedding", "cell"),
      threshold, dedupe = probes > 1)

  /** Same-cell pair emission + exact-cosine verify over an ALREADY-ASSIGNED
    * frame (vec_id, embedding, cell) — the shared tail of the cell tier:
    * one cell-keyed exchange feeding both self-join sides (ReuseExchange).
    * `dedupe` is for multi-probe inputs, which can emit a pair once per
    * shared cell (≤ probes² copies; the cosine is computed identically
    * each time, so distinct dedupes exactly); single-probe callers keep
    * the distinct-free plan. */
  private[llm] def nearDupPairsFromAssigned(assignedRaw: DataFrame,
      threshold: Double, dedupe: Boolean): DataFrame = {
    val assigned = assignedRaw.repartition(col("cell"))
    val a = assigned.as("a")
    val b = assigned.hint("shuffle_hash").as("b")
    val pairs = a.join(b,
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id_a"), col("b.vec_id").as("vec_id_b"),
        cosine(col("a.embedding"), col("b.embedding")).as("cosine"))
      .filter(col("cosine") >= threshold)
    if (dedupe) pairs.distinct() else pairs
  }

  /** The cell tier's recall, MEASURED against the LSH tier at each probe
    * setting — the number behind q113's documented recall trade: for every
    * `probes` in `probesList`, |cell-tier pairs ∩ LSH-tier pairs| /
    * |LSH-tier pairs| at the shared cosine threshold (recall_micro, the
    * repo's integer-micro discipline), plus the raw pair counts. One LSH
    * pass and ONE k-means training feed every probe setting (the pair sets
    * are localCheckpoint'd / centroid-shared), so the audit costs
    * lsh + train + Σ_p assign+pairs — not |probesList| full reruns.
    *
    * Scale shape: both tiers are the banded/bucketed plans they always
    * are; the intersection is a semi-join on the (a, b) pair key over two
    * bounded pair sets. At 100 TB this audit runs on a corpus SAMPLE (the
    * recall estimate is a proportion — sampling error ~1/√pairs), exactly
    * like any other quality gate; the registered query IS that job at
    * verify scale. */
  def nearDupRecallVsLsh(embeddings: DataFrame, nlist: Int,
      threshold: Double, probesList: Seq[Int], tables: Int = Tables,
      planesPerTable: Int = PlanesPerTable): DataFrame = {
    val lsh = nearDupPairs(embeddings, threshold, tables, planesPerTable)
      .select("vec_id_a", "vec_id_b").localCheckpoint(false)
    val lshN = lsh.agg(count(lit(1)).as("lsh_pairs"))
    val cents = kmeansTrain(embeddings, nlist, iters = 2)
    // ONE corpus × nlist assignment pass at max(probes), rank kept
    // (ivfAssignRanked — the SHARED spelling, so the audit cannot drift
    // from the assignment the tiers serve); each probe setting is a rank
    // filter over it, making per-setting pair sets identical to
    // nearDupPairsIvfWith's without re-running the cosine pass.
    val assignedAll =
      ivfAssignRanked(embeddings, cents, probesList.max)
        .select("vec_id", "embedding", "cell", "__rn")
        .localCheckpoint(false)
    probesList.map { p =>
      val cell = nearDupPairsFromAssigned(
        assignedAll.filter(col("__rn") <= p)
          .select("vec_id", "embedding", "cell"),
        threshold, dedupe = p > 1)
        .select("vec_id_a", "vec_id_b").localCheckpoint(false)
      val cellN = cell.agg(count(lit(1)).as("cell_pairs"))
      val hitN = lsh.join(cell, Seq("vec_id_a", "vec_id_b"), "left_semi")
        .agg(count(lit(1)).as("hit_pairs"))
      lshN.crossJoin(cellN).crossJoin(hitN)
        .select(lit(p).as("probes"), col("lsh_pairs"), col("cell_pairs"),
          col("hit_pairs"),
          when(col("lsh_pairs") > 0,
            floor(lit(1000000.0) * col("hit_pairs").cast("double")
              / col("lsh_pairs").cast("double") + lit(0.5)).cast("long"))
            .as("recall_micro"))
    }.reduce(_.unionByName(_)).orderBy("probes")
  }

  /** Hard-negative mining for contrastive embedding training: for each
    * query vector, the top-k most-similar vectors that are NOT duplicates —
    * high-cosine-but-below-`dupMax` neighbors are the informative negatives
    * (confusable with the query yet genuinely different); at-or-above
    * `dupMax` they're positives/near-dups (q34/q57 territory) and polluting
    * negatives with them teaches the model to split duplicates apart.
    *
    * Scale shape: the query set broadcasts (queries ≪ corpus) and scoring
    * is one narrow pass producing |corpus|×|queries| bounded rows. The
    * top-k is TWO-PHASE: a query_id-only rank window would funnel a whole
    * corpus copy into one task per query (the low-cardinality-partition
    * straggler), so phase 1 ranks within (query_id, salt) — uniform
    * partitions, each emitting ≤ k survivors — and phase 2 re-ranks the
    * |queries|×salt×k union, which is trivially small. Global top-k equals
    * top-k of the union of local top-ks, so results are identical to the
    * single-window spelling (q43 keeps that canonical form; this is the
    * shape that survives a corpus 1000× bigger). Batched queries amortize
    * the corpus scan — a training epoch's query batch runs in ONE pass. */
  def hardNegatives(embeddings: DataFrame, nQueries: Int, k: Int,
      dupMax: Double, salts: Int = 64): DataFrame =
    rankPerQuery(
      queryScores(embeddings, nQueries).filter(col("cosine") < dupMax),
      k, salts)

  /** The batched query×corpus cosine frame (query_id, vec_id, cosine):
    * queries broadcast (queries ≪ corpus), one narrow pass, self
    * excluded. Shared by [[hardNegatives]] and [[contrastivePairs]]. */
  private def queryScores(embeddings: DataFrame,
      nQueries: Int): DataFrame = {
    val q = broadcast(embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    graft.Tables.spread(embeddings).crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("embedding"), col("q_emb")).as("cosine"))
  }

  /** Per-query top-k over a (query_id, vec_id, cosine) frame via the
    * native bounded aggregate [[graft.expr.TopKOrdIds]] — identical
    * results to the salted two-phase window spelling it replaces (ranked
    * by cosine DESC, vec_id ASC; TopKOrdIdsSpec pins the parity), at ONE
    * exchange and zero sorts: partial aggregation ships at most k pairs
    * per (query, map task), which is the same anti-straggler bound the
    * (query_id, salt) local-rank phase bought with a second
    * exchange+sort. `salts` is retained in the public signatures for API
    * stability; the aggregate's map-side truncation subsumes it. */
  private def rankPerQuery(scored: DataFrame, k: Int,
      salts: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(graft.expr.TopKOrdIds(col("cosine"), col("vec_id"), k,
        desc = true).as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__p", "__t")))
      .select(col("query_id"), col("__t.id").as("vec_id"),
        col("__t.ord").as("cosine"),
        (col("__p") + 1).cast("long").as("rank"))

  /** Contrastive training pairs for embedder fine-tuning: per query
    * anchor, its top-kPos near-duplicates (label 1 — the positives a
    * contrastive loss pulls together) and its top-kNeg hard negatives
    * (label 0 — high-cosine-but-below-threshold, the informative
    * negatives [[hardNegatives]] documents). ONE batched corpus scoring
    * pass (checkpointed) feeds both classes; each class ranks through the
    * same salted two-phase top-k. The threshold is the q34 near-dup
    * cosine, so "positive" here agrees with the dedup family's notion of
    * duplicate. */
  def contrastivePairs(embeddings: DataFrame, nQueries: Int, kPos: Int,
      kNeg: Int, dupMin: Double, salts: Int = 64): DataFrame = {
    val scored = queryScores(embeddings, nQueries).localCheckpoint(false)
    val pos = rankPerQuery(scored.filter(col("cosine") >= dupMin),
      kPos, salts).withColumn("label", lit(1L))
    val neg = rankPerQuery(scored.filter(col("cosine") < dupMin),
      kNeg, salts).withColumn("label", lit(0L))
    pos.unionByName(neg)
      .select(col("query_id"), col("vec_id"), col("label"), col("cosine"),
        col("rank"))
      .orderBy(col("query_id"), col("label").desc, col("rank"))
  }
}
