package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextOps._

/** Deduplication operators over the `documents` table — the training-data
  * pipeline's first pass. Four strategies, cheapest first:
  *
  *   1. exact      — hash-groupBy on md5(normalized text); one shuffle on the
  *                   hash key, keep-one by deterministic rank.
  *   2. MinHash/LSH — shingle -> minhash signature -> banded buckets ->
  *                   within-bucket candidate pairs -> exact Jaccard verify.
  *                   NEVER all-pairs: at 100 TB the only shuffle is the
  *                   band-bucket exchange, and bucket sizes are bounded by
  *                   collision probability, not corpus size.
  *   3. SimHash    — 32-bit fingerprint; near-dup pairs via 8-bit bands +
  *                   Hamming-distance verify (bit_count(xor)).
  *   4. n-gram Jaccard — exact character-trigram Jaccard, bucketed by a
  *                   grouping column so the pair space is per-bucket, not
  *                   global.
  *
  * All pure Column expressions; DuckDB mirrors in [[LlmSql]].
  */
object Dedup {

  /** Exact dedup: keep one row per md5(normalized text). Deterministic
    * keep-one (lowest doc_id, then source) — the `latestWins` shape from the
    * SEC pipeline (Statements.latestWins) applied to content hashes. Input
    * may contain repeated crawls of the same doc (see q20, which feeds the
    * table unioned with itself). */
  def exactDedup(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("text_hash")
      .orderBy(col("doc_id").asc, col("source").asc)
    docs
      .withColumn("text_hash", md5(normText(col("text"))))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("doc_id", "text_hash", "lang", "source", "n_chars")
  }

  /** Per-doc MinHash signatures over word 2-gram shingles — one native pass:
    * tokens -> positional shingle hashes (graft.expr.ShingleHashSeq, no
    * intermediate string arrays) -> 16 permutation minima. The positional
    * sequence repeats a hash where the doc repeats a shingle; minima are
    * duplicate-insensitive, so the signature equals the one computed over
    * the distinct shingle SET (which is what the oracle hashes). */
  def minhashSignatures(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      minhashSignature(shingleHashSeq(toks(col("text")), 2)).as("sig"))

  /** MinHash/LSH near-dup pairs with exact-Jaccard verification.
    *
    * Plan shape (scale-critical): signatures are a narrow map over docs; the
    * band explode multiplies rows x4; the self-join shuffles on
    * (band_idx, band_hash) — a key whose cardinality grows with the corpus,
    * so buckets stay small; candidate pairs are deduped per-pair before the
    * (doc_id-keyed, co-partitionable) joins that fetch shingle sets for the
    * verify. No step is quadratic in the corpus.
    */
  /** Docs with <2 tokens have NO shingles: their MinhashSig would be all
    * Long.MaxValue sentinels (DuckDB's list_min([]) yields NULLs instead)
    * and a candidate pair against one would hit 0/0 Jaccard — engines
    * disagree on both. Filter them out BEFORE the shingle projection
    * (mirrored by `WHERE len(s) > 0` in the q21 oracle — equivalent: a doc
    * has >=1 2-gram shingle iff it has >=2 tokens); an empty doc cannot be
    * a near-dup of anything under set-Jaccard semantics. Filtering on the
    * CHEAP token count, pre-projection, matters: a post-projection
    * `size(shingle_set) > 0` predicate gets pushed below the projection and
    * re-evaluates the whole shingle pipeline per row (measured +60% on
    * q21). Shared by the one-shot pair run and the incremental probe —
    * a doc's bands/shingles depend only on its own text, which is exactly
    * why an incremental index is sound. */
  private[llm] def eligibleDocs(docs: DataFrame): DataFrame =
    graft.Tables.spread(docs)
      .filter(size(toks(col("text"))) >= 2)

  /** Verify sets: sorted distinct shingle HASHES (the q23 merge-intersect
    * spelling) — native kernels end to end, no interpreted string-array
    * lambdas. RAW 60-bit hashes here (not the signatures' mod-P images,
    * whose ~n²/2^32 per-doc collision rate would quietly shrink distinct
    * sets): at 2^60 a collision is ~n²/2^61, so the hash-set Jaccard equals
    * the string-set Jaccard, and both engines hash identically anyway. */
  private[llm] def shingleSetsOf(eligible: DataFrame): DataFrame =
    eligible.select(
      col("doc_id"),
      array_sort(array_distinct(
        graft.expr.ShingleHashSeq(toks(col("text")), 2))).as("shingle_set"))

  /** Exploded (doc_id, band_idx, band_hash) rows of the docs' signatures —
    * the LSH bucket keys both the self-join and the index probe match on. */
  private[llm] def bandsOf(eligible: DataFrame): DataFrame =
    minhashSignatures(eligible)
      .select(col("doc_id"), explode(lshBands(col("sig"))).as("band"))
      .select(col("doc_id"), col("band.band_idx").as("band_idx"),
        col("band.band_hash").as("band_hash"))

  def minhashNearDupPairs(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    val eligible = eligibleDocs(docs)
    val shingleSets = shingleSetsOf(eligible)
    // Repartition on the band key: both self-join sides share ONE exchange
    // (ReuseExchange), so the md5+permutation signature prep runs once, and
    // shuffle_hash is the strategy that still exists at corpus scale.
    val bands = bandsOf(eligible)
      .repartition(col("band_idx"), col("band_hash"))
    val a = bands.as("a")
    val b = bands.hint("shuffle_hash").as("b")
    val candidates = a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id_a"), col("b.doc_id").as("doc_id_b"))
      .distinct()
    val sa = shingleSets.select(col("doc_id").as("doc_id_a"), col("shingle_set").as("sh_a"))
    val sb = shingleSets.select(col("doc_id").as("doc_id_b"), col("shingle_set").as("sh_b"))
    candidates
      .join(sa, "doc_id_a")
      .join(sb, "doc_id_b")
      .select(col("doc_id_a"), col("doc_id_b"),
        // early-exit walk: most candidates fail the threshold, and the
        // kernel abandons them at the first provably-hopeless position; a
        // bailed pair yields icnt=-1 -> negative jaccard -> filtered. The
        // bound is floor-conservative, so no passing pair is ever pruned.
        graft.expr.ThresholdedIntersectCount(col("sh_a"), col("sh_b"),
          graft.expr.ThresholdedIntersectCount.jaccardBound(
            size(col("sh_a")) + size(col("sh_b")), threshold)).as("icnt"),
        (size(col("sh_a")) + size(col("sh_b"))).as("nsum"))
      // |A ∪ B| = |A| + |B| − |A ∩ B|: same integers as the oracle's
      // list_intersect / list_distinct(list_concat) over the hash lists.
      .select(col("doc_id_a"), col("doc_id_b"),
        (col("icnt").cast("double") / (col("nsum") - col("icnt")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---------------------------------------------------------------------------
  // Incremental MinHash dedup: persisted band index + delta probe
  // ---------------------------------------------------------------------------

  /** Broadcast budget for the DELTA-derived frames of the incremental
    * probe, counted in delta docs (an upper bound on every frame the probe
    * would broadcast: reps <= eligible <= docs; bands = 4x reps; dup ids
    * <= docs). Under the budget the delta broadcasts and the index streams
    * map-side — the design intent, since admission deltas are micro-batch
    * sized. OVER it (a whole crawl day probed at once) every delta-side
    * hint degrades to a shuffled hash join instead of OOMing the driver —
    * the same stats-sized decision [[graft.ops.Analyze.joinPlannedByStats]]
    * makes from the ANALYZE mart, here made from one count on the frame
    * itself (already materialized for the admission transaction, one
    * delta-sized count otherwise). 100k docs x ~8 band rows + shingle sets
    * stays well inside a 1-4 GiB executor broadcast budget; stale sizing
    * is impossible because the count is of the probe's own input. */
  val DefaultProbeBroadcastMaxDocs: Long = 100000L

  /** Broadcast budget for the probe's CANDIDATE-derived frames
    * (candidates, repPairs), which the delta-doc budget does NOT bound:
    * they are pair-set sized (delta reps × matching corpus reps), so one
    * small delta whose docs band-collide with millions of DISTINCT corpus
    * texts (rep collapse only bounds exact dups) can blow past any
    * doc-count budget. The guard is a measured count of the band-join
    * output, taken ONLY when the delta itself qualified for broadcast
    * (an over-budget delta already shuffles everything); over the budget
    * the verify join degrades to the shuffled tier — a slower plan, never
    * an oversized broadcast. Priced at one extra evaluation of the
    * band join for plain probes (the admission path checkpoints the
    * frame, so its count is a cache read). */
  val DefaultProbeBroadcastMaxCandidatePairs: Long = 400000L

  /** Broadcast budget for the takedown REGISTRY / QUARANTINE lanes the
    * admission transaction consults, counted in committed lane ROWS (one
    * registry row per destroyed doc; one quarantine band row per victim
    * rep × band; one quarantine shingle row per victim rep). "Registry-
    * sized — legal-process scale" is the common case, not a bound: one
    * whole-source legal recall (the 10^7-victim case
    * [[graft.ops.Layout]]'s victim-frame tier anticipates) quarantines
    * 10^7 docs' band rows and full shingle arrays — tens of GB that must
    * NOT be broadcast to every executor. Each lane is counted
    * independently (one footer-backed count of a lane-sized parquet
    * read); under the budget the lane broadcasts and the delta streams
    * map-side, over it the consult degrades to the shuffled-hash tier —
    * the identical-rows/strategy-only flip [[probeCore]]'s delta budget
    * already pins. 100k rows of keys/bands stays well inside a 1-4 GiB
    * executor budget; the shingle-set lane's rows are heavier, but so are
    * the delta shingle rows the same default bounds in the probe. */
  val DefaultRegistryBroadcastMaxRows: Long = 100000L

  /** Row cap per parquet file of a registry/quarantine LANE delivery.
    * Takedown-request-sized lanes coalesce to ONE file (the common case —
    * a handful of rows; one file keeps the consult's count/footer reads
    * O(1)); a whole-source recall's lane shards into ceil(rows / cap)
    * files so no single writer task materializes a multi-GB lane
    * partition. */
  val DefaultRegistryLaneMaxRowsPerFile: Long = 1000000L

  /** Delta-side join shape: broadcast when the sizing decision says the
    * delta is small (the map-side-streaming plan), shuffled hash join with
    * the delta as build side otherwise — the strategy flip moves the
    * exchange, never the rows (spec-pinned). */
  /** Budget probe: decides `count(df) <= budget` as
    * `df.limit(budget + 1).count() <= budget` — the identical predicate
    * (min(count, budget+1) <= budget ⟺ count <= budget, for budget >= 0),
    * but the LocalLimit stops every partition after budget+1 rows instead
    * of counting the world. On the lazy probe path the candidate-pair
    * pricing previously recomputed the WHOLE delta-tokenize + band-join
    * lineage just to take its count; the bounded probe prices the same
    * decision on a prefix. Strategy flips are unchanged at every budget
    * (DedupSpec pins the flip legs, including budget 0). */
  private def withinBudget(df: DataFrame, budget: Long): Boolean =
    if (budget < 0 || budget >= Int.MaxValue) df.count() <= budget
    else df.limit(budget.toInt + 1).count() <= budget

  private def sized(df: DataFrame, small: Boolean): DataFrame =
    if (small) broadcast(df) else df.hint("shuffle_hash")

  /** The probe core's outputs plus its two sizing decisions: `smallDelta`
    * bounds every DELTA-sized frame (membership, dup ids, bands, shingle
    * sets — all ≤ delta docs), `smallVerify` additionally bounds the
    * PAIR-SET-sized frames (candidates, repPairs) by the measured
    * candidate count. smallVerify implies smallDelta. */
  private final case class ProbeFrames(repPairs: DataFrame,
      dMembers: DataFrame, newBands: DataFrame, newSets: DataFrame,
      candidates: DataFrame, smallDelta: Boolean, smallVerify: Boolean)

  /** (doc_id, rep) membership of the eligible docs' exact-text groups —
    * rep = min doc_id per md5(normText), the exactDedup key. Every stage
    * of the minhash pipeline (shingle set → signature → bands → Jaccard)
    * is a function of the normalized text, so docs in one group are
    * interchangeable: indexing/probing REP DOCS ONLY and expanding rep
    * pairs through this membership is output-identical to the doc-level
    * pipeline (the [[nearDupLabelsCollapsed]] argument) — and it is the
    * degenerate-duplication guard for the incremental tier: 10^4
    * identical crawls in the corpus cost the probe ONE band row per
    * band, not 10^4 candidates per colliding delta doc. */
  private[llm] def exactGroupsOf(eligible: DataFrame): DataFrame =
    eligible
      .select(col("doc_id"), md5(normText(col("text"))).as("__th"))
      .withColumn("rep", min("doc_id").over(Window.partitionBy("__th")))
      .select("doc_id", "rep")

  // ---------------------------------------------------------------------------
  // Takedown registry: the standing re-admission block
  // ---------------------------------------------------------------------------

  /** Reserved logical-batch LANE for the takedown registry (the highest id
    * [[graft.ops.Layout.beginBatchCommit]] accepts). The registry cannot
    * ride an affected delivery's rewrite: a crash-REPLAYED admission of
    * that logical batch would re-deliver it under a fresh physical and
    * silently supersede the registry rows with it. In its own lane, each
    * takedown supersedes only the PREVIOUS registry delivery (carrying its
    * rows forward), no admission batch can ever collide with it, and the
    * registry swaps in the same manifest version as the delete itself.
    * Admission/append batch ids are required to stay below it. */
  val RegistryBatch: Long = graft.ops.Layout.GenStride - 2

  /** Content key of an exact-text group: md5 over the canonical (sorted,
    * distinct — [[shingleSetsOf]]'s invariant) shingle-hash set. Key
    * equality IS shingle-set equality (md5 collisions aside), which is
    * exactly the class of re-crawls the registry must refuse: a doc whose
    * set equals a destroyed doc's would have paired with it at jaccard
    * 1.0 — the content the takedown erased. One-way 60-bit hashes of word
    * 2-grams, then md5 — the registry retains NO recoverable text. */
  private def contentKey(shingleSet: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    md5(concat_ws(",", transform(shingleSet, x => x.cast("string"))))

  /** The committed takedown registry of a [[writeMinhashIndex]] root: one
    * (content_key, doc_id) row per DESTROYED doc — doc_id is the audit
    * trail back to the takedown request, content_key the standing block
    * [[admitIntoMinhashIndex]] consults. Registry-sized (cumulative
    * takedown requests), never corpus-sized. Empty frame when no takedown
    * has ever run. `asOfVersion` shares the index's refusal contract. */
  def takedownRegistry(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, asOfVersion: Option[Long] = None): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/takedowns")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      asOfVersion.foreach(_ =>
        graft.ops.Layout.committedBatchFilterAt(spark, indexPath,
          asOfVersion))
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("content_key", StringType),
          StructField("doc_id", LongType))))
    } else
      spark.read.parquet(s"$indexPath/takedowns")
        .filter(graft.ops.Layout.committedBatchFilterAt(spark, indexPath,
          asOfVersion))
        .select("content_key", "doc_id")
  }

  /** Sized registry-lane delivery: one writer task, files split every
    * `cap` rows by the writer itself (`maxRecordsPerFile`) — a
    * takedown-request-sized lane lands as ONE file (O(1) footer reads
    * for the admission consult's lane count), a whole-source recall as
    * ceil(rows / cap) bounded files. The r20 spelling priced an explicit
    * shard count with a `df.count()` job plus a round-robin exchange per
    * lane write; the writer-side split delivers the identical file
    * layout (DedupSpec pins both tiers) with neither — the one trade is
    * that the rare giant-recall lane is written by one sequential task
    * instead of `shards` parallel ones, bounded-memory either way. */
  private def laneSharded(df: DataFrame, cap: Long): DataFrame =
    df.coalesce(1)

  /** One registry-lane table's committed rows, None when the table has
    * never been written — the read side of the takedown registry and its
    * near-copy QUARANTINE (`takedowns_bands` / `takedowns_shingles`). */
  private def laneTable(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, table: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/$table")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(spark.read.parquet(s"$indexPath/$table")
      .filter(graft.ops.Layout.committedBatchFilter(spark, indexPath)))
  }

  /** Persist the corpus's MinHash dedup index — three tables under
    * `indexPath`, every one partitioned by `batch_id` and governed by the
    * Layout manifest protocol ([[graft.ops.Layout.initCommitLog]]), the
    * same exactly-once/snapshot law as the BM25/IVFADC/aHash layouts:
    *
    *   - `bands`    — exploded (doc_id, band_idx, band_hash) of the REP
    *                  docs, sorted by the band key so parquet row-group
    *                  min/max covers the probe's bucket lookups;
    *   - `shingles` — the reps' verify shingle sets, sorted by doc_id;
    *   - `members`  — (doc_id, rep) for EVERY eligible doc: the exact-dup
    *                  group membership rep pairs expand through.
    *
    * THE 100 TB dedup operation is probing a DELTA against this index
    * ([[probeMinhashIndex]]) — the corpus's signatures are computed once
    * at admission, never again. A doc's bands/shingles depend only on its
    * own text, so the index is append-only by construction
    * ([[appendMinhashIndex]]). The base build writes the reserved
    * `batch_id=-1` partition (always visible; stream/ingest batches are
    * >= 0, the writeIvfadcIndex convention) and clears any previous
    * commit log — Overwrite means a fresh index, not a fresh base under
    * stale appends. */
  def writeMinhashIndex(docs: DataFrame, indexPath: String,
      dropTakedowns: Boolean = false): Unit = {
    val spark = docs.sparkSession
    // a rebuild must not resurrect the PREVIOUS index's AUDIT
    // (initCommitLog's directory-walk backfill would re-publish leftover
    // admission batches, serving the old index's per-source counts as the
    // new index's committed state) — but the takedown REGISTRY and its
    // quarantine are NOT index state: they are standing legal
    // obligations, index-independent one-way content keys that outlive
    // any one build. "A fresh build's corpus must already honor
    // outstanding takedowns" (the pre-r20 contract) is precisely the
    // assumption an operator under legal pressure breaks — rebuild from a
    // stale corpus snapshot and every outstanding takedown silently
    // evaporates. So by default the lanes CARRY FORWARD, and the rebuild
    // REFUSES — before touching anything — if the fresh corpus itself
    // contains an exact-key copy of a registered victim (carrying a
    // registry while serving the victim from the base is incoherent).
    // `dropTakedowns = true` is the caller's explicit acknowledgment that
    // the obligations end here. Near copies in the fresh corpus are not
    // checked (exact key is the base-build contract; the quarantine tier
    // guards the admission door).
    val hconf = spark.sparkContext.hadoopConfiguration
    val laneNames = Seq("takedowns", "takedowns_bands",
      "takedowns_shingles")
    def laneExists(t: String): Boolean = {
      val p = new org.apache.hadoop.fs.Path(s"$indexPath/$t")
      p.getFileSystem(hconf).exists(p)
    }
    val carried: Seq[(String, DataFrame)] =
      if (dropTakedowns || !laneExists("takedowns")) Nil
      else {
        // capture committed lane rows BEFORE the reset retires their
        // manifest (eager checkpoints — file-independent from here on)
        val lanes =
          ("takedowns" -> takedownRegistry(spark, indexPath)
            .localCheckpoint()) +:
          laneNames.tail.flatMap(t => laneTable(spark, indexPath, t)
            .map(df => t -> df.drop("batch_id").localCheckpoint()))
        val nViol = shingleSetsOf(eligibleDocs(docs))
          .select(contentKey(col("shingle_set")).as("__ck"))
          .join(broadcast(lanes.head._2
            .select(col("content_key").as("__ck")).distinct()),
            Seq("__ck"), "left_semi")
          .count()
        require(nViol == 0L,
          s"rebuild refused: $nViol corpus doc(s) carry the exact " +
            "content key of a registered takedown victim. Purge them " +
            "from the corpus, or pass dropTakedowns = true to " +
            "explicitly end the standing obligations with this rebuild.")
        lanes
      }
    graft.ops.Layout.resetCommitLog(spark, indexPath)
    (Seq("admissions") ++ laneNames).foreach { t =>
      val p = new org.apache.hadoop.fs.Path(s"$indexPath/$t")
      val fs = p.getFileSystem(hconf)
      if (fs.exists(p)) { fs.delete(p, true); () }
    }
    writeIndexDelta(docs, indexPath, phys = -1L, dynamic = false)
    carried.foreach { case (t, rows) =>
      laneSharded(rows, DefaultRegistryLaneMaxRowsPerFile)
        .withColumn("batch_id",
          lit((RegistryBatch + 1) * graft.ops.Layout.GenStride)) // gen-0
        .write.mode("overwrite")
        .option("maxRecordsPerFile", DefaultRegistryLaneMaxRowsPerFile)
        .partitionBy("batch_id")
        .parquet(s"$indexPath/$t")
    }
    graft.ops.Layout.initCommitLog(spark, indexPath) // backfills the lanes
    carried.foreach { case (_, rows) => freeCheckpoint(rows) }
  }

  /** Admit a new delta into the index — typically the probe's SURVIVORS
    * (docs that did not near-dup against the corpus). Exactly-once under
    * the Layout manifest protocol (the appendToIvfadcIndex recipe): the
    * delivery lands under its own fresh PHYSICAL partition id and becomes
    * visible through one atomic manifest swap, so a re-delivered batch
    * (driver retry after a successful commit) dynamic-overwrites its own
    * partitions byte-identically instead of double-appending a doc's
    * bands AND shingles — which would make the probe emit duplicate pairs
    * and make a retried delta match its own half-committed copy at
    * jaccard 1.0, rejecting everything. A probe planned during an append
    * keeps reading the previous snapshot: bands, shingles and members
    * resolve from ONE manifest, never a torn pair. Existing files are
    * never rewritten; superseded deliveries are reclaimed by
    * [[graft.ops.Layout.vacuumLayout]]. The delta is collapsed to reps
    * WITHIN the batch; exact dups across batches (possible only when the
    * admission policy is bypassed) stay separate reps until
    * [[compactMinhashIndex]] folds them. */
  def appendMinhashIndex(docs: DataFrame, indexPath: String,
      batchId: Long): Unit = {
    require(batchId >= 0 && batchId < RegistryBatch,
      s"batchId must be in [0, $RegistryBatch) (negative ids are reserved " +
        s"for the base, $RegistryBatch for the takedown registry lane), " +
        s"got $batchId")
    val spark = docs.sparkSession
    val phys = graft.ops.Layout.beginBatchCommit(spark, indexPath, batchId)
    // a recovery delivery smaller than the crashed attempt must REPLACE
    // its partials, not inherit them (Layout.clearPhysicalDelivery doc)
    graft.ops.Layout.clearPhysicalDelivery(spark, indexPath, phys)
    writeIndexDelta(docs, indexPath, phys, dynamic = true)
    graft.ops.Layout.finishBatchCommit(spark, indexPath, phys)
  }

  /** The full ADMISSION transaction — probe, decide, append, and LOG, all
    * under ONE batch commit: delta docs near-dupping the indexed corpus
    * are rejected, survivors' bands/shingles/members land under the
    * delivery's physical partition, and a per-source
    * (n_admitted, n_rejected, n_skipped) row set lands in the `admissions` table
    * under the SAME partition — so the atomic manifest swap publishes the
    * decision and its audit record together (a crash between them cannot
    * leave an admitted batch with no report, or a report for an invisible
    * batch), and a replayed delivery rewrites both byte-identically (the
    * probe excludes the batch's own logical id — [[probeMinhashDupDeltaIds]]).
    * This is what a crawl-ingest run actually executes; q184 is its
    * decision arithmetic under the oracle, [[graft.streaming.StreamOps
    * .minhashAdmissionStream]] drives it per micro-batch. */
  def admitIntoMinhashIndex(spark: org.apache.spark.sql.SparkSession,
      delta: DataFrame, indexPath: String, batchId: Long,
      threshold: Double = 0.8,
      broadcastMaxDocs: Long = DefaultProbeBroadcastMaxDocs,
      broadcastMaxCandidatePairs: Long =
        DefaultProbeBroadcastMaxCandidatePairs,
      registryBroadcastMaxRows: Long = DefaultRegistryBroadcastMaxRows)
      : Unit = {
    require(batchId >= 0 && batchId < RegistryBatch,
      s"batchId must be in [0, $RegistryBatch) (negative ids are reserved " +
        s"for the base, $RegistryBatch for the takedown registry lane), " +
        s"got $batchId")
    // ONE shingle/band pass over the delta, shared by probe and append:
    // the probe core checkpoints the delta-derived frames, so the survivor
    // writes below reuse them instead of re-tokenizing the batch
    val vis = excludedVis(spark, indexPath, Some(batchId))
    val pf =
      probeCore(spark, delta, indexPath, threshold, vis, materialize = true,
        broadcastMaxDocs, broadcastMaxCandidatePairs)
    val (dMembers, newBands, newSets, small) =
      (pf.dMembers, pf.newBands, pf.newSets, pf.smallDelta)
    // groups admit or reject ATOMICALLY (exact-dup members share their
    // rep's pairs), so the decision is rep-level; eager-checkpointing it
    // severs the last read of the index files the append overwrites
    val dupReps = pf.repPairs.select(col("rep_new").as("rep")).distinct()
      .localCheckpoint()
    // TAKEDOWN REGISTRY + near-copy QUARANTINE consult (sized per lane —
    // [[blockedRepsForDelta]]): delta groups whose content key matches a
    // destroyed doc's, or that near-dup a quarantined victim at the
    // admission threshold, are REFUSED outright — a re-crawled or
    // paraphrased copy of taken-down content must not re-enter the index,
    // or DELETE FROM LAYOUT's legal guarantee evaporates at the next
    // crawl batch. The decision is rep-level like the dup decision (every
    // group member shares the rep's text, hence its key/fingerprints);
    // the registry lives in its own reserved batch lane (never this
    // batch's logical id, so the replay seam cannot hide it). Blocked
    // takes precedence over rejected: content under a takedown is refused
    // as taken down even when copies of it still survive in the index (a
    // partial-group takedown).
    val blockedReps = blockedRepsForDelta(spark, indexPath, newBands,
        newSets, threshold, registryBroadcastMaxRows)
      .localCheckpoint()
    val phys = graft.ops.Layout.beginBatchCommit(spark, indexPath, batchId)
    graft.ops.Layout.clearPhysicalDelivery(spark, indexPath, phys)
    val keepRep = dupReps.select(col("rep").as("doc_id"))
      .unionByName(blockedReps.select(col("rep").as("doc_id")))
    def put(df: DataFrame, table: String): Unit =
      graft.ops.Layout.withIdBloom(
          df.withColumn("batch_id", lit(phys)).write.mode("overwrite"),
          (if (table == "members") Seq("doc_id", "rep")
           else if (table == "admissions") Nil
           else Seq("doc_id")): _*)
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(s"$indexPath/$table")
    put(newBands.join(keepRep, Seq("doc_id"), "left_anti")
      .sortWithinPartitions("band_idx", "band_hash"), "bands")
    put(newSets.join(keepRep, Seq("doc_id"), "left_anti")
      .sortWithinPartitions("doc_id"), "shingles")
    put(dMembers.join(dupReps, Seq("rep"), "left_anti")
      .join(blockedReps, Seq("rep"), "left_anti"), "members")
    val dupIds = dMembers.join(dupReps, Seq("rep"), "left_semi")
      .select("doc_id")
    val blockedIds = dMembers.join(blockedReps, Seq("rep"), "left_semi")
      .select("doc_id")
    // `batch` rides as a DATA column (not just the partition id):
    // compaction folds the audit into the base partition, and rows must
    // keep saying which admission batch they record — folding them under
    // live logical ids instead would collide with a post-compaction
    // stream's own batch ids in the manifest.
    // FOUR disjoint outcomes per delta doc: ADMITTED (eligible survivor —
    // its bands/shingles/members landed above, so the count equals what
    // the index now protects), REJECTED (near-dupped the corpus),
    // BLOCKED (matched the takedown registry — refused as taken-down
    // content, precedence over rejected), and SKIPPED (fewer than 2
    // tokens — no shingles exist, so the doc is never indexed and NEVER
    // dedup-protected: an exact copy of it in a later batch skips again
    // rather than rejecting; set-Jaccard has no opinion on empty sets,
    // and counting such docs as "admitted" would make the log promise
    // protection the index cannot give).
    val eligIds = dMembers.select("doc_id").withColumn("__elig", lit(true))
    put(delta
      .join(sized(dupIds.withColumn("__dup", lit(true)), small),
        Seq("doc_id"), "left")
      .join(sized(blockedIds.withColumn("__blk", lit(true)), small),
        Seq("doc_id"), "left")
      .join(sized(eligIds, small), Seq("doc_id"), "left")
      .groupBy("source").agg(
        sum(when(col("__dup").isNull && col("__blk").isNull &&
            col("__elig").isNotNull, 1L)
          .otherwise(0L)).as("n_admitted"),
        sum(when(col("__dup").isNotNull && col("__blk").isNull, 1L)
          .otherwise(0L)).as("n_rejected"),
        sum(when(col("__elig").isNull, 1L).otherwise(0L)).as("n_skipped"),
        sum(when(col("__blk").isNotNull, 1L).otherwise(0L)).as("n_blocked"))
      .withColumn("batch", lit(batchId))
      .coalesce(1), // sources-sized
      "admissions")
    graft.ops.Layout.finishBatchCommit(spark, indexPath, phys)
    // bound executor storage across a long-running admission stream: the
    // probe frames were checkpointed for reuse WITHIN this transaction;
    // retire their blocks now (the connectedComponents discipline)
    Seq(dMembers, newBands, newSets, pf.candidates, dupReps, blockedReps)
      .foreach(freeCheckpoint)
  }

  /** The admission transaction's standing-obligation consult: delta REPS
    * whose content key matches the takedown registry (exact re-crawls of
    * destroyed content) plus, when a takedown ran with `nearCopyBlock`,
    * reps that LSH-collide with the QUARANTINED victims' bands and verify
    * against their shingle sets at the admission threshold (paraphrased
    * re-uploads). `newBands` / `newSets` are the delta reps' band and
    * shingle-set frames (the probe core's one tokenize pass — the
    * transaction reuses its checkpoints here). Returned LAZY; the
    * transaction checkpoints it once.
    *
    * SIZED like every other consult in this file, NOT broadcast
    * unconditionally: "registry-sized — legal-process scale" is the
    * common case, not a bound — one whole-source legal recall (the 10^7-
    * victim case [[graft.ops.Layout]]'s victim-frame tier anticipates)
    * quarantines 10^7 docs' band rows and full shingle arrays, tens of
    * GB that would OOM every executor at exactly the scale the feature
    * exists for. So each lane's committed row count (one lane-sized
    * parquet count, O(lane files) footer reads) decides broadcast vs
    * shuffled-hash PER LANE against `registryBroadcastMaxRows`: under
    * budget the lane broadcasts and the delta streams map-side (the
    * design-intent plan for takedown-request-sized lanes), over it the
    * exact consult becomes a shuffled semi-join on the content key and
    * the quarantine probe a shuffled band-join + shuffled verify.
    * Strategy moves, the blocked set does not (spec-pinned, the
    * [[probeCore]] degrade discipline). */
  private[llm] def blockedRepsForDelta(
      spark: org.apache.spark.sql.SparkSession, indexPath: String,
      newBands: DataFrame, newSets: DataFrame, threshold: Double,
      registryBroadcastMaxRows: Long = DefaultRegistryBroadcastMaxRows)
      : DataFrame = {
    val registry = takedownRegistry(spark, indexPath)
    val regSmall = withinBudget(registry, registryBroadcastMaxRows)
    val exactBlocked = newSets
      .select(col("doc_id").as("rep"),
        contentKey(col("shingle_set")).as("__ck"))
      .join(sized(registry.select(col("content_key").as("__ck")).distinct(),
          regSmall),
        Seq("__ck"), "left_semi")
      .select("rep")
    val nearBlocked =
      (laneTable(spark, indexPath, "takedowns_bands"),
        laneTable(spark, indexPath, "takedowns_shingles")) match {
        case (Some(qb), Some(qs)) =>
          val qbSmall = withinBudget(qb, registryBroadcastMaxRows)
          val qsSmall = withinBudget(qs, registryBroadcastMaxRows)
          val cand = newBands
            .join(sized(qb.select(col("doc_id").as("__qrep"),
              col("band_idx"), col("band_hash")), qbSmall),
              Seq("band_idx", "band_hash"))
            .select(col("doc_id").as("rep"), col("__qrep"))
            .distinct()
          Some(cand
            .join(newSets.select(col("doc_id").as("rep"),
              col("shingle_set").as("__sh_new")), Seq("rep"))
            .join(sized(qs.select(col("doc_id").as("__qrep"),
              col("shingle_set").as("__sh_q")), qsSmall), Seq("__qrep"))
            .select(col("rep"),
              graft.expr.ThresholdedIntersectCount(col("__sh_new"),
                col("__sh_q"),
                graft.expr.ThresholdedIntersectCount.jaccardBound(
                  size(col("__sh_new")) + size(col("__sh_q")),
                  threshold)).as("__icnt"),
              (size(col("__sh_new")) + size(col("__sh_q"))).as("__nsum"))
            .filter(col("__icnt").cast("double") /
              (col("__nsum") - col("__icnt")).cast("double") >=
              lit(threshold))
            .select("rep").distinct())
        case _ => None
      }
    nearBlocked.fold(exactBlocked)(nb =>
      exactBlocked.unionByName(nb).distinct())
  }

  /** Release a localCheckpoint's executor blocks (the checkpointed frame
    * is a LogicalRDD over a persisted internal RDD — unpersist it). */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** The committed admission audit: one (batch, source, n_admitted,
    * n_rejected, n_skipped) row per source per COMMITTED admission batch —
    * exactly the decisions the visible index reflects, because log and
    * index swap in together ([[admitIntoMinhashIndex]]); n_admitted counts
    * INDEXED survivors only, n_skipped the sub-2-token docs the index can
    * never protect. `asOfVersion` reads the log AS OF a past manifest
    * version (same refusal contract as the probe's time travel — the log
    * and the index share one manifest, so the pair is always consistent).
    * Logs written before the n_skipped column read it as 0 (nothing was
    * skipped-and-counted back then; the column is additive). */
  def admissionLog(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, asOfVersion: Option[Long] = None): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/admissions")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      // a base-built root that never admitted: an empty log, not a 404 —
      // but an explicit as_of must still validate against the catalog
      // (unknown/vacuumed versions refuse even when the log is empty)
      asOfVersion.foreach(_ =>
        graft.ops.Layout.committedBatchFilterAt(spark, indexPath,
          asOfVersion))
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("batch", LongType),
          StructField("source", StringType),
          StructField("n_admitted", LongType),
          StructField("n_rejected", LongType),
          StructField("n_skipped", LongType),
          StructField("n_blocked", LongType))))
    } else {
      // mergeSchema: a root upgraded mid-life has PRE-n_skipped (and
      // pre-n_blocked) parquet files next to new ones; without it the
      // schema is inferred from whichever file wins — old winner silently
      // zeroes NEW rows' columns, new winner surfaces NULLs that NPE in
      // getLong callers. Merged, old rows carry NULL in the new columns;
      // coalesce restores the "nothing was counted back then" semantics.
      val raw = spark.read.option("mergeSchema", "true")
        .parquet(s"$indexPath/admissions")
        .filter(graft.ops.Layout.committedBatchFilterAt(spark, indexPath,
          asOfVersion))
      val filled = Seq("n_skipped", "n_blocked").foldLeft(raw) { (df, c) =>
        if (df.columns.contains(c))
          df.withColumn(c, coalesce(col(c), lit(0L)))
        else df.withColumn(c, lit(0L))
      }
      // `batch` is a data column: live rows carry their admission batch,
      // compacted rows (folded under batch_id=-1) keep saying which
      // batch they recorded
      filled.select(col("batch"), col("source"), col("n_admitted"),
        col("n_rejected"), col("n_skipped"), col("n_blocked"))
    }
  }

  /** The memoized takedown-registry root — corpus (doc_id % 10 != 0)
    * base build, the q189 victim class (% 17 == 5) DELETED (which
    * registers their content keys), then a delta of the natural
    * (% 10 == 0) docs plus exact re-crawls of every victim under fresh
    * ids admitted as logical batch 0 — so the committed admission log
    * carries all four outcomes including n_blocked. Built once per
    * (session, dir); shared by q193 and `GET /takedowns`. */
  def registryMart(spark: org.apache.spark.sql.SparkSession,
      dir: String, nearCopyBlock: Boolean = false): String = {
    val suffix = if (nearCopyBlock) "near_" else ""
    val base = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
      s"/graft_mhreg_$suffix" + graft.sec.SecDerive.pathKey(dir)
    graft.sec.SecDerive.cachedCount(spark, dir,
        s"minhash_registry_$suffix") {
      val docs = graft.Tables.documents(spark, dir)
      val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      writeMinhashIndex(corpus, base)
      val victims = corpus.filter(pmod(col("doc_id"), lit(17)) === 5)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      deleteDocsFromMinhashIndex(spark, base, victims, nearCopyBlock)
      val recrawl = docs
        .filter(pmod(col("doc_id"), lit(10)) =!= 0 &&
          pmod(col("doc_id"), lit(17)) === 5)
        .withColumn("doc_id", col("doc_id") + lit(100000000L))
      admitIntoMinhashIndex(spark,
        docs.filter(pmod(col("doc_id"), lit(10)) === 0)
          .unionByName(recrawl),
        base, batchId = 0L, threshold = 0.8)
      1L
    }
    base
  }

  /** The memoized admission-demo root — corpus (doc_id % 10 != 0) base
    * build + the delta (doc_id % 10 == 0) admitted as logical batch 0 —
    * built once per (session, dir) on first use, the ahashIndexMart
    * discipline (its own root: the dedup index lives apart from the
    * text/vector serving root). Shared by q186 and `GET /admissions`. */
  def admissionMart(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val base = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
      "/graft_mhadmit_" + graft.sec.SecDerive.pathKey(dir)
    graft.sec.SecDerive.cachedCount(spark, dir, "minhash_admit_log") {
      val docs = graft.Tables.documents(spark, dir)
      writeMinhashIndex(docs.filter(pmod(col("doc_id"), lit(10)) =!= 0), base)
      admitIntoMinhashIndex(spark,
        docs.filter(pmod(col("doc_id"), lit(10)) === 0), base,
        batchId = 0L, threshold = 0.8)
      1L
    }
    base
  }

  private def writeIndexDelta(docs: DataFrame, indexPath: String,
      phys: Long, dynamic: Boolean): Unit = {
    val eligible = eligibleDocs(docs)
    // two consumers (rep semi-join + members table): checkpoint the
    // narrow (doc_id, rep) frame, not the text-carrying eligible scan
    val members = exactGroupsOf(eligible).localCheckpoint(false)
    val reps = eligible.join(
      members.filter(col("doc_id") === col("rep")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    def put(df: DataFrame, table: String): Unit = {
      // identity-column blooms: free while dictionary-encoded, the skip
      // structure for takedown victim scans at fallback NDV (Layout doc)
      val idCols = if (table == "members") Seq("doc_id", "rep")
        else Seq("doc_id")
      val w = graft.ops.Layout.withIdBloom(
        df.withColumn("batch_id", lit(phys))
          .write.mode("overwrite"), idCols: _*)
        .partitionBy("batch_id")
      // base build: static overwrite replaces the whole table dir (a fresh
      // index must not inherit stale appended partitions); delta: dynamic
      // overwrite touches only this delivery's partition
      (if (dynamic) w.option("partitionOverwriteMode", "dynamic") else w)
        .parquet(s"$indexPath/$table")
    }
    put(bandsOf(reps).sortWithinPartitions("band_idx", "band_hash"), "bands")
    put(shingleSetsOf(reps).sortWithinPartitions("doc_id"), "shingles")
    put(members, "members")
    // all three writes are done — retire the checkpoint's executor blocks
    // now instead of waiting for ContextCleaner GC (a long-lived driver
    // appending batches in a loop would otherwise accumulate them)
    freeCheckpoint(members)
  }

  /** Near-dup pairs between a NEW delta and the indexed corpus, without
    * recomputing anything corpus-sized: under the broadcast budget
    * ([[DefaultProbeBroadcastMaxDocs]]) the delta's bands/shingles are
    * BROADCAST and the index scans stream map-side — no corpus shuffle,
    * no corpus signature recompute; a delta past the budget (a whole
    * crawl day probed at once) degrades every delta-side join to a
    * shuffled hash join instead of an oversized broadcast. Exactness law
    * (spec-pinned): probe(delta, index(old)) == the cross (old × new)
    * subset of `minhashNearDupPairs(old ∪ delta)` — sound because a doc's
    * bands and shingle set depend only on its own text. Output
    * (doc_id_a, doc_id_b, jaccard) with a < b, the q21 convention.
    *
    * Degenerate-duplication guard: both sides are collapsed to exact-text
    * REPS before banding (index-side at write time, delta-side here), so
    * the candidate broadcast and the shingle verify scale with DISTINCT
    * texts, not crawl multiplicity — a band bucket holding 10^4 identical
    * template-spam docs is one index row, and the member-level pairs are
    * recovered by two output-sized expansion joins at the end. Snapshot
    * discipline: all three index reads filter through ONE manifest
    * resolution (`vis`), so a concurrent append can never serve a torn
    * bands/shingles/members mix. `asOfVersion` probes the index at a
    * PAST manifest version (time travel — unknown/vacuumed versions
    * refuse, the committedBatchFilterAt contract), completing the
    * BM25/IVFADC/aHash lifecycle parity. */
  def probeMinhashIndex(spark: org.apache.spark.sql.SparkSession,
      newDocs: DataFrame, indexPath: String,
      threshold: Double = 0.8,
      asOfVersion: Option[Long] = None,
      broadcastMaxDocs: Long = DefaultProbeBroadcastMaxDocs,
      broadcastMaxCandidatePairs: Long =
        DefaultProbeBroadcastMaxCandidatePairs,
      knownDeltaDocs: Option[Long] = None,
      excludeLogicalBatch: Option[Long] = None): DataFrame = {
    // excludeLogicalBatch: the replay seam (probeMinhashDupDeltaIds
    // contract) for streaming consumers that pair-probe their own batch
    // after a crash-replayed admission — composes with as-of time travel
    val vis0 = graft.ops.Layout.committedBatchFilterAt(spark, indexPath,
      asOfVersion)
    val vis = excludeLogicalBatch.fold(vis0)(lb =>
      vis0 && graft.ops.Layout.logicalBatch(col("batch_id")) =!= lit(lb))
    val pf = probeCore(spark, newDocs,
      indexPath, threshold, vis, materialize = false, broadcastMaxDocs,
      broadcastMaxCandidatePairs, knownDeltaDocs)
    val idxMembers = spark.read.parquet(s"$indexPath/members").filter(vis)
      .select(col("doc_id").as("doc_id_old"), col("rep").as("rep_old"))
    val dMem = pf.dMembers
      .select(col("doc_id").as("doc_id_new"), col("rep").as("rep_new"))
    idxMembers
      // repPairs is pair-set sized: its broadcast rides the measured
      // candidate budget, not just the delta-doc budget
      .join(sized(pf.repPairs, pf.smallVerify), "rep_old")
      .join(sized(dMem, pf.smallDelta), "rep_new")
      .select(least(col("doc_id_old"), col("doc_id_new")).as("doc_id_a"),
        greatest(col("doc_id_old"), col("doc_id_new")).as("doc_id_b"),
        col("jaccard"))
  }

  /** Delta doc_ids that near-dup the indexed corpus — the ADMISSION
    * rejection set, O(delta) end to end: rep pairs are resolved once and
    * only the DELTA side expands through its membership; the index's
    * members table is never scanned (a full-pair expansion is output-
    * sized in the corpus's dup multiplicity, which an admission decision
    * does not need). Same pair semantics as [[probeMinhashIndex]]:
    * a delta doc is rejected iff it pairs with an INDEXED doc at
    * jaccard >= threshold — within-delta duplication alone never
    * rejects.
    *
    * `excludeLogicalBatch` is the REPLAY seam for streaming admission
    * ([[graft.streaming.StreamOps.minhashAdmissionStream]]): a re-driven
    * micro-batch probes an index that already holds its own first
    * delivery's survivors, which would self-match at jaccard 1.0 and
    * shrink the re-committed survivor set — excluding the batch's own
    * logical id makes the replayed probe see exactly the pre-delivery
    * snapshot, so replay == once. */
  def probeMinhashDupDeltaIds(spark: org.apache.spark.sql.SparkSession,
      newDocs: DataFrame, indexPath: String,
      threshold: Double = 0.8,
      excludeLogicalBatch: Option[Long] = None,
      broadcastMaxDocs: Long = DefaultProbeBroadcastMaxDocs,
      broadcastMaxCandidatePairs: Long =
        DefaultProbeBroadcastMaxCandidatePairs,
      knownDeltaDocs: Option[Long] = None): DataFrame = {
    val pf = probeCore(spark, newDocs,
      indexPath, threshold,
      excludedVis(spark, indexPath, excludeLogicalBatch),
      materialize = false, broadcastMaxDocs,
      broadcastMaxCandidatePairs, knownDeltaDocs)
    // distinct rep_new is DELTA-bounded (≤ delta reps) even when the
    // pair set itself blew the candidate budget
    pf.dMembers.join(
        sized(pf.repPairs.select(col("rep_new").as("rep")).distinct(),
          pf.smallDelta),
        Seq("rep"), "left_semi")
      .select("doc_id")
  }

  /** The committed-snapshot predicate, optionally excluding one logical
    * batch's deliveries — the admission-replay seam. logicalBatch(-1) =
    * -1: the always-visible base partition never matches an excluded id
    * (appends require batchId >= 0). */
  private def excludedVis(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, excludeLogicalBatch: Option[Long])
      : org.apache.spark.sql.Column = {
    val base = graft.ops.Layout.committedBatchFilter(spark, indexPath)
    excludeLogicalBatch.fold(base)(lb =>
      base && graft.ops.Layout.logicalBatch(col("batch_id")) =!= lit(lb))
  }

  /** Shared probe core: REP-level cross pairs (rep_old, rep_new, jaccard)
    * at >= threshold, plus the delta-derived frames (membership, rep
    * bands, rep shingle sets) and the SIZING decision (`small`) the
    * callers reuse for their own delta-side joins. `vis` is the caller's
    * single manifest resolution, applied to every index read.
    * `materialize` checkpoints the delta frames (all delta-rep-sized) —
    * the admission transaction sets it so the survivor APPEND reuses the
    * probe's one shingle/band pass instead of re-tokenizing the batch,
    * and frees the blocks when the transaction closes. Plain probes skip
    * the checkpoints entirely: their result is returned LAZY, so a
    * checkpoint would pin executor blocks until ContextCleaner GC (the
    * long-lived-driver leak); recomputing the delta-sized exact-group
    * window per consumer is the cheaper trade.
    *
    * The delta sizing count is `knownDeltaDocs` when the caller already
    * knows its batch size (the streaming admission path — skips the
    * count action entirely), else `dMembers.count()` when the frame is
    * already checkpointed (free), else a raw `newDocs.count()` — a
    * conservative upper bound (docs >= eligible >= reps), so an
    * over-estimate degrades to a shuffle, never to an oversized
    * broadcast. The CANDIDATE count (`smallVerify`) is measured only
    * when the delta qualified: it bounds the pair-set-sized frames the
    * delta budget cannot (one hot delta text band-colliding with many
    * distinct corpus texts). */
  private def probeCore(spark: org.apache.spark.sql.SparkSession,
      newDocs: DataFrame, indexPath: String, threshold: Double,
      vis: org.apache.spark.sql.Column, materialize: Boolean,
      broadcastMaxDocs: Long,
      broadcastMaxCandidatePairs: Long = DefaultProbeBroadcastMaxCandidatePairs,
      knownDeltaDocs: Option[Long] = None): ProbeFrames = {
    def keep(df: DataFrame): DataFrame =
      if (materialize) df.localCheckpoint(false) else df
    val eligible = eligibleDocs(newDocs)
    val dMembers = keep(exactGroupsOf(eligible))
    val small = knownDeltaDocs match {
      case Some(n) => n <= broadcastMaxDocs
      case None => withinBudget(
        if (materialize) dMembers else newDocs, broadcastMaxDocs)
    }
    val dReps = eligible.join(
      dMembers.filter(col("doc_id") === col("rep")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val newBands = keep(bandsOf(dReps))
    val newSets = keep(shingleSetsOf(dReps))
    val idxBands = spark.read.parquet(s"$indexPath/bands").filter(vis)
    val sizedBands = sized(newBands, small)
    val candidates = keep(idxBands.join(sizedBands,
        idxBands("band_idx") === sizedBands("band_idx") &&
          idxBands("band_hash") === sizedBands("band_hash"))
      .select(idxBands("doc_id").as("rep_old"),
        sizedBands("doc_id").as("rep_new"))
      .distinct())
    // the pair-set guard: only priced when the broadcast tier is on the
    // table at all; over budget the verify join flips to shuffled-hash
    // with candidates as the build side (identical pairs, spec-pinned)
    val smallVerify =
      small && withinBudget(candidates, broadcastMaxCandidatePairs)
    val idxSets = spark.read.parquet(s"$indexPath/shingles").filter(vis)
      .select(col("doc_id").as("rep_old"), col("shingle_set").as("sh_old"))
    val deltaSets = newSets
      .select(col("doc_id").as("rep_new"), col("shingle_set").as("sh_new"))
    val repPairs = idxSets
      .join(sized(candidates, smallVerify), "rep_old") // index streams map-side
      .join(sized(deltaSets, small), "rep_new")
      .select(col("rep_old"), col("rep_new"),
        graft.expr.ThresholdedIntersectCount(col("sh_old"), col("sh_new"),
          graft.expr.ThresholdedIntersectCount.jaccardBound(
            size(col("sh_old")) + size(col("sh_new")), threshold)).as("icnt"),
        (size(col("sh_old")) + size(col("sh_new"))).as("nsum"))
      .select(col("rep_old"), col("rep_new"),
        (col("icnt").cast("double") / (col("nsum") - col("icnt")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
    ProbeFrames(repPairs, dMembers, newBands, newSets, candidates,
      small, smallVerify)
  }

  /** Offline compaction of a [[writeMinhashIndex]] layout into the
    * reserved `batch_id=-1` base of a FRESH root (`outBase`) — the
    * compactIvfadcIndex doctrine: compacting the live dir in place would
    * break the batch_id layout the append idempotence rests on; swap-in
    * is the caller's publish-by-rename. Probe-identical (spec-pinned),
    * and it closes the one collapse gap appends leave open: per-batch
    * collapse cannot see exact dups ACROSS deliveries, so here reps with
    * IDENTICAL shingle sets fold to one super-rep (sound for probe
    * semantics — bands and Jaccard are functions of the shingle set
    * alone) and their members re-point. Scale shape: one groupBy on the
    * shingle-set key over the reps table (reps-sized, not corpus-sized),
    * one members-sized re-map join, no text read, nothing recomputed.
    * Returns (input, output) parquet file counts across the three
    * tables. */
  def compactMinhashIndex(spark: org.apache.spark.sql.SparkSession,
      inBase: String, outBase: String): (Long, Long) = {
    graft.ops.Layout.resetCommitLog(spark, outBase) // fresh-root semantics
    val vis = graft.ops.Layout.committedBatchFilter(spark, inBase)
    val sh = spark.read.parquet(s"$inBase/shingles").filter(vis)
      .select("doc_id", "shingle_set")
    val supers = sh.groupBy("shingle_set").agg(min("doc_id").as("srep"))
      .localCheckpoint(false) // consumed by repMap and the shingles write
    val repMap = sh.join(supers, "shingle_set")
      .select(col("doc_id").as("rep"), col("srep"))
      .localCheckpoint(false)
    def put(df: DataFrame, table: String, sortCols: Seq[String]): Unit =
      graft.ops.Layout.withIdBloom(
          df.sortWithinPartitions(sortCols.map(col): _*)
            .withColumn("batch_id", lit(-1L))
            .write.mode("overwrite"),
          (if (table == "members") Seq("doc_id", "rep")
           else Seq("doc_id")): _*)
        .partitionBy("batch_id")
        .parquet(s"$outBase/$table")
    put(spark.read.parquet(s"$inBase/members").filter(vis)
        .select("doc_id", "rep").join(repMap, "rep")
        .select(col("doc_id"), col("srep").as("rep")),
      "members", Seq("rep"))
    put(supers.select(col("srep").as("doc_id"), col("shingle_set")),
      "shingles", Seq("doc_id"))
    put(spark.read.parquet(s"$inBase/bands").filter(vis)
        .select("doc_id", "band_idx", "band_hash")
        .join(repMap.filter(col("rep") === col("srep"))
          .select(col("rep").as("doc_id")), Seq("doc_id"), "left_semi"),
      "bands", Seq("band_idx", "band_hash"))
    // carry the committed admission AUDIT across the fold — compaction
    // must not erase the per-batch decision history the exactly-once
    // admission exists to preserve. The rows FOLD INTO THE BASE partition
    // (their `batch` data column keeps saying which admission batch each
    // records): keeping live batch_id partitions instead would (a) make
    // the batch-0 stale guard refuse a fresh admission stream over the
    // compacted root — with "compact into a fresh root" as the error's
    // own, now-circular remedy — and (b) collide in the manifest with a
    // post-compaction stream's own logical batch ids, silently hiding
    // history. A stale admissions dir in a REUSED outBase is removed
    // either way (the writeMinhashIndex rebuild rule: a fresh root must
    // not resurrect some other index's audit).
    val admOut = new org.apache.hadoop.fs.Path(s"$outBase/admissions")
    val admFs = admOut.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (admFs.exists(admOut)) { admFs.delete(admOut, true); () }
    val admIn = new org.apache.hadoop.fs.Path(s"$inBase/admissions")
    if (admIn.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(admIn)) {
      spark.read.parquet(s"$inBase/admissions").filter(vis)
        .drop("batch_id").withColumn("batch_id", lit(-1L))
        .coalesce(1)
        .write.mode("overwrite").partitionBy("batch_id")
        .parquet(s"$outBase/admissions")
    }
    // the takedown REGISTRY (and its near-copy quarantine) ride
    // compaction the same way the audit does — a compacted index stays
    // bound by every standing takedown, or the fold would silently
    // re-open re-admission. They keep their reserved lane (never fold to
    // the base): a later takedown on the compacted root supersedes the
    // lane in place, exactly as on the original root. The gen-0 lane
    // physical is backfilled into the fresh manifest by initCommitLog's
    // directory walk below.
    Seq("takedowns", "takedowns_bands", "takedowns_shingles").foreach { t =>
      val out = new org.apache.hadoop.fs.Path(s"$outBase/$t")
      val ofs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (ofs.exists(out)) { ofs.delete(out, true); () }
      val in = new org.apache.hadoop.fs.Path(s"$inBase/$t")
      if (in.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(in)) {
        spark.read.parquet(s"$inBase/$t").filter(vis)
          .drop("batch_id")
          .withColumn("batch_id",
            lit((RegistryBatch + 1) * graft.ops.Layout.GenStride))
          .coalesce(1)
          .write.mode("overwrite").partitionBy("batch_id")
          .parquet(s"$outBase/$t")
      }
    }
    graft.ops.Layout.initCommitLog(spark, outBase)
    def nFiles(base: String): Long =
      Seq("bands", "shingles", "members").map { t =>
        Selection.countParquetFiles(spark, s"$base/$t")
      }.sum
    (nFiles(inBase), nFiles(outBase))
  }

  /** Row-level DELETE (takedown) from a [[writeMinhashIndex]] layout: the
    * doc_id set vanishes from `members`, and the rep-keyed `bands` /
    * `shingles` rows follow the group algebra — a deleted rep whose
    * exact-text group has SURVIVING members re-elects the minimum
    * surviving member (sound without recomputing anything: every member
    * shares the rep's normalized text, so the bands and shingle set are
    * the new rep's own); a group whose members all die erases its
    * bands/shingles rows outright. Post-delete probes are therefore
    * pair-identical to an index built from scratch without the victims
    * (q189's oracle pins it) — the fresh build's rep election is the
    * same min-surviving-doc rule.
    *
    * Mechanism ([[graft.ops.Layout.takedownRewrite]]): only the AFFECTED
    * deliveries rewrite — the batches holding victim member rows,
    * re-pointed group memberships, or the deleted reps' bands/shingles
    * (found by victim-pushed scans; victim lists are takedown-request
    * sized, so the isin predicates push into parquet and the remap
    * frames broadcast). The whole multi-batch result swaps in as ONE
    * manifest version, then the mandatory vacuum destroys every
    * pre-delete delivery and retires every pre-delete manifest: as-of
    * reads of pre-delete versions refuse, because a legal delete that
    * stays time-travelable is not a delete. The committed `admissions`
    * audit rides through affected rewrites unchanged — the log records
    * DECISIONS made at admission time, which a later takedown does not
    * falsify. */
  /** `nearCopyBlock = true` additionally QUARANTINES the victim groups'
    * LSH bands and verify shingle sets in the registry lane
    * (`takedowns_bands` / `takedowns_shingles` — still one-way 60-bit
    * hashes, no recoverable text), so the admission transaction refuses
    * not just exact re-crawls but NEAR COPIES of taken-down content at
    * the admission threshold — a paraphrased re-upload whose only
    * near-dup partners were the deleted docs would otherwise sail back
    * in. Off by default: the exact-key registry is the minimal standing
    * obligation; quarantining richer fingerprints is the caller's
    * explicit escalation (q197 runs it; q193 pins the default). Existing
    * quarantine rows ALWAYS carry forward regardless of the flag — each
    * takedown supersedes the whole lane delivery. */
  def deleteDocsFromMinhashIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, docIds: Seq[Long],
      nearCopyBlock: Boolean = false,
      laneMaxRowsPerFile: Long = DefaultRegistryLaneMaxRowsPerFile)
      : graft.ops.Layout.TakedownReport = {
    require(docIds.nonEmpty, "empty takedown set")
    // optimistic concurrency (Layout.takedownWithRetry): discovery pins
    // the manifest version it scanned; a concurrent commit refuses the
    // swap and the WHOLE discovery re-runs over the advanced snapshot
    graft.ops.Layout.takedownWithRetry(spark, indexPath)(observed =>
      deleteDocsFromMinhashIndexOnce(spark, indexPath, docIds.distinct,
        observed, nearCopyBlock, laneMaxRowsPerFile))
  }

  private def deleteDocsFromMinhashIndexOnce(
      spark: org.apache.spark.sql.SparkSession, indexPath: String,
      victims: Seq[Long], observedVersion: Option[Long],
      nearCopyBlock: Boolean, laneMaxRowsPerFile: Long)
      : graft.ops.Layout.TakedownReport = {
    val vis = graft.ops.Layout.committedBatchFilter(spark, indexPath)
    val members = spark.read.parquet(s"$indexPath/members").filter(vis)
    // victim membership: which groups are touched (≤ |victims| rows)
    val vm = members.filter(col("doc_id").isin(victims: _*))
      .select("doc_id", "rep").collect()
    if (vm.isEmpty)
      return graft.ops.Layout.TakedownReport("minhash", 0L, 0L, 0L)
    val victimSet = victims.toSet
    val deletedReps = vm.map(_.getLong(1)).toSet.intersect(victimSet).toSeq
    // re-election: min SURVIVING member per deleted rep (per-rep agg of a
    // rep-pushed scan; output ≤ |victims| rows)
    val repRemap: Map[Long, Long] =
      if (deletedReps.isEmpty) Map.empty
      else members
        .filter(col("rep").isin(deletedReps: _*) &&
          !col("doc_id").isin(victims: _*))
        .groupBy("rep").agg(min("doc_id").as("new_rep"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val erasedReps = (deletedReps.toSet -- repRemap.keySet).toSeq
    // affected deliveries: batches with victim member rows or re-pointed
    // memberships, plus the batches holding the deleted reps' bands and
    // shingles (a rep's rows may live in a different delivery than its
    // members' — cross-batch exact dups after compaction folds)
    val memberBatches = members
      .filter(col("doc_id").isin(victims: _*) ||
        (if (deletedReps.isEmpty) lit(false)
         else col("rep").isin(deletedReps: _*)))
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0))
    def repBatches(table: String): Seq[Long] =
      if (deletedReps.isEmpty) Nil
      else spark.read.parquet(s"$indexPath/$table").filter(vis)
        .filter(col("doc_id").isin(deletedReps: _*))
        .select(col("batch_id").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSeq
    val affected = (memberBatches ++ repBatches("bands") ++
      repBatches("shingles")).distinct.sorted
    // REGISTRY delivery: remember WHAT was destroyed (content keys + the
    // victim ids for audit) so [[admitIntoMinhashIndex]] can refuse a
    // re-crawled copy — a takedown is a STANDING obligation, not a
    // one-shot row erase. Keys are captured from the victims' groups'
    // shingle sets BEFORE the rewrite destroys them (every group member
    // shares its rep's text, hence its key); previous registry rows carry
    // forward (each takedown supersedes only the prior registry delivery
    // in the reserved lane), and the whole thing publishes in the SAME
    // manifest swap as the delete below. All frames are victim- or
    // registry-sized.
    val groupReps = vm.map(_.getLong(1)).distinct.toSeq
    val repKeys = spark.read.parquet(s"$indexPath/shingles").filter(vis)
      .filter(col("doc_id").isin(groupReps: _*))
      .select(col("doc_id").as("rep"),
        contentKey(col("shingle_set")).as("content_key"))
    val vmDf = {
      import spark.implicits._
      vm.map(r => (r.getLong(0), r.getLong(1))).toSeq.toDF("doc_id", "rep")
    }
    val regPhys = graft.ops.Layout.beginBatchCommit(spark, indexPath,
      RegistryBatch)
    graft.ops.Layout.clearPhysicalDelivery(spark, indexPath, regPhys)
    def putLane(df: DataFrame, table: String): Unit =
      laneSharded(df, laneMaxRowsPerFile)
        .withColumn("batch_id", lit(regPhys))
        .write.mode("overwrite").partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", laneMaxRowsPerFile)
        .parquet(s"$indexPath/$table")
    putLane(
      takedownRegistry(spark, indexPath)
        .unionByName(vmDf.join(broadcast(repKeys), "rep")
          .select("content_key", "doc_id"))
        .distinct(), // a re-deleted doc registers once
      "takedowns")
    // the near-copy QUARANTINE: victim groups' bands + verify sets, read
    // from the PRE-delete snapshot (the files still exist — this runs
    // before the rewrite). Existing quarantine rows carry forward
    // UNCONDITIONALLY: each takedown supersedes the whole lane delivery,
    // and the vacuum would otherwise reclaim them with it.
    val qNewBands =
      if (nearCopyBlock)
        Some(spark.read.parquet(s"$indexPath/bands").filter(vis)
          .filter(col("doc_id").isin(groupReps: _*))
          .select("doc_id", "band_idx", "band_hash"))
      else None
    val qNewSets =
      if (nearCopyBlock)
        Some(spark.read.parquet(s"$indexPath/shingles").filter(vis)
          .filter(col("doc_id").isin(groupReps: _*))
          .select("doc_id", "shingle_set"))
      else None
    def laneCarry(table: String, cols: Seq[String],
        fresh: Option[DataFrame]): Unit = {
      val old = laneTable(spark, indexPath, table)
        .map(_.select(cols.map(col): _*))
      val merged = (old, fresh) match {
        case (Some(a), Some(b)) => Some(a.unionByName(b).distinct())
        case (a, b) => a.orElse(b)
      }
      merged.foreach(putLane(_, table))
    }
    laneCarry("takedowns_bands", Seq("doc_id", "band_idx", "band_hash"),
      qNewBands)
    laneCarry("takedowns_shingles", Seq("doc_id", "shingle_set"),
      qNewSets)
    val remapDf = broadcast(
      if (repRemap.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("old_rep",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("new_rep",
              org.apache.spark.sql.types.LongType))))
      else {
        import spark.implicits._
        repRemap.toSeq.toDF("old_rep", "new_rep")
      })
    // a rep-keyed row's fate: erased groups drop, re-elected groups
    // rename to the new rep, untouched rows pass through
    def renameOrDrop(df: DataFrame): DataFrame =
      df.filter(if (erasedReps.isEmpty) lit(true)
          else !col("doc_id").isin(erasedReps: _*))
        .join(remapDf, col("doc_id") === col("old_rep"), "left")
        .withColumn("doc_id", coalesce(col("new_rep"), col("doc_id")))
        .drop("old_rep", "new_rep")
    def put(df: DataFrame, table: String, phys: Long): Unit =
      graft.ops.Layout.withIdBloom(
          df.drop("batch_id").withColumn("batch_id", lit(phys))
            .write.mode("overwrite"),
          (if (table == "members") Seq("doc_id", "rep")
           else if (table == "admissions") Nil
           else Seq("doc_id")): _*)
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(s"$indexPath/$table")
    val reclaimed = graft.ops.Layout.takedownRewrite(spark, indexPath,
        affected, extraDeliveries = Seq(regPhys),
        expectedVersion = observedVersion) { (oldPhys, newPhys) =>
      def delivery(table: String): Option[DataFrame] =
        graft.ops.Layout.readDeliveryRows(spark, s"$indexPath/$table",
          "", oldPhys)
      delivery("bands").foreach(df => put(
        renameOrDrop(df).sortWithinPartitions("band_idx", "band_hash"),
        "bands", newPhys))
      delivery("shingles").foreach(df => put(
        renameOrDrop(df).sortWithinPartitions("doc_id"),
        "shingles", newPhys))
      delivery("members").foreach { df =>
        put(df.filter(!col("doc_id").isin(victims: _*))
          .join(remapDf, col("rep") === col("old_rep"), "left")
          .withColumn("rep", coalesce(col("new_rep"), col("rep")))
          .drop("old_rep", "new_rep"),
          "members", newPhys)
      }
      // the audit rides through unchanged — decisions are history
      delivery("admissions").foreach(df =>
        put(df.coalesce(1), "admissions", newPhys))
    }
    graft.ops.Layout.TakedownReport("minhash", vm.length.toLong,
      affected.size.toLong, reclaimed)
  }

  /** Connected components over the near-dup pair graph — the step that turns
    * pairwise matches into DEDUP DECISIONS: docs in one component are copies
    * of each other; the canonical survivor is the minimum doc id.
    *
    * Algorithm: iterative min-label propagation (each round every node takes
    * the min label among itself and its neighbors), the standard
    * DataFrame-native CC formulation. Each round is one join + one
    * aggregation, both shuffling on the node id — no driver-side graph state;
    * the per-round `count` action (convergence test) is a distributed
    * aggregate. Rounds needed = graph diameter; near-dup components are
    * near-cliques (diameter ~1-2, LSH pairs are mutually similar), so this
    * converges in 2-3 rounds. A corpus with long chain-shaped components
    * would want the alternating large-star/small-star variant (Kiveris et al.,
    * "Connected Components in MapReduce", SoCC'14) — same building blocks,
    * O(log^2 n) rounds.
    *
    * `localCheckpoint` per round truncates the growing lineage — without it
    * round k re-executes all k-1 previous joins AND the pair generation.
    * Each round's checkpoint blocks are unpersisted as soon as the next
    * round's are materialized (and `edges`' before returning) — otherwise
    * executor storage grows linearly in round count and the blocks outlive
    * the call.
    *
    * The per-round checkpoint is the STATS-FREE variant
    * ([[org.apache.spark.sql.GraftSqlBridge.localCheckpointNoStats]]):
    * `Dataset.localCheckpoint` copies the origin plan's statistics onto the
    * checkpointed frame, and because each round's plan references the
    * previous label table more than once, the carried BigInt `sizeInBytes`
    * SQUARES per round — its bit length doubles, and past ~16 rounds the
    * driver drowns in `BigInteger.multiply` inside join estimation (round
    * wall doubles at constant data; a drift-chain graph needing 20+ rounds
    * "hangs"). Short-converging near-clique graphs never reached the wall,
    * which is why this stayed latent for twelve rounds.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxRounds: Int = 20): DataFrame = {
    // Free a localCheckpoint's executor blocks: the checkpointed Dataset is a
    // LogicalRDD over the persisted internal RDD — unpersist that RDD.
    def free(df: DataFrame): Unit =
      df.queryExecution.analyzed.foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false)
        case _ => ()
      }
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val nbrMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min("label").as("nbr_min"))
      // Carry the previous label through the checkpoint so convergence is a
      // cheap scan of the just-materialized blocks, not an extra join+shuffle.
      val next = org.apache.spark.sql.GraftSqlBridge.localCheckpointNoStats(
        labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"),
            col("label").as("prev")))
      converged = next.filter(col("label") =!= col("prev")).isEmpty
      free(labels)
      labels = next
      round += 1
    }
    free(edges)
    // Fail loudly: partial labels would split true components and let extra
    // duplicate copies survive the dedup decision without anyone knowing.
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxRounds rounds — the pair " +
        "graph has a component with diameter > maxRounds; raise maxRounds or " +
        "switch to the large/small-star formulation for chain-shaped graphs")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"),
      (col("id") === col("label")).as("is_canonical"))
  }

  /** [[connectedComponents]] for graphs whose components are NOT
    * near-cliques: min-label propagation alone needs diameter rounds (a
    * 10^6-node chain = 10^6 joins), so each round here follows the
    * neighbor-min step with POINTER JUMPING — l(x) := l(l(x)) — which
    * doubles the propagation distance per round: O(log diameter) rounds
    * total (the label-contraction idea behind the alternating star
    * algorithms of Kiveris et al., SoCC'14 / Rastogi et al.'s hash-to-min).
    *
    * Same building blocks as the simple variant — two joins + one
    * aggregation per round, everything shuffling on node id, checkpoints
    * freed as rounds retire (stats-free, see [[connectedComponents]]) — and
    * the same fixed point: labels monotonically decrease toward the
    * component minimum, the jump is the identity once propagation fixes, so
    * the result is identical (property-tested against the simple variant
    * and shared with q48's transitive-closure oracle).
    *
    * maxRounds default is 64, not 35: the textbook distance-doubling bound
    * assumes label chains aligned with topology (consecutive-id chains hit
    * it: 300 nodes ≤ 12 rounds, spec-pinned), but a graph whose component
    * minimum sits behind SCATTERED ids propagates closer to one hop per
    * round on the worst frontier — the sf0.001 audio drift graph (diameter
    * 41, ids shuffled by fingerprint grouping) converges in ~30 rounds.
    * Rounds are cheap (one small join round-trip each) now that the stats
    * blow-up is gone; the loud throw at 64 still catches pathology.
    */
  def connectedComponentsFast(pairs: DataFrame, aCol: String, bCol: String,
      maxRounds: Int = 64): DataFrame = {
    def free(df: DataFrame): Unit =
      df.queryExecution.analyzed.foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false)
        case _ => ()
      }
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val nbrMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min("label").as("nbr_min"))
      val propagated = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"),
          col("label").as("prev"))
      // pointer jump: follow the label one more hop — label values ARE node
      // ids, so self-joining resolves l(l(x)) and halves remaining distance
      val p = propagated.as("p")
      val l2 = propagated.select(col("id").as("jid"), col("label").as("jlabel")).as("j")
      val next = org.apache.spark.sql.GraftSqlBridge.localCheckpointNoStats(
        p.join(l2, col("p.label") === col("j.jid"), "left")
          .select(col("p.id").as("id"),
            least(col("p.label"), coalesce(col("j.jlabel"), col("p.label"))).as("label"),
            col("p.prev").as("prev")))
      converged = next.filter(col("label") =!= col("prev")).isEmpty
      free(labels)
      labels = next
      round += 1
    }
    free(edges)
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsFast did not converge in $maxRounds rounds — " +
        "components this deep (diameter ~2^rounds) indicate a pathological " +
        "pair graph; inspect the input before raising maxRounds")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"),
      (col("id") === col("label")).as("is_canonical"))
  }

  /** Near-dup cluster labels through the EXACT-DEDUP-FIRST composition —
    * the degenerate-duplication-safe spelling of q48 (the text twin of
    * `Multimodal.bandedClustersFromFeats`). The pair-graph spelling is
    * quadratic in exact-dup group size: N identical crawls of one page
    * share every band, so the candidate join owes N²/2 verified pairs
    * before CC ever runs — at 100 TB a boilerplate page crawled 10^4
    * times is 5·10^7 pair rows for ONE cluster. But every stage of the
    * pair pipeline (tokens → shingle set → signature → bands → Jaccard)
    * is a function of the whitespace-normalized text, so docs sharing
    * `md5(normText)` are interchangeable: the member graph is the blow-up
    * of the distinct-text graph (cliques inside groups — identical docs
    * have Jaccard 1 and collide in every band; cross-group edges hold for
    * all members iff they hold for the reps). Components correspond 1:1,
    * and since each group's rep is its min member, rep-graph CC labels
    * ARE the full labels. So: one array-free aggregation to
    * (text_hash → min doc, count), the whole minhash/LSH/verify pipeline
    * over REP DOCS ONLY, pointer-jumping CC on the rep graph, one
    * hash-keyed join back. Degenerate duplication SHRINKS the expensive
    * stages instead of exploding them. Output-identical to CC over
    * [[minhashNearDupPairs]] (spec-pinned; q149 shares q48's
    * transitive-closure oracle).
    *
    * The `tokens >= 2` eligibility filter runs BEFORE grouping for the
    * same reason it runs before the shingle projection in the pair
    * spelling: a group of shingle-less docs must stay unclustered, not
    * become a cnt>=2 "cluster" no pair graph would ever produce. */
  def nearDupLabelsCollapsed(docs: DataFrame, threshold: Double = 0.8)
      : DataFrame = {
    val keyed = graft.Tables.spread(docs)
      .filter(size(toks(col("text"))) >= 2)
      .select(col("doc_id"), md5(normText(col("text"))).as("__th"))
    val groups = keyed.groupBy("__th")
      .agg(min("doc_id").as("rep"), count(lit(1)).as("cnt"))
      .localCheckpoint(false) // two consumers: rep semi-join + member join
    val repDocs = docs.join(
      groups.select(col("rep").as("doc_id")), Seq("doc_id"), "left_semi")
    val repLabels = connectedComponentsFast(
        minhashNearDupPairs(repDocs, threshold), "doc_id_a", "doc_id_b")
      .select(col("doc_id").as("rep"), col("cluster_id").as("rep_cluster"))
    keyed
      .join(groups, "__th")
      .join(repLabels, Seq("rep"), "left")
      // a doc clusters iff its rep has a cross-text edge OR its text is
      // shared (an isolated shared text is its own clique-component);
      // unique unmatched texts stay out, matching the pair-graph CC output
      .filter(col("rep_cluster").isNotNull || col("cnt") >= 2)
      .select(col("doc_id"),
        coalesce(col("rep_cluster"), col("rep")).as("cluster_id"))
      .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
  }

  /** Per-doc 32-bit SimHash fingerprints (token hashes materialized before
    * the 32 bit-sum passes). */
  def simhashFingerprints(docs: DataFrame): DataFrame =
    graft.Tables.spread(docs)
      .select(col("doc_id"), tokenHashes(toks(col("text"))).as("th"))
      .select(col("doc_id"), simhash(col("th")).as("simhash"))

  /** SimHash near-dup pairs: docs sharing any 8-bit band of the fingerprint,
    * verified by Hamming distance <= maxHamming. Same banded-LSH plan shape
    * as MinHash — no all-pairs. */
  def simhashNearDupPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val fps = simhashFingerprints(docs)
    val bands = fps.select(col("doc_id"), col("simhash"),
      explode(array((0 until SimBands).map { t =>
        struct(lit(t).as("band_idx"),
          shiftright(col("simhash"), t * SimBandBits)
            .bitwiseAND(lit((1L << SimBandBits) - 1)).as("band_val"))
      }: _*)).as("band"))
      .select(col("doc_id"), col("simhash"),
        col("band.band_idx").as("band_idx"), col("band.band_val").as("band_val"))
      .repartition(col("band_idx"), col("band_val"))
    val a = bands.as("a")
    val b = bands.hint("shuffle_hash").as("b")
    a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id_a"), col("b.doc_id").as("doc_id_b"),
        col("a.simhash").as("simhash_a"), col("b.simhash").as("simhash_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("simhash_a").bitwiseXOR(col("simhash_b"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_id_a", "doc_id_b", "hamming")
  }

  /** Shared gram prep for the exact-Jaccard tier: per doc, the distinct
    * int64 trigram hashes sorted ascending — positional hashing in one
    * native pass (no interpreted string-gram lambdas), and the sort is what
    * the merge-intersect verify kernel (graft.expr.SortedIntersectCount)
    * requires: O(n log n) ONCE per doc vs a hash set per PAIR. */
  private def gramPrep(docs: DataFrame, bucketCols: Seq[String]): DataFrame =
    graft.Tables.spread(docs).select(col("doc_id"),
      concat_ws("|", bucketCols.map(col): _*).as("bucket"),
      array_sort(array_distinct(graft.expr.CharGramHashSeq(col("text"), 3)))
        .as("grams"))
      .withColumn("n_grams", size(col("grams")))
      // zero-gram docs (text shorter than the gram width) have an UNDEFINED
      // jaccard (0/0 → NaN, which Spark's comparisons rank ABOVE the
      // threshold while DuckDB's NULL filters out) and the prefix tier has
      // no prefix to explode for them — excluding them keeps both tiers and
      // both engines on the identical pair set.
      .filter(col("n_grams") >= 1)

  /** Candidate pairs for [[ngramJaccardPairs]], two tiers:
    *
    *   - `prefixFilter = false`: every same-bucket pair passing the length
    *     filter min >= t*max — the pair space is sum over buckets of
    *     |bucket|^2/2.
    *   - `prefixFilter = true` (PPJoin prefix filter, Xiao et al. 2008,
    *     "Efficient similarity joins for near duplicate detection"): a pair
    *     with J >= t must share a gram among each side's first
    *     n - ceil(t*n) + 1 grams in GLOBAL RARITY order (ascending document
    *     frequency). Joining on (bucket, prefix_gram) instead of bucket
    *     alone shrinks the candidate space from |bucket|^2/2 to the sum of
    *     rare-gram posting-list squares — the standard exact-tier lever past
    *     bucketing, and the reason the prefix must be df-ordered: a random
    *     prefix would put ubiquitous grams ("the ", " and") in every
    *     prefix and regenerate the bucket cross product.
    *
    * Correctness of the prefix tier (no false negatives): J(A,B) >= t with
    * the length filter implies |A n B| >= t*|A| (and t*|B|), so the
    * intersection cannot avoid the first |A| - ceil(t*|A|) + 1 elements of A
    * in ANY consistent total order — rarity order is chosen purely for
    * pruning power. The df pass is one linear groupBy; the per-doc prefix
    * rank is a window over doc_id (max cardinality — no stragglers). */
  def ngramJaccardCandidates(docs: DataFrame, bucketCols: Seq[String],
      threshold: Double, prefixFilter: Boolean): DataFrame = {
    val lengthOk =
      least(col("a.n_grams"), col("b.n_grams")).cast("double") >=
        lit(threshold) * greatest(col("a.n_grams"), col("b.n_grams")).cast("double")
    if (!prefixFilter) {
      val g = gramPrep(docs, bucketCols)
        .select("doc_id", "bucket", "n_grams")
        .repartition(col("bucket"))
      val a = g.as("a")
      val b = g.hint("shuffle_hash").as("b")
      a.join(b, col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id") && lengthOk)
        .select(col("a.bucket").as("bucket"),
          col("a.doc_id").as("doc_id_a"), col("b.doc_id").as("doc_id_b"))
    } else {
      val ex = gramPrep(docs, bucketCols)
        .select(col("doc_id"), col("bucket"), col("n_grams"),
          explode(col("grams")).as("gram"))
      val dfreq = ex.groupBy("gram").agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("df").asc, col("gram").asc)
      val px = ex.join(dfreq, "gram")
        .withColumn("__rn", row_number().over(w))
        // -1e-9: if t*n computes a hair ABOVE its exact integer value, ceil
        // would overshoot and shorten the prefix below the lossless bound;
        // the epsilon only ever lengthens it (more candidates, never fewer).
        .filter(col("__rn") <=
          col("n_grams") - ceil(lit(threshold) * col("n_grams") - lit(1e-9)) + 1)
        .select(col("doc_id"), col("bucket"), col("n_grams"),
          col("gram").as("pgram"))
        // one exchange on the candidate key feeds both self-join sides
        .repartition(col("bucket"), col("pgram"))
      val a = px.as("a")
      val b = px.hint("shuffle_hash").as("b")
      a.join(b, col("a.bucket") === col("b.bucket") &&
          col("a.pgram") === col("b.pgram") &&
          col("a.doc_id") < col("b.doc_id") && lengthOk)
        .select(col("a.bucket").as("bucket"),
          col("a.doc_id").as("doc_id_a"), col("b.doc_id").as("doc_id_b"))
        .distinct()
    }
  }

  /** Exact character-trigram Jaccard pairs, bucketed by `bucketCols` (e.g.
    * `source`, `lang`), verified by the early-exit merge-intersect kernel.
    * Both tiers produce the identical pair set — the prefix filter is
    * lossless — so the oracle does not change with the tier
    * ([[ngramJaccardCandidates]] exposes the candidate stages for
    * measurement).
    *
    * The bucket key remains the outer scale lever (pair space is per-bucket);
    * the prefix tier then divides the within-bucket quadratic by the
    * rare-prefix collision rate. Default is the bucket tier: MEASURED on this
    * synthetic corpus (sf0.1, local[32]) the prefix filter pruned only 0.06%
    * of candidates (113,931 → 113,867; template-mates share even their rare
    * grams) while its df pass + prefix window cost 2.3× wall time — so it
    * would be a net loss here, and the honest default is off. On real
    * corpora with Zipfian gram rarity and varied lengths the prefix tier is
    * the dominant pruner (Xiao et al. 2008 report orders of magnitude); flip
    * the flag per-corpus. Grams are int64 hashes either way, so surviving
    * intersections compare longs, not strings. */
  def ngramJaccardPairs(docs: DataFrame, bucketCols: Seq[String],
      threshold: Double = 0.6, prefixFilter: Boolean = false): DataFrame = {
    val verified =
      if (!prefixFilter) {
        // Bucket tier carries the gram arrays THROUGH the self-join: both
        // sides repartition on the same plan, so ReuseExchange materializes
        // the md5-heavy gramPrep exactly once and the join consumes one
        // shuffle twice — the candidate/join-back spelling would re-derive
        // gramPrep three times (candidates + each verify side).
        val g = gramPrep(docs, bucketCols).repartition(col("bucket"))
        val a = g.as("a")
        val b = g.hint("shuffle_hash").as("b")
        a.join(b, col("a.bucket") === col("b.bucket") &&
            col("a.doc_id") < col("b.doc_id") &&
            least(col("a.n_grams"), col("b.n_grams")).cast("double") >=
              lit(threshold) * greatest(col("a.n_grams"), col("b.n_grams")).cast("double"))
          .select(col("a.bucket").as("bucket"),
            col("a.doc_id").as("doc_id_a"), col("b.doc_id").as("doc_id_b"),
            col("a.grams").as("grams_a"), col("b.grams").as("grams_b"),
            col("a.n_grams").as("n_a"), col("b.n_grams").as("n_b"))
      } else {
        val g = gramPrep(docs, bucketCols)
        val cand = ngramJaccardCandidates(docs, bucketCols, threshold,
          prefixFilter = true)
        val ga = g.select(col("doc_id").as("doc_id_a"),
          col("grams").as("grams_a"), col("n_grams").as("n_a"))
        val gb = g.select(col("doc_id").as("doc_id_b"),
          col("grams").as("grams_b"), col("n_grams").as("n_b"))
        cand.join(ga, "doc_id_a").join(gb, "doc_id_b")
          .select(col("bucket"), col("doc_id_a"), col("doc_id_b"),
            col("grams_a"), col("grams_b"), col("n_a"), col("n_b"))
      }
    verified
      .select(col("bucket"), col("doc_id_a"), col("doc_id_b"),
        // early-exit verify (see minhashNearDupPairs): bailed pairs were
        // provably below threshold; icnt=-1 fails the jaccard filter.
        graft.expr.ThresholdedIntersectCount(col("grams_a"), col("grams_b"),
          graft.expr.ThresholdedIntersectCount.jaccardBound(
            col("n_a") + col("n_b"), threshold)).as("icnt"),
        (col("n_a") + col("n_b")).as("nsum"))
      // |A ∪ B| = |A| + |B| - |A ∩ B|: same integers as the array_union
      // formulation, so the oracle's list_intersect/list_distinct mirror
      // produces the identical double.
      .select(col("bucket"), col("doc_id_a"), col("doc_id_b"),
        (col("icnt").cast("double") / (col("nsum") - col("icnt")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
