package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** LLM dedup operators: exact keep-one, MinHash signature invariants, LSH
  * pair symmetry, short-document guards. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en", "s1", 43L),
    (2L, "the quick brown fox jumps over the lazy dog", "en", "s2", 43L), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat", "en", "s1", 43L), // near dup of 1
    (4L, "completely different text about spark engines", "en", "s2", 45L),
    (5L, "  THE  quick  brown fox jumps over the lazy dog ", "en", "s3", 49L) // normalizes to 1
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("exactDedup: normalization collapses case/whitespace; lowest doc_id wins") {
    val out = Dedup.exactDedup(docs)
    assert(out.count() === 3) // {1,2,5} collapse, 3, 4
    assert(singleCol[Long](out.select("doc_id").orderBy("doc_id")) === Seq(1L, 3L, 4L))
  }

  test("minhash: identical docs get identical signatures; signature length fixed") {
    val sigs = Dedup.minhashSignatures(docs)
    val byId = sigs.select("doc_id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(byId(1L) === byId(2L))
    assert(byId.values.forall(_.length === TextOps.NumPerms))
    assert(byId(1L) !== byId(4L))
  }

  test("minhashNearDupPairs finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashNearDupPairs(docs, 0.5)
      .select("doc_id_a", "doc_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical
    assert(pairs.forall { case (a, b) => a < b }) // canonical orientation
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L }) // unrelated excluded
  }

  test("incremental probe == one-shot cross pairs; admit loop catches dups " +
      "against corpus AND earlier deltas") {
    val real = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val old = real.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val d1 = real.filter(pmod(col("doc_id"), lit(10)) === 0 &&
      pmod(col("doc_id"), lit(20)) === 0)
    val d2 = real.filter(pmod(col("doc_id"), lit(10)) === 0 &&
      pmod(col("doc_id"), lit(20)) =!= 0)
    val tmp = java.nio.file.Files.createTempDirectory("mhidx_").toString
    Dedup.writeMinhashIndex(old, tmp)

    def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.select("doc_id_a", "doc_id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    def crossOf(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = {
      val aIds = a.select("doc_id").as[Long].collect().toSet
      val bIds = b.select("doc_id").as[Long].collect().toSet
      pairs(Dedup.minhashNearDupPairs(a.unionByName(b), 0.8))
        .filter { case (x, y) =>
          (aIds(x) && bIds(y)) || (bIds(x) && aIds(y)) }
    }

    // exactness law: probe(delta, index(old)) == one-shot cross subset
    assert(pairs(Dedup.probeMinhashIndex(spark, d1, tmp, 0.8)) ===
      crossOf(old, d1))
    // the admit loop: append delta1, probe delta2 — dups caught against
    // the ORIGINAL corpus and the earlier delta alike
    Dedup.appendMinhashIndex(d1, tmp, batchId = 0L)
    assert(pairs(Dedup.probeMinhashIndex(spark, d2, tmp, 0.8)) ===
      crossOf(old.unionByName(d1), d2))
    // an empty delta probes to an empty result, not an error
    assert(Dedup.probeMinhashIndex(spark,
      real.limit(0), tmp, 0.8).count() === 0L)
    // an all-too-short delta (no shingles) likewise probes empty
    import spark.implicits._
    val shorty = Seq((999999L, "word", "en", "s", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Dedup.probeMinhashIndex(spark, shorty, tmp, 0.8).count() === 0L)
  }

  test("minhash index is exactly-once: replayed append == once; crashed/torn " +
      "delivery invisible; compaction probe-identical") {
    val real = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val old = real.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val d1 = real.filter(pmod(col("doc_id"), lit(10)) === 0 &&
      pmod(col("doc_id"), lit(20)) === 0)
    val d2 = real.filter(pmod(col("doc_id"), lit(10)) === 0 &&
      pmod(col("doc_id"), lit(20)) =!= 0)
    val tmp = java.nio.file.Files.createTempDirectory("mhidx_once_").toString
    Dedup.writeMinhashIndex(old, tmp)
    Dedup.appendMinhashIndex(d1, tmp, batchId = 0L)
    def probe(): Set[(Long, Long)] =
      Dedup.probeMinhashIndex(spark, d2, tmp, 0.8)
        .select("doc_id_a", "doc_id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val once = probe()
    assert(once.nonEmpty, "fixture has no cross dups — test is vacuous")

    // Replay: re-delivering batch 0 (driver retry after a successful
    // commit) lands under a fresh physical id and REPLACES the previous
    // delivery in the visible set — without the manifest law the raw
    // double-append would duplicate d1's bands+shingles and the probe's
    // pair set (and an admission retry would reject everything against
    // its own half-committed copy).
    Dedup.appendMinhashIndex(d1, tmp, batchId = 0L)
    assert(probe() === once, "replayed append changed the probe")

    // Crashed delivery: a TORN write under an allocated physical id —
    // bands landed, shingles/members did not, finish never ran. The probe
    // must keep serving the committed snapshot: without the vis filter
    // the torn bands rows would join d2's bands (d2 docs ARE in-flight
    // here) and the missing shingles would silently drop the verify.
    val phys = graft.ops.Layout.beginBatchCommit(spark, tmp, batchId = 1L)
    // the real append claims the delivery (pending marker) before writing
    // — the crash model must too, or the recovery's crash walk won't run
    graft.ops.Layout.clearPhysicalDelivery(spark, tmp, phys)
    spark.read.parquet(s"$tmp/bands")
      .filter(col("batch_id") === -1L).limit(50)
      .drop("batch_id").withColumn("batch_id", lit(phys))
      .write.mode("append").partitionBy("batch_id").parquet(s"$tmp/bands")
    assert(probe() === once, "uncommitted torn delivery visible to the probe")
    // recovery IS the replay: the real append reuses the unfinished gen,
    // CLEARS the torn partition (dynamic overwrite alone would keep
    // partials a smaller recovery doesn't re-cover — the limiting case
    // being this empty one), and swaps once
    Dedup.appendMinhashIndex(d2.limit(0), tmp, batchId = 1L)
    assert(probe() === once)
    assert(spark.read.parquet(s"$tmp/bands")
        .filter(col("batch_id") === phys).count() === 0L,
      "torn partials survived the recovery delivery")

    // Time travel: a probe AS OF the pre-append manifest reproduces the
    // base-only answer (d1's cross pairs vanish); unknown versions refuse.
    val versions = graft.ops.Layout.manifestVersions(spark, tmp)
    val preAppend = Dedup.probeMinhashIndex(spark, d2, tmp, 0.8,
        asOfVersion = Some(versions.min))
      .select("doc_id_a", "doc_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val d1Ids = d1.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(preAppend === once.filter { case (a, b) =>
      !d1Ids(a) && !d1Ids(b) })
    intercept[IllegalArgumentException] {
      Dedup.probeMinhashIndex(spark, d2, tmp, 0.8,
        asOfVersion = Some(9999L)).count()
    }

    // Offline compaction folds every committed batch (re-collapsing
    // cross-batch exact dups to super-reps) into the batch_id=-1 base of
    // a fresh root: probe-identical, strictly fewer files.
    val (inF, outF) = Dedup.compactMinhashIndex(spark, tmp, s"${tmp}_cmp")
    val compacted = Dedup.probeMinhashIndex(spark, d2, s"${tmp}_cmp", 0.8)
      .select("doc_id_a", "doc_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(compacted === once, "compaction moved the probe result")
    assert(outF < inF, s"compaction did not shrink the layout: $inF -> $outF")

    // negative ids are the reserved base partition — appends must refuse
    intercept[IllegalArgumentException] {
      Dedup.appendMinhashIndex(d1, tmp, batchId = -1L)
    }

    // the root is a first-class citizen of the layout catalog: DESCRIBE
    // LAYOUT lists its published versions (SQL front door, free with the
    // protocol) and they match the time-travel catalog
    val described = spark.sql(s"DESCRIBE LAYOUT '$tmp'")
      .select("version").collect().map(_.getLong(0)).toSet
    assert(described === graft.ops.Layout.manifestVersions(spark, tmp).toSet
      && described.nonEmpty)
  }

  test("incremental probe hot-band guard: 10^4 identical indexed crawls cost " +
      "rep-level work, pairs and admission stay exact") {
    // The ungapped probe owes 10^4 candidate rows and 10^4 shingle
    // verifies for ONE delta doc colliding with this bucket (broadcast
    // and verify scale with the corpus's worst band bucket); collapsed to
    // reps, the expensive stages see exactly ONE index row per band.
    // Completing in unit-test time is the cost evidence (the q149 spec
    // doctrine); the outputs are oracle-by-construction.
    val page = "subscribe to our newsletter for updates terms privacy contact"
    val crawl = spark.range(10000).selectExpr(
      "id AS doc_id", s"'$page' AS text", "'en' AS lang",
      "concat('s', id % 4) AS source", s"${page.length}L AS n_chars")
    val distinctDoc = Seq(
      (20000L, "a genuinely distinct technical document body", "en", "s9", 45L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("mhidx_hot_").toString
    Dedup.writeMinhashIndex(crawl.unionByName(distinctDoc), tmp)
    // the index holds TWO reps: band table rows bounded by reps, not crawls
    val bandRows = spark.read.parquet(s"$tmp/bands")
      .select("doc_id").distinct().count()
    assert(bandRows === 2L, s"index banded $bandRows docs, want 2 reps")
    val delta = Seq(
      (50000L, page, "en", "d", page.length.toLong),          // dup of the crawl
      (50001L, s"  ${page.toUpperCase}  ", "en", "d", 64L),   // normalizes to it
      (50002L, "fresh unrelated prose about query planning", "en", "d", 43L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // full pair expansion: every (crawl member, dup delta doc) pair at
    // jaccard 1.0 — 10^4 x 2 rows, output-sized by contract
    val pairs = Dedup.probeMinhashIndex(spark, delta, tmp, 0.8)
    assert(pairs.count() === 20000L)
    assert(pairs.filter(col("jaccard") =!= 1.0).count() === 0L)
    // admission never pays the expansion: dup ids are delta-sized
    val dupIds = Dedup.probeMinhashDupDeltaIds(spark, delta, tmp, 0.8)
      .as[Long].collect().toSet
    assert(dupIds === Set(50000L, 50001L))
  }

  test("sized probe degrade: a delta past the broadcast budget flips every " +
      "delta-side join to a shuffle — strategy moves, rows do not") {
    val real = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val old = real.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val delta = real.filter(pmod(col("doc_id"), lit(10)) === 0)
    val tmp = java.nio.file.Files.createTempDirectory("mhidx_sized_").toString
    Dedup.writeMinhashIndex(old, tmp)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.select("doc_id_a", "doc_id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // isolate the SIZED decision from Spark's own auto-broadcast (the
    // joinPlannedByStats spec discipline): with it off, a broadcast in
    // the plan can only come from the probe's own hint
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val small = Dedup.probeMinhashIndex(spark, delta, tmp, 0.8)
      val big = Dedup.probeMinhashIndex(spark, delta, tmp, 0.8,
        asOfVersion = None, broadcastMaxDocs = 0L)
      val smallPlan = small.queryExecution.executedPlan.toString
      val bigPlan = big.queryExecution.executedPlan.toString
      assert(smallPlan.contains("BroadcastHashJoin"),
        "under-budget probe lost its map-side broadcast plan")
      assert(!bigPlan.contains("BroadcastHashJoin") &&
        bigPlan.contains("ShuffledHashJoin"),
        "over-budget probe still broadcasts the delta")
      assert(rows(big) === rows(small),
        "the strategy flip changed the pair set")
      // the admission faces take the same budget: identical decisions
      val dupSmall = Dedup.probeMinhashDupDeltaIds(spark, delta, tmp, 0.8)
        .as[Long].collect().toSet
      val dupBig = Dedup.probeMinhashDupDeltaIds(spark, delta, tmp, 0.8,
          excludeLogicalBatch = None, broadcastMaxDocs = 0L)
        .as[Long].collect().toSet
      assert(dupBig === dupSmall)
      // ...and the full transaction under budget 0 commits the same index
      // state and audit as the broadcast tier on a twin root
      val t2 = java.nio.file.Files.createTempDirectory("mhidx_szb_").toString
      Dedup.writeMinhashIndex(old, t2)
      Dedup.admitIntoMinhashIndex(spark, delta, tmp, 0L, 0.8)
      Dedup.admitIntoMinhashIndex(spark, delta, t2, 0L, 0.8,
        broadcastMaxDocs = 0L)
      def state(root: String): (Set[Long], Set[(Long, String, Long, Long, Long)]) = (
        spark.read.parquet(s"$root/members")
          .filter(graft.ops.Layout.committedBatchFilter(spark, root))
          .select("doc_id").as[Long].collect().toSet,
        Dedup.admissionLog(spark, root).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSet)
      assert(state(t2) === state(tmp),
        "shuffled admission committed a different index/audit state")
    } finally spark.conf.set(key, prev)
  }

  test("candidate-pair guard: a HOT delta (one doc band-colliding with " +
      "many distinct corpus texts) flips ONLY the verify join to the " +
      "shuffled tier — pairs identical, delta frames still broadcast") {
    // 60 DISTINCT corpus texts, all near-dups of one base sentence: rep
    // collapse cannot fold them (different normalized texts), so a
    // 1-doc delta probing the base text band-collides with most of the
    // corpus — the pair-set blowup the delta-doc budget cannot see
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu"
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val corpus = (1 to 60).map(i =>
      (i.toLong, s"$base variant$i", "en", "s", 80L))
    val delta = Seq((1000L, base, "en", "d", 64L))
    val tmp = java.nio.file.Files.createTempDirectory("mhidx_hot_").toString
    Dedup.writeMinhashIndex(corpus.toDF(cols: _*), tmp)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val plain = Dedup.probeMinhashIndex(spark, delta.toDF(cols: _*),
        tmp, 0.5)
      val guarded = Dedup.probeMinhashIndex(spark, delta.toDF(cols: _*),
        tmp, 0.5, asOfVersion = None,
        broadcastMaxDocs = Dedup.DefaultProbeBroadcastMaxDocs,
        broadcastMaxCandidatePairs = 10L)
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("doc_id_a", "doc_id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val plainPlan = plain.queryExecution.executedPlan.toString
      val guardedPlan = guarded.queryExecution.executedPlan.toString
      assert(plainPlan.contains("BroadcastHashJoin") &&
        !plainPlan.contains("ShuffledHashJoin"),
        "in-budget probe lost its all-broadcast plan")
      // the guard flips the candidate-keyed verify join — and ONLY it:
      // the delta-sized joins keep their broadcast tier
      assert(guardedPlan.contains("ShuffledHashJoin"),
        "over-budget candidates still broadcast")
      assert(guardedPlan.contains("BroadcastHashJoin"),
        "the candidate guard wrongly degraded the delta-sized joins too")
      val got = pairs(guarded)
      assert(got === pairs(plain) && got.size > 10,
        "the verify-strategy flip changed the pair set")
    } finally spark.conf.set(key, prev)
  }

  test("admission audit separates skipped sub-2-token docs from indexed " +
      "admissions — and documents that they are never dedup-protected") {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 46L))
    val delta = Seq(
      (10L, "a fresh document body about shuffle exchanges", "en", "s", 46L),
      (11L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 46L),
      (12L, "word", "en", "s", 4L)) // < 2 tokens: no shingles, SKIPPED
    val tmp = java.nio.file.Files.createTempDirectory("mhadm_skip_").toString
    Dedup.writeMinhashIndex(corpus.toDF(cols: _*), tmp)
    Dedup.admitIntoMinhashIndex(spark, delta.toDF(cols: _*), tmp, 0L, 0.8)
    val log = Dedup.admissionLog(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // 10 admitted (indexed), 11 rejected (corpus dup), 12 skipped
    assert(log === Set((0L, "s", 1L, 1L, 1L)))
    // the skipped doc is NOT in the index...
    val members = spark.read.parquet(s"$tmp/members")
      .filter(graft.ops.Layout.committedBatchFilter(spark, tmp))
      .select("doc_id").as[Long].collect().toSet
    assert(members === Set(1L, 10L))
    // ...so its exact copy in a later batch skips AGAIN (never rejected):
    // the log's three-way split makes that visible instead of reporting a
    // phantom "admission"
    Dedup.admitIntoMinhashIndex(spark,
      Seq((20L, "word", "en", "s", 4L)).toDF(cols: _*), tmp, 1L, 0.8)
    val log2 = Dedup.admissionLog(spark, tmp)
      .filter(col("batch") === 1L).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(log2 === Set((0L, 0L, 1L)))
  }

  test("probe/admit checkpoint hygiene: plain probes persist nothing; the " +
      "admission transaction and index writes free every block they pin") {
    val real = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val old = real.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val delta = real.filter(pmod(col("doc_id"), lit(10)) === 0)
    val tmp = java.nio.file.Files.createTempDirectory("mhidx_leak_").toString
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // base build + append + full admission + both plain probe faces, all
    // materialized — a long-lived driver's steady-state loop
    Dedup.writeMinhashIndex(old, tmp)
    Dedup.probeMinhashIndex(spark, delta, tmp, 0.8).collect()
    Dedup.probeMinhashDupDeltaIds(spark, delta, tmp, 0.8).collect()
    Dedup.admitIntoMinhashIndex(spark, delta, tmp, 0L, 0.8)
    Dedup.admissionLog(spark, tmp).collect()
    // every localCheckpoint in the paths above is freed before return
    // (writeIndexDelta after its writes; the admission transaction via
    // freeCheckpoint; plain probes never checkpoint at all) — blocks
    // accumulating here would pin executor storage across an admission
    // stream's lifetime (the r16 ADVICE leak)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked checkpoint RDDs: $leaked")
  }

  test("simhash: identical docs equal; near dups within small Hamming distance") {
    val fps = Dedup.simhashFingerprints(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(java.lang.Long.bitCount(fps(1L) ^ fps(3L)) <= 6)
  }

  test("shingles guard: docs shorter than k produce sentinels, no crash") {
    val tiny = Seq((1L, "one", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // no shingles -> all-sentinel signature; near-dup pairing filters these
    // docs out before the band stage (they can't be near-dups of anything)
    val sigs = Dedup.minhashSignatures(tiny).collect()
    assert(sigs.head.getSeq[Long](1).forall(_ === Long.MaxValue))
    assert(Dedup.minhashNearDupPairs(tiny, 0.5).count() === 0L)
    val fp = TextAnalysis.fingerprints(tiny).collect()
    assert(fp.head.getAs[Long]("n_fp") === 0L)
  }

  test("ngramJaccardPairs stays within buckets") {
    val pairs = Dedup.ngramJaccardPairs(docs, Seq("source"), 0.5)
      .select("doc_id_a", "doc_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L))) // same source s1, near dup
    assert(!pairs.contains((1L, 2L))) // dup but different buckets -> not compared
  }

  test("ngramJaccard prefix tier: identical pairs, strictly fewer candidates") {
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    def pairSet(prefix: Boolean): Set[(Long, Long, Double)] =
      Dedup.ngramJaccardPairs(corpus, Seq("source", "lang"), 0.6, prefix)
        .collect()
        .map(r => (r.getAs[Long]("doc_id_a"), r.getAs[Long]("doc_id_b"),
          r.getAs[Double]("jaccard"))).toSet
    assert(pairSet(prefix = true) === pairSet(prefix = false))
    val nBucket =
      Dedup.ngramJaccardCandidates(corpus, Seq("source", "lang"), 0.6,
        prefixFilter = false).count()
    val nPrefix =
      Dedup.ngramJaccardCandidates(corpus, Seq("source", "lang"), 0.6,
        prefixFilter = true).count()
    withClue(s"prefix candidates $nPrefix vs bucket candidates $nBucket: ") {
      assert(nPrefix < nBucket)
    }
  }

  test("connectedComponents: transitive chains collapse, canonical is the min") {
    // chain 1-2-3 (1 and 3 never directly paired) + isolated pair 7-9
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_id_a", "doc_id_b")
    val got = Dedup.connectedComponents(pairs, "doc_id_a", "doc_id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got === Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (7L, 7L, true), (9L, 7L, false)))
  }

  test("connectedComponents: long chain still converges (diameter > 2)") {
    val chain = (1L until 9L).map(i => (i, i + 1)).toDF("doc_id_a", "doc_id_b")
    val got = Dedup.connectedComponents(chain, "doc_id_a", "doc_id_b")
    assert(got.filter(col("cluster_id") === 1L).count() === 9L)
    assert(got.filter(col("is_canonical")).count() === 1L)
  }

  test("connectedComponentsFast equals the simple variant on random graphs") {
    val rng = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val pairs = Seq.fill(40)((rng.nextInt(30).toLong, rng.nextInt(30).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct.toDF("doc_id_a", "doc_id_b")
      val simple = Dedup.connectedComponents(pairs, "doc_id_a", "doc_id_b")
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val fast = Dedup.connectedComponentsFast(pairs, "doc_id_a", "doc_id_b")
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(fast === simple, s"trial $trial diverged")
    }
  }

  test("connectedComponentsFast: 300-node chain converges in log rounds") {
    // min-label alone would need ~300 rounds (it throws at its default 20);
    // pointer jumping reaches the component min in O(log n)
    val chain = (1L until 300L).map(i => (i, i + 1)).toDF("doc_id_a", "doc_id_b")
    val got = Dedup.connectedComponentsFast(chain, "doc_id_a", "doc_id_b",
      maxRounds = 12)
    assert(got.filter(col("cluster_id") === 1L).count() === 300L)
    assert(got.filter(col("is_canonical")).count() === 1L)
  }

  test("connectedComponents leaves at most one checkpoint's blocks behind") {
    val chain = (1L until 9L).map(i => (i, i + 1)).toDF("doc_id_a", "doc_id_b")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val got = Dedup.connectedComponents(chain, "doc_id_a", "doc_id_b")
    got.collect() // materialize the result off the surviving checkpoint
    // per-round checkpoints and the edges checkpoint are freed inside the
    // call; only the final labels checkpoint (which the result reads) may
    // remain persisted.
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1, s"leaked checkpoint RDDs: $leaked")
  }

  test("connectedComponents throws (not partial labels) when rounds run out") {
    val chain = (1L until 9L).map(i => (i, i + 1)).toDF("doc_id_a", "doc_id_b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, "doc_id_a", "doc_id_b", maxRounds = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("connectedComponentsFast: scattered-id path converges with flat round cost (stats-free checkpoints)") {
    // Regression for the localCheckpoint origin-stats blow-up: a path whose
    // node ids are SHUFFLED relative to topology propagates its minimum far
    // slower than the consecutive-id chain above (one worst-frontier hop
    // per round instead of textbook doubling), so CC runs 15+ rounds — and
    // Dataset.localCheckpoint's carried statistics, squared by each round's
    // label self-join, made round cost DOUBLE past ~16 rounds (BigInteger
    // arithmetic inside join estimation; an effective hang by round 23).
    // With the stats-free checkpoint the whole run stays in seconds.
    val rng = new scala.util.Random(7)
    val ids = rng.shuffle((0L until 100L).toVector)
    val pairs = ids.sliding(2).map(w => (w(0), w(1))).toSeq
      .toDF("doc_id_a", "doc_id_b")
    val t0 = System.nanoTime()
    val labels = Dedup.connectedComponentsFast(pairs, "doc_id_a", "doc_id_b")
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(labels.length === 100 && labels.forall(_.getLong(1) == 0L))
    assert(secs < 120.0,
      f"rounds must stay cheap once checkpoints drop origin stats ($secs%.1f s)")
  }

  test("nearDupLabelsCollapsed == CC over the pair spelling (exact groups, chains, shorties)") {
    // exact-dup groups (incl. whitespace/case variants), a near-dup chain
    // bridging two groups, unrelated singletons, and sub-shingle docs
    // that must stay out of every cluster
    val mixed = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (5L, "  THE  quick  brown fox jumps over the lazy dog "),
      (3L, "the quick brown fox jumps over the lazy cat"),
      (6L, "the quick brown fox jumps over the lazy cat"),
      (4L, "completely different text about spark engines"),
      (7L, "an unrelated essay on columnar execution and shuffles"),
      (8L, "tiny"), (9L, "tiny"), (10L, "")
    ).map { case (id, t) => (id, t, "en", s"s${id % 3}", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val direct = Dedup.nearDupLabelsCollapsed(mixed, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val viaPairs = Dedup.connectedComponentsFast(
        Dedup.minhashNearDupPairs(mixed, 0.5), "doc_id_a", "doc_id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(direct === viaPairs && direct.nonEmpty)
    // the fixture binds: {1,2,5} merged with {3,6} through the near edge...
    assert(direct.contains((6L, 1L, false)), direct.toString)
    // ...and the shingle-less exact dups {8,9} never became a "cluster"
    assert(!direct.exists(l => l._1 == 8L || l._1 == 9L || l._1 == 10L))
  }

  test("10^4 identical crawls cluster without the quadratic pair stage") {
    // The pair spelling owes ~5*10^7 verified pairs for this corpus (its
    // candidate join's output contract); the collapsed path's expensive
    // stages see exactly TWO rep docs. Completing in unit-test time IS the
    // evidence; labels are oracle-by-construction (the clique plus its
    // whitespace/case variants all labeled 0 — normText grouping, the same
    // key exactDedup collapses on; the unrelated doc stays out). Cross-
    // GROUP near edges are the previous test's job.
    val page = "subscribe to our newsletter for updates terms privacy contact"
    val dup = spark.range(10000).selectExpr(
      "id AS doc_id", s"'$page' AS text", "'en' AS lang",
      "concat('s', id % 4) AS source", s"${page.length}L AS n_chars")
    val rest = Seq(
      (20000L, s"  ${page.toUpperCase}  "),
      (20001L, page.replace(" ", "   ")),
      (30000L, "a genuinely distinct technical document body")
    ).map { case (id, t) => (id, t, "en", "s9", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val labels = Dedup.nearDupLabelsCollapsed(dup.unionByName(rest), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(labels.length === 10002, s"got ${labels.length}")
    assert(labels.forall(_._2 == 0L))
    assert(labels.count(_._3) === 1 && labels.find(_._3).get._1 === 0L)
    assert(!labels.exists(_._1 == 30000L), "distinct doc leaked into a cluster")
  }

  test("sized registry/quarantine consult: an over-budget lane flips the " +
      "exact consult and the quarantine probe to the shuffled tier — " +
      "blocked set identical; the lane write shards past the row cap") {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val tLong = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val tNear = tLong + " extra" // 19/20 shared shingles: jaccard 0.95
    val keep = "a genuinely distinct technical document body"
    val base = Seq(
      (40L, tLong, "en", "s1", tLong.length.toLong),
      (60L, keep, "en", "s2", keep.length.toLong)).toDF(cols: _*)
    val delta = Seq(
      (100L, tNear, "en", "d", tNear.length.toLong), // near copy → quarantine
      (101L, tLong, "en", "d", tLong.length.toLong), // exact re-crawl → registry
      (102L, "fresh unrelated prose about query planning", "en", "d", 43L))
      .toDF(cols: _*)
    def build(cap: Long): String = {
      val root = java.nio.file.Files
        .createTempDirectory("mhidx_reg_sz_").toString + "/idx"
      Dedup.writeMinhashIndex(base, root)
      Dedup.deleteDocsFromMinhashIndex(spark, root, Seq(40L),
        nearCopyBlock = true, laneMaxRowsPerFile = cap)
      root
    }
    // shard-cap leg: a 1-row cap splits the quarantine band lane into one
    // parquet file per row — and the committed read is file-count blind
    val root = build(cap = 1L)
    def laneParts(p: String, table: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(p, table))
        .count(_.getName.endsWith(".parquet"))
    }
    assert(laneParts(root, "takedowns_bands") > 1,
      "over-cap lane delivery did not shard")
    assert(laneParts(root, "takedowns") === 1,
      "a 1-row registry lane should stay one file")
    // consult flip leg: same lanes, budget 0 → every lane join shuffles
    val eligible = Dedup.eligibleDocs(delta)
    val dm = Dedup.exactGroupsOf(eligible)
    val dReps = eligible.join(
      dm.filter(col("doc_id") === col("rep")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val nb = Dedup.bandsOf(dReps)
    val ns = Dedup.shingleSetsOf(dReps)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val small = Dedup.blockedRepsForDelta(spark, root, nb, ns, 0.8)
      val big = Dedup.blockedRepsForDelta(spark, root, nb, ns, 0.8, 0L)
      val smallPlan = small.queryExecution.executedPlan.toString
      val bigPlan = big.queryExecution.executedPlan.toString
      assert(smallPlan.contains("BroadcastHashJoin"),
        "under-budget consult lost its broadcast-lane plan")
      assert(!bigPlan.contains("BroadcastHashJoin") &&
        bigPlan.contains("ShuffledHashJoin"),
        "over-budget consult still broadcasts the lane")
      def reps(df: org.apache.spark.sql.DataFrame): Set[Long] =
        df.select("rep").as[Long].collect().toSet
      val got = reps(big)
      assert(got === reps(small) && got === Set(100L, 101L),
        s"the consult strategy flip changed the blocked set: $got")
      // ...and the full transaction under budget 0 commits the same
      // index state and audit as the broadcast tier on a twin root
      val root2 = build(cap = Dedup.DefaultRegistryLaneMaxRowsPerFile)
      Dedup.admitIntoMinhashIndex(spark, delta, root, 0L, 0.8)
      Dedup.admitIntoMinhashIndex(spark, delta, root2, 0L, 0.8,
        registryBroadcastMaxRows = 0L)
      def state(p: String): (Set[Long], Set[Seq[Any]]) = (
        spark.read.parquet(s"$p/members")
          .filter(graft.ops.Layout.committedBatchFilter(spark, p))
          .select("doc_id").as[Long].collect().toSet,
        Dedup.admissionLog(spark, p)
          .select("batch", "source", "n_admitted", "n_rejected",
            "n_skipped", "n_blocked")
          .collect().map(_.toSeq).toSet)
      val (mem, logRows) = state(root)
      assert(state(root2) === ((mem, logRows)),
        "shuffled-consult admission committed a different index/audit state")
      assert(mem === Set(60L, 102L), s"blocked docs reached members: $mem")
      assert(logRows.exists(r => r.contains(2L)),
        s"expected n_blocked=2 in the audit: $logRows")
    } finally spark.conf.set(key, prev)
  }
}
