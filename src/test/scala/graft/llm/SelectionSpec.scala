package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Selection operators on fixtures where every mechanism BINDS: shared spans
  * without whole-doc duplication, skewed weights, clusterable vectors, an
  * exact-Zipf corpus. */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String, source: String = "web") =
    (id, text, "en", source, text.length.toLong)

  private val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  test("dupSpanCoverage: shared boilerplate scores high, unique text zero") {
    val boiler = (1 to 12).map(i => s"b$i").mkString(" ") // 12 tokens, 5 8-grams
    val docs = Seq(
      doc(1L, boiler + " tail1 one two three four five six seven"),
      doc(2L, boiler + " tail2 uno dos tres cuatro cinco seis siete"),
      doc(3L, (1 to 20).map(i => s"u$i").mkString(" "))) // all grams unique
      .toDF(docCols: _*)
    val out = Selection.dupSpanCoverage(docs).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_docs") === 3L)
    // doc 3 contributes 0; docs 1 and 2 share exactly the 5 grams fully
    // inside the boilerplate prefix out of 13 grams each -> identical
    // cov_micro, strictly between 0 and 1e6
    val sum = r.getAs[Long]("sum_cov_micro")
    assert(sum === 2L * (5L * 1000000L / 13L))
    assert(r.getAs[Long]("docs_over_half") === 0L)
  }

  test("dupSpanCoverage: exact duplicates reach full coverage") {
    val t = (1 to 16).map(i => s"w$i").mkString(" ")
    val docs = Seq(doc(1L, t), doc(2L, t)).toDF(docCols: _*)
    val r = Selection.dupSpanCoverage(docs).collect().head
    assert(r.getAs[Long]("sum_cov_micro") === 2000000L)
    assert(r.getAs[Long]("docs_over_half") === 2L)
  }

  test("seqPoissonSample: deterministic, k per stratum, weight-scale invariant") {
    val docs = Seq.tabulate(200)(i =>
      (i.toLong, s"t$i", "en", if (i % 2 == 0) "a" else "b",
        (i % 7 + 1).toLong * 100L))
      .toDF(docCols: _*)
    val s1 = Selection.seqPoissonSample(docs, k = 5)
    assert(s1.groupBy("source").count().collect()
      .forall(_.getLong(1) === 5L))
    // deterministic on re-run
    assert(s1.exceptAll(Selection.seqPoissonSample(docs, k = 5)).isEmpty)
    // xi = u/w ranking is invariant under scaling every weight by a
    // constant (PPS is about RELATIVE size)
    val scaled = docs.withColumn("n_chars", col("n_chars") * 1000L)
    val s2 = Selection.seqPoissonSample(scaled, k = 5)
      .select("source", "rk", "doc_id")
    assert(s1.select("source", "rk", "doc_id").exceptAll(s2).isEmpty)
  }

  test("seqPoissonSample: heavier docs are sampled more often") {
    // 500 docs; doc_ids 0..49 get 100x the weight of the rest. Across
    // strata-free sampling the heavy 10% should take most of the k slots.
    val docs = Seq.tabulate(500)(i =>
      (i.toLong, s"t$i", "en", "web", if (i < 50) 100000L else 1000L))
      .toDF(docCols: _*)
    val picked = Selection.seqPoissonSample(docs, k = 20)
      .select("doc_id").as[Long].collect()
    assert(picked.count(_ < 50L) >= 15) // E[heavy] ~ 20 * (5e6/5.45e6) = 18.3
  }

  test("pq: codes stay in [0, Ks); trained codebook keeps full geometry") {
    val rng = new scala.util.Random(7)
    // 3 well-separated cluster centers in 64-dim space
    val centers = Array.fill(3)(Array.fill(Selection.PqM * Selection.PqSubDim)(
      rng.nextGaussian() * 10))
    val vecs = Seq.tabulate(120) { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => (x + rng.nextGaussian() * 0.1).toFloat).toSeq, i % 3)
    }.toDF("vec_id", "embedding", "label")
    val cb = Selection.pqTrain(vecs, iters = 1)
    assert(cb.count() === (Selection.PqM * Selection.PqKs).toLong)
    assert(cb.filter(col("cw").isNull || size(col("cw")) =!= Selection.PqSubDim)
      .isEmpty)
    val codes = Selection.pqEncode(vecs, cb)
    assert(codes.count() === 120L * Selection.PqM)
    assert(codes.filter(col("code") < 0 || col("code") >= Selection.PqKs)
      .isEmpty)
  }

  test("pq recall gate: clustered vectors pass with full recall") {
    val rng = new scala.util.Random(11)
    val centers = Array.fill(4)(Array.fill(64)(rng.nextGaussian() * 10))
    val vecs = Seq.tabulate(160) { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => (x + rng.nextGaussian() * 0.05).toFloat).toSeq, i % 4)
    }.toDF("vec_id", "embedding", "label")
    val gate = Selection.pqRecallGate(vecs, nQueries = 4, k = 10,
      candidates = 64, minHit = 4)
    val out = gate.collect()
    assert(out.length === 4)
    assert(out.forall(_.getAs[Boolean]("recall_ok")))
  }

  test("ivfadc recall gate: clustered vectors pass; zero-overlap queries report false, not vanish") {
    val rng = new scala.util.Random(13)
    val centers = Array.fill(4)(Array.fill(64)(rng.nextGaussian() * 10))
    val vecs = Seq.tabulate(160) { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => (x + rng.nextGaussian() * 0.05).toFloat).toSeq, i % 4)
    }.toDF("vec_id", "embedding", "label")
    val out = Selection.ivfadcRecallGate(vecs, nlist = 8, nprobe = 2,
      nQueries = 4, k = 10, candidates = 64, minHit = 4).collect()
    assert(out.length === 4) // every query reports, none dropped
    assert(out.forall(_.getAs[Boolean]("recall_ok")))
    // impossible bound: rows must still appear, as false
    val strict = Selection.ivfadcRecallGate(vecs, nlist = 8, nprobe = 2,
      nQueries = 4, k = 10, candidates = 64, minHit = 11).collect()
    assert(strict.length === 4)
    assert(strict.forall(!_.getAs[Boolean]("recall_ok")))
  }

  test("persisted IVFADC index: read-path search returns exactly the inline search's results") {
    val rng = new scala.util.Random(17)
    val centers = Array.fill(4)(Array.fill(64)(rng.nextGaussian() * 10))
    val vecs = Seq.tabulate(160) { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => (x + rng.nextGaussian() * 0.05).toFloat).toSeq, i % 4)
    }.toDF("vec_id", "embedding", "label")
    val base = java.nio.file.Files.createTempDirectory("graft_pqidx").toString
    Selection.writeIvfadcIndex(vecs, nlist = 8, s"$base/ann")
    val indexed = Selection.ivfadcSearchIndex(spark, s"$base/ann", vecs,
      nQueries = 4, k = 10, nprobe = 2, candidates = 64).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rank"))).toSet
    val inline = Selection.ivfadcTopK(vecs, nlist = 8, nprobe = 2,
      nQueries = 4, k = 10, candidates = 64).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rank"))).toSet
    // same training arithmetic + doubles round-tripping parquet exactly →
    // identical (query, vec, rank) triples, not just similar recall
    assert(indexed === inline && indexed.nonEmpty)

    // the 100 TB property, measured: a 1-query search OPENS only its
    // nprobe probed cell directories (dynamic partition pruning), out of
    // the nlist=8 the layout holds
    val one = Selection.ivfadcSearchIndex(spark, s"$base/ann", vecs,
      nQueries = 1, k = 10, nprobe = 2, candidates = 64)
    one.collect()
    // recurse through AQE query stages + reused exchanges to every scan
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
      val here = p.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          scans(r.child)
      }
      here.flatten
    }
    val codesScan = scans(one.queryExecution.executedPlan)
      .find(_.metadata.get("Location").exists(_.contains("ann/codes")))
      .getOrElse(fail("codes scan not found in executed plan"))
    val partsRead = codesScan.metrics.get("numPartitions").map(_.value)
    assert(partsRead.exists(n => n >= 1 && n <= 2),
      s"expected <= nprobe(2) cell directories read, got $partsRead " +
        s"(metrics: ${codesScan.metrics.keys.mkString(",")})")
  }

  test("zipfSlope: an exact power-law corpus recovers its exponent") {
    // freq(rank r) = floor(10000 / r): slope of ln f vs ln r ~ -1
    val words = (1 to 60).flatMap { r =>
      Seq.fill(10000 / r)(s"w${"%03d".format(r)}")
    }
    val docs = Seq(doc(1L, words.mkString(" "))).toDF(docCols: _*)
    val r = Selection.zipfSlope(docs, topN = 50).collect().head
    assert(r.getAs[Long]("n_terms") === 50L)
    val slope = r.getAs[Long]("slope_micro").toDouble / 1e6
    assert(slope > -1.05 && slope < -0.95, s"slope $slope")
  }

  test("zipfSlope: single-term sources are dropped, not divided by zero") {
    val docs = Seq(
      doc(1L, "only only only", source = "mono"),
      doc(2L, (1 to 30).flatMap(r => Seq.fill(31 - r)(s"w$r")).mkString(" "),
        source = "multi"))
      .toDF(docCols: _*)
    val out = Selection.zipfSlope(docs).collect()
    assert(out.map(_.getAs[String]("source")).toSeq === Seq("multi"))
  }

  test("bm25: term-dense short docs outrank diluted long ones; no-hit docs drop") {
    val docs = Seq(
      doc(1L, "alpha alpha alpha beta"),               // dense, short
      doc(2L, "alpha " + (1 to 60).map(i => s"f$i").mkString(" ")), // diluted
      doc(3L, (1 to 10).map(i => s"n$i").mkString(" ")), // no query terms
      doc(4L, "alpha beta gamma delta"))                // two distinct terms
      .toDF(docCols: _*)
    val out = TextAnalysis.bm25Rank(docs, Seq("alpha", "beta"), topK = 10)
      .collect()
    val ids = out.map(_.getAs[Long]("doc_id")).toSeq
    assert(!ids.contains(3L)) // docs without any query term never score
    assert(ids.head === 1L, s"expected dense doc first, got $ids")
    // doc 4 hits both terms, doc 2 hits one diluted term
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Long]("n_terms_hit")).toMap
    assert(byId(4L) === 2L && byId(2L) === 1L)
    // length normalization: doc 2's single diluted hit scores below doc 4's
    val scores = out.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Long]("score_micro")).toMap
    assert(scores(4L) > scores(2L))
  }

  test("bm25 index maintenance: merged delta stats == full rebuild, exactly") {
    val docs = Seq.tabulate(60)(i =>
      doc(i.toLong, (0 to i % 9).map(j => s"w${(i + j) % 13}").mkString(" ")))
      .toDF(docCols: _*)
    val (a, b) = (docs.filter(col("doc_id") < 30),
      docs.filter(col("doc_id") >= 30))
    val mergedTerm = TextAnalysis.mergeBm25TermStats(
      TextAnalysis.bm25TermStats(a), TextAnalysis.bm25TermStats(b))
    val rebuilt = TextAnalysis.bm25TermStats(docs)
    assert(mergedTerm.exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(mergedTerm).isEmpty)
    val mergedCorpus = TextAnalysis.mergeBm25CorpusStats(
      TextAnalysis.bm25CorpusStats(a), TextAnalysis.bm25CorpusStats(b))
    assert(rows(mergedCorpus) === rows(TextAnalysis.bm25CorpusStats(docs)))
    // serving against the merged index == the one-shot ranking
    val terms = Seq("w1", "w5", "w12")
    val viaIndex = TextAnalysis.bm25RankWith(docs,
      mergedTerm.filter(col("term").isin(terms: _*)), mergedCorpus, terms)
    assert(rows(viaIndex) === rows(TextAnalysis.bm25Rank(docs, terms)))
  }

  test("bigram surprisal: looping text scores zero, order-shuffled text does not") {
    // doc 1 loops one bigram: every transition is deterministic -> -ln 1 = 0.
    // doc 2 uses the SAME unigrams in varied order -> positive surprisal
    // (the signal q73's unigram model cannot see).
    val docs = Seq(
      doc(1L, Seq.fill(30)("a b").mkString(" ")),
      doc(2L, "a a b b a b b a a b a a b b b a b a b a"))
      .toDF(docCols: _*)
    val out = TextAnalysis.bigramSurprisal(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_surprisal"))
      .toMap
    // doc 1's transitions are not all certain corpus-wide (doc 2 shares the
    // vocab), but its dominant a->b / b->a loop must score well below doc 2
    assert(out(1L) < out(2L), out.toString)
    val solo = TextAnalysis.bigramSurprisal(
      Seq(doc(1L, Seq.fill(30)("a b").mkString(" "))).toDF(docCols: _*))
      .collect().head.getAs[Double]("avg_surprisal")
    assert(math.abs(solo) < 0.02, s"pure loop should be ~0, got $solo")
  }

  test("bpe pair counts: the dominant within-word pair wins; cross-word pairs never count") {
    val docs = Seq(
      doc(1L, Seq.fill(40)("abab").mkString(" ") + " xy xy xy"))
      .toDF(docCols: _*)
    val out = TextAnalysis.bpePairCounts(docs, topK = 5).collect()
      .map(r => r.getAs[String]("pair") -> r.getAs[Long]("cnt"))
    // "abab" contributes ab, ba, ab per word
    assert(out.head === ("ab" -> 80L), out.toSeq.toString)
    assert(out.toMap.get("ba") === Some(40L))
    assert(out.toMap.get("xy") === Some(3L))
    // no pair spans a word boundary (e.g. "bx" from "abab xy")
    assert(!out.map(_._1).contains("bx"))
  }

  test("bm25 postings path == one-shot ranking (the serving shape)") {
    val docs = Seq.tabulate(60)(i =>
      doc(i.toLong, (0 to i % 9).map(j => s"w${(i + j) % 13}").mkString(" ")))
      .toDF(docCols: _*)
    val terms = Seq("w1", "w5", "w12")
    val postings = TextAnalysis.bm25Postings(docs)
    val termStats = TextAnalysis.bm25TermStatsFromPostings(postings)
      .filter(col("term").isin(terms: _*))
    val corpus = TextAnalysis.bm25CorpusStatsFromPostings(postings)
    val viaPostings = TextAnalysis.bm25RankFromPostings(
      postings, termStats, corpus, terms)
    assert(rows(viaPostings) === rows(TextAnalysis.bm25Rank(docs, terms)))
  }

  test("rrf fusion: presence in both lists beats either single list at like ranks") {
    // RRF arithmetic on crafted rank lists, mirroring the q105 combiner
    val lex = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "lex_rank")
    val sem = Seq((2L, 1L), (4L, 2L)).toDF("doc_id", "sem_rank")
    val fused = lex.join(sem, Seq("doc_id"), "full")
      .select(col("doc_id"),
        (coalesce(expr("1000000L div (60 + lex_rank)"), lit(0L)) +
          coalesce(expr("1000000L div (60 + sem_rank)"), lit(0L)))
          .as("rrf_micro"))
      .orderBy(col("rrf_micro").desc, col("doc_id").asc)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // doc 2 (rank 2 lex + rank 1 sem) beats doc 1 (rank 1 lex only)
    assert(fused.head._1 === 2L, fused.toSeq.toString)
    assert(fused.head._2 === 1000000L / 62 + 1000000L / 61)
    // every doc from either list survives the full join
    assert(fused.map(_._1).toSet === Set(1L, 2L, 3L, 4L))
  }

  test("q95 split is a pure function of the cluster key (zero leakage)") {
    // Force near-dup clusters: identical texts cluster; split must ride the
    // cluster, so members always share a split.
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = (0 until 30).map { i =>
      val text = if (i < 10) base + s" v$i" else s"unique ${"%d".format(i)} " +
        (1 to 30).map(j => s"u${i}_$j").mkString(" ")
      doc(i.toLong, text)
    }.toDF(docCols: _*)
    val labels = Dedup.connectedComponents(
      Dedup.minhashNearDupPairs(docs, 0.8), "doc_id_a", "doc_id_b")
    val keyed = docs.select("doc_id").join(labels, Seq("doc_id"), "left")
      .withColumn("ckey", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("bucket", Sampling.hashBucket(col("ckey"), "graft"))
      .withColumn("split", when(col("bucket") < 90, "train")
        .when(col("bucket") < 95, "val").otherwise("test"))
    val leak = keyed.groupBy("ckey")
      .agg(countDistinct("split").as("nsp"))
      .agg(max("nsp")).collect().head.getLong(0)
    assert(leak === 1L)
    // and the clusters actually formed (the test binds)
    assert(labels.select("cluster_id").distinct().count() <
      labels.count())
  }

  test("cluster-balanced sample: a dominant cluster is capped at k like any other") {
    val rng = new scala.util.Random(5)
    val centers = Array.fill(4)(Array.fill(64)(rng.nextGaussian() * 10))
    // 85% of the corpus sits in cluster 0 — the skew the quota corrects
    val vecs = Seq.tabulate(200) { i =>
      val c = centers(if (i < 170) 0 else i % 4)
      (i.toLong, c.map(x => (x + rng.nextGaussian() * 0.05).toFloat).toSeq, i % 4)
    }.toDF("vec_id", "embedding", "label")
    val out = Selection.clusterBalancedSample(vecs, nlist = 8, k = 3)
    val perCell = out.groupBy("cell").count().collect()
      .map(r => r.getLong(1))
    assert(perCell.nonEmpty && perCell.forall(_ <= 3L),
      s"a cell exceeded its quota: ${perCell.mkString(",")}")
    assert(perCell.count(_ == 3L) >= 1, "no cell saturated — fixture too thin")
    assert(perCell.length >= 2, "sample collapsed into one cluster")
    // deterministic end-to-end (hash-drawn uniform, no RNG state)
    assert(out.exceptAll(
      Selection.clusterBalancedSample(vecs, nlist = 8, k = 3)).isEmpty)
  }

  test("IVFADC append: incremental batches == one-shot encode under frozen geometry") {
    val rng = new scala.util.Random(17)
    val centers = Array.fill(4)(Array.fill(64)(rng.nextGaussian() * 10))
    val vecs = Seq.tabulate(160) { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => (x + rng.nextGaussian() * 0.05).toFloat).toSeq, i % 4)
    }.toDF("vec_id", "embedding", "label")
    val tmp = java.nio.file.Files.createTempDirectory("graft_pqapp").toString
    Selection.writeIvfadcIndex(vecs, nlist = 8, s"$tmp/full")
    // second root shares the FROZEN geometry, but its codes arrive in two
    // appended batches instead of one overwrite
    spark.read.parquet(s"$tmp/full/cents").write.parquet(s"$tmp/inc/cents")
    spark.read.parquet(s"$tmp/full/codebook")
      .write.parquet(s"$tmp/inc/codebook")
    Selection.appendToIvfadcIndex(vecs.filter(col("vec_id") < 80), s"$tmp/inc",
      batchId = 0L)
    Selection.appendToIvfadcIndex(vecs.filter(col("vec_id") >= 80), s"$tmp/inc",
      batchId = 1L)
    def search(base: String) =
      Selection.ivfadcSearchIndex(spark, base, vecs,
        nQueries = 4, k = 10, nprobe = 2, candidates = 64).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
          r.getAs[Long]("rank"))).toSet
    val inc = search(s"$tmp/inc")
    assert(inc === search(s"$tmp/full") && inc.nonEmpty)

    // Replay: re-delivering batch 1 (driver retry after a successful
    // commit) dynamic-overwrites its own partitions byte-identically —
    // search results cannot move.
    Selection.appendToIvfadcIndex(vecs.filter(col("vec_id") >= 80), s"$tmp/inc",
      batchId = 1L)
    assert(search(s"$tmp/inc") === inc)

    // Cross-batch duplicate vec_ids (caller re-ingests rows 0-39 under a
    // NEW batch id): the search path shadows latest-batch-wins per
    // (vec_id, m), so identical re-encodes cannot double an ADC distance
    // and demote the duplicate.
    Selection.appendToIvfadcIndex(vecs.filter(col("vec_id") < 40), s"$tmp/inc",
      batchId = 2L)
    assert(search(s"$tmp/inc") === inc)

    // Offline compaction folds every batch into the batch_id=-1 base of a
    // fresh root: search identical, strictly fewer code files.
    val (inFiles, outFiles) =
      Selection.compactIvfadcIndex(spark, s"$tmp/inc", s"$tmp/cmp")
    assert(search(s"$tmp/cmp") === inc)
    assert(outFiles < inFiles,
      s"compaction did not shrink the codes layout: $inFiles -> $outFiles")

    // negative ids are the reserved base partition — appends must refuse
    intercept[IllegalArgumentException] {
      Selection.appendToIvfadcIndex(vecs, s"$tmp/inc", batchId = -1L)
    }

    // Torn partials + an EMPTY recovery delivery: the pre-write clear
    // must REPLACE the crashed attempt's files — dynamic overwrite alone
    // rewrites only partitions the recovery has rows for, so without the
    // clear these duplicate codes would COMMIT and shadow their vectors'
    // real cells (latest-logical-batch-wins).
    val physT = graft.ops.Layout.beginBatchCommit(spark, s"$tmp/inc", 3L)
    // claim the delivery (pending marker) like the real append does
    graft.ops.Layout.clearPhysicalDelivery(spark, s"$tmp/inc", physT)
    spark.read.parquet(s"$tmp/inc/codes").limit(20)
      .drop("batch_id").withColumn("batch_id", lit(physT))
      .write.mode("append").partitionBy("cell", "batch_id")
      .parquet(s"$tmp/inc/codes")
    Selection.appendToIvfadcIndex(vecs.limit(0), s"$tmp/inc", batchId = 3L)
    assert(search(s"$tmp/inc") === inc,
      "empty recovery committed the torn partials")
    assert(spark.read.parquet(s"$tmp/inc/codes")
        .filter(col("batch_id") === physT).count() === 0L,
      "torn partials survived the empty recovery")
  }

  test("IVFADC cross-cell re-assignment: uncompacted search == post-compaction search") {
    val rng = new scala.util.Random(23)
    val cA = Array.fill(64)(rng.nextGaussian() * 10)
    val cB = cA.map(-_) // the opposite blob — guaranteed different cells
    def near(c: Array[Double]) = c.map(x => (x + rng.nextGaussian() * 0.05).toFloat).toSeq
    val base = Seq.tabulate(160) { i =>
      (i.toLong, near(if (i < 80) cA else cB), i % 4)
    }
    val vecs = base.toDF("vec_id", "embedding", "label")
    val tmp = java.nio.file.Files.createTempDirectory("graft_pqmove").toString
    Selection.writeIvfadcIndex(vecs, nlist = 8, s"$tmp/idx")
    // pick the moved vector from blob A's MOST-POPULATED trained cell, so
    // after it leaves the probed cell still holds real neighbors (kmeans
    // can seed a singleton cell on an arbitrary fixed vec_id)
    val cents = spark.read.parquet(s"$tmp/idx/cents")
    val assignA = Similarity.ivfAssignWith(
      vecs.filter(col("vec_id") < 80), cents)
    val bigCell = assignA.groupBy("cell").count()
      .orderBy(col("count").desc, col("cell")).head().getLong(0)
    val movedId = assignA.filter(col("cell") === bigCell)
      .orderBy("vec_id").head().getAs[Long]("vec_id")
    // the moved vector's updated embedding lands near cB, so the frozen
    // centroids assign it to a DIFFERENT cell than its base codes
    val newEmb = near(cB)
    Selection.appendToIvfadcIndex(
      Seq((movedId, newEmb, 1)).toDF("vec_id", "embedding", "label"),
      s"$tmp/idx", batchId = 0L)
    // the fixture must bind: the codes physically span two cell dirs
    val cellsOfMoved = spark.read.parquet(s"$tmp/idx/codes")
      .filter(col("vec_id") === movedId).select("cell").distinct().count()
    assert(cellsOfMoved === 2L,
      s"fixture too thin: vec $movedId spans $cellsOfMoved cells")
    // current-corpus view: the moved vector carries its NEW embedding
    val vecs2 = (base.filterNot(_._1 == movedId) :+ ((movedId, newEmb, 1)))
      .toDF("vec_id", "embedding", "label")
    // a query sitting exactly on the moved vector's OLD embedding probes
    // (nprobe=1) only the old cell — the precise window where stale codes
    // used to rank the moved vector as the best ADC candidate
    val q = Seq((9000L, base(movedId.toInt)._2.map(_.toDouble)))
      .toDF("query_id", "qv")
    def search(root: String) =
      Selection.ivfadcSearchIndexQueries(spark, root, vecs2, q,
        k = 5, nprobe = 1, candidates = 5).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
          r.getAs[Long]("rank"))).toSet
    val inc = search(s"$tmp/idx")
    assert(inc.nonEmpty && !inc.exists(_._2 == movedId),
      s"stale old-cell codes still rank the moved vector: $inc")
    // the contract: candidate generation reconciles re-assignments at
    // read, so the uncompacted root answers EXACTLY like the compacted one
    Selection.compactIvfadcIndex(spark, s"$tmp/idx", s"$tmp/cmp")
    assert(search(s"$tmp/cmp") === inc)
    // and a query on the moved vector's NEW position (probing exactly its
    // new cell) serves it from there
    val qB = Seq((9001L, newEmb.map(_.toDouble))).toDF("query_id", "qv")
    val fromB = Selection.ivfadcSearchIndexQueries(spark, s"$tmp/idx", vecs2,
      qB, k = 5, nprobe = 1, candidates = 5).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    assert(fromB.contains(movedId),
      s"re-assigned vector missing from its new cell's results: $fromB")
  }

  test("BM25 index append: incremental batches == one-shot build; replay idempotent; compaction search-identical") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val tmp = java.nio.file.Files.createTempDirectory("graft_bm25idx").toString
    // one-shot reference root vs a root built base + two appended batches
    Selection.writeBm25Index(docs, s"$tmp/full")
    Selection.writeBm25Index(docs.filter(col("doc_id") % 3 === 0), s"$tmp/inc")
    Selection.appendToBm25Index(docs.filter(col("doc_id") % 3 === 1),
      s"$tmp/inc", batchId = 0L)
    Selection.appendToBm25Index(docs.filter(col("doc_id") % 3 === 2),
      s"$tmp/inc", batchId = 1L)
    val terms = Seq("hash", "join", "window")
    def search(base: String): Seq[(Long, Long)] =
      Selection.bm25SearchIndex(spark, base, terms, topK = 20).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro")))
        .toSeq
    val inc = search(s"$tmp/inc")
    // doc-disjoint batches compose EXACTLY: df/n_docs/sum_dl fold to the
    // same longs, so every score_micro is bit-identical, not just same-rank
    assert(inc === search(s"$tmp/full") && inc.nonEmpty)

    // Replay: re-delivering batch 1 lands under a fresh delivery id and
    // swaps the manifest — the VISIBLE row set is unchanged (logical
    // idempotence), and vacuum reclaims the superseded delivery so the
    // physical layout returns to one copy per batch
    def postingsRows(base: String): Long =
      spark.read.parquet(s"$base/postings")
        .filter(graft.ops.Layout.committedBatchFilter(spark, base))
        .count()
    val nRows = postingsRows(s"$tmp/inc")
    Selection.appendToBm25Index(docs.filter(col("doc_id") % 3 === 2),
      s"$tmp/inc", batchId = 1L)
    assert(search(s"$tmp/inc") === inc)
    assert(postingsRows(s"$tmp/inc") === nRows)
    assert(graft.ops.Layout.vacuumLayout(spark, s"$tmp/inc") > 0)
    assert(spark.read.parquet(s"$tmp/inc/postings").count() === nRows)

    // bucket pruning survives the appends (batch_id subpartitions nest
    // INSIDE the bucket directories, so the term_bucket partition filter
    // still prunes to the query terms' directories)
    val p = graft.ops.Layout
      .postingsForTerms(spark, s"$tmp/inc/postings", terms)
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("term_bucket"),
      s"bucket pruning lost after appends:\n$p")

    // Offline compaction folds every batch into the batch_id=-1 base of a
    // fresh root: search identical, strictly fewer postings files
    val (inF, outF) =
      Selection.compactBm25Index(spark, s"$tmp/inc", s"$tmp/cmp")
    assert(search(s"$tmp/cmp") === inc)
    assert(outF < inF,
      s"compaction did not shrink the postings layout: $inF -> $outF")

    // negative ids are the reserved base partition — appends must refuse
    intercept[IllegalArgumentException] {
      Selection.appendToBm25Index(docs, s"$tmp/inc", batchId = -1L)
    }
  }

  test("batch-commit snapshot: manifest swap atomic, in-flight deliveries invisible, planned readers keep their snapshot") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val tmp = java.nio.file.Files.createTempDirectory("graft_bmvis").toString
    val base = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    Selection.writeBm25Index(base, s"$tmp/idx")
    Selection.writeBm25Index(base, s"$tmp/baseonly")
    Selection.appendToBm25Index(odd, s"$tmp/idx", batchId = 0L)
    val terms = Seq("hash", "join", "window")
    def search(root: String) =
      Selection.bm25SearchIndex(spark, root, terms, topK = 20)
        .collect().map(_.toSeq).toSeq
    def stats(root: String) =
      (Selection.bm25TermStatsRead(spark, root)
         .orderBy("term").collect().map(_.toSeq).toSeq,
       Selection.bm25CorpusStatsRead(spark, root).collect().head.toSeq)
    val full = search(s"$tmp/idx")
    val fullStats = stats(s"$tmp/idx")
    assert(full !== search(s"$tmp/baseonly"), "fixture too small to discriminate")

    // (a) begin is allocation, not disturbance: the previous delivery
    // keeps serving through the whole rewrite window — nothing vanishes
    val physA = graft.ops.Layout.beginBatchCommit(spark, s"$tmp/idx", 0L)
    assert(physA >= graft.ops.Layout.GenStride,
      s"delivery id not stride-encoded: $physA")
    assert(graft.ops.Layout.logicalBatchLocal(physA) === 0L)
    assert(search(s"$tmp/idx") === full,
      "begin disturbed the serving snapshot")
    assert(stats(s"$tmp/idx") === fullStats)

    // (b) a crashed rewrite: a WRONG delta lands under the allocated
    // physical id and the writer dies before finish — invisible to every
    // read (the manifest never mentioned that physical)
    graft.llm.TextAnalysis.bm25TermStatsFromPostings(
        graft.llm.TextAnalysis.bm25PositionalPostings(odd))
      .withColumn("df", col("df") * 999) // a wrong half-written delta
      .withColumn("batch_id", lit(physA))
      .write.mode("overwrite").partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(s"$tmp/idx/term_stats")
    assert(stats(s"$tmp/idx") === fullStats,
      "crashed delivery's partitions visible before finish")
    // recovery IS the replay: the re-append reuses the unfinished gen,
    // dynamic-overwrites the crashed partitions cleanly, and swaps once
    Selection.appendToBm25Index(odd, s"$tmp/idx", batchId = 0L)
    assert(search(s"$tmp/idx") === full)
    assert(stats(s"$tmp/idx") === fullStats)

    // (c) THE snapshot guarantee: a reader whose plan (file listing +
    // manifest) resolved BEFORE a begin + full rewrite + finish still
    // collects its planned snapshot — committed files are immutable and
    // the swap only redirects NEW plans. The interleaved delivery ships
    // DIFFERENT content so the two snapshots are distinguishable.
    val plannedSearch =
      Selection.bm25SearchIndex(spark, s"$tmp/idx", terms, topK = 20)
    val plannedStats = Selection.bm25CorpusStatsRead(spark, s"$tmp/idx")
    Selection.appendToBm25Index(
      odd.filter(col("doc_id") % 3 === 0), s"$tmp/idx", batchId = 0L)
    val newFull = search(s"$tmp/idx")
    assert(newFull !== full, "fixture: replacement delivery not distinguishable")
    assert(plannedSearch.collect().map(_.toSeq).toSeq === full,
      "reader planned before the swap saw the new delivery (torn snapshot)")
    assert(plannedStats.collect().head.toSeq === fullStats._2,
      "stats fold planned before the swap drifted")
    // exactly one physical per logical is visible: the filtered scan
    // serves {-1, latest delivery} only
    val visIds = spark.read.parquet(s"$tmp/idx/term_stats")
      .filter(graft.ops.Layout.committedBatchFilter(spark, s"$tmp/idx"))
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(visIds.size === 2 && visIds.contains(-1L),
      s"visible batch set not {-1, latest}: $visIds")

    // (d) vacuum: superseded deliveries (two earlier gens of batch 0) are
    // garbage after the swap — vacuum removes their directories without
    // moving the served snapshot
    val removed = graft.ops.Layout.vacuumLayout(spark, s"$tmp/idx")
    assert(removed > 0, "vacuum found no superseded delivery directories")
    assert(search(s"$tmp/idx") === newFull)

    // (e) pre-protocol roots (no _commits dir) read unfiltered — legacy
    // layouts keep their original semantics (post-vacuum, disk holds
    // exactly the visible deliveries, so unfiltered == filtered)
    val fs = new org.apache.hadoop.fs.Path(s"$tmp/idx/_commits")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$tmp/idx/_commits"), true)
    assert(search(s"$tmp/idx") === newFull)

    // first protocol contact with that pre-protocol root BACKFILLS its
    // existing batches from the directory walk (stride-encoded physicals
    // map back through logicalBatchLocal): appending batch 1 re-creates
    // _commits, and batch 0's pre-protocol data must stay served — an
    // empty manifest would hide it forever
    import spark.implicits._
    Selection.appendToBm25Index(
      Seq((900001L, "zeppelin hash join", "en", "s", 18L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"),
      s"$tmp/idx", batchId = 1L)
    val nDocsServed = Selection.bm25CorpusStatsRead(spark, s"$tmp/idx")
      .collect().head.getAs[Long]("n_docs")
    val nExpected = 250L + odd.filter(col("doc_id") % 3 === 0).count() + 1L
    assert(nDocsServed === nExpected,
      s"backfill lost pre-protocol batches: serving $nDocsServed of $nExpected docs")

    // IVFADC twin: begin leaves the ANN read on its committed snapshot,
    // and a crashed reassign-log write under the allocated physical id —
    // which, if visible, would shadow every base code — changes nothing
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    Selection.writeIvfadcIndex(emb.filter(col("vec_id") < 400), 8,
      s"$tmp/ann")
    def annSearch() =
      Selection.ivfadcSearchIndex(spark, s"$tmp/ann", emb, nQueries = 4,
        k = 5, nprobe = 4, candidates = 64)
        .collect().map(_.toSeq).toSeq
    Selection.appendToIvfadcIndex(emb.filter(col("vec_id") >= 400),
      s"$tmp/ann", batchId = 0L)
    val fullAnn = annSearch()
    val physAnn = graft.ops.Layout.beginBatchCommit(spark, s"$tmp/ann", 0L)
    assert(annSearch() === fullAnn, "begin disturbed the ANN snapshot")
    emb.filter(col("vec_id") < 400).select(col("vec_id"))
      .withColumn("batch_id", lit(physAnn))
      .write.mode("overwrite").partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(s"$tmp/ann/reassign")
    assert(annSearch() === fullAnn,
      "crashed reassign delivery visible before finish")
  }

  test("manifest time travel: AS OF an old version reproduces that snapshot exactly") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val tmp = java.nio.file.Files.createTempDirectory("graft_bmasof").toString
    val terms = Seq("hash", "join", "window")
    def search(asOf: Option[Long]) =
      Selection.bm25SearchIndex(spark, s"$tmp/idx", terms, topK = 20,
        asOfVersion = asOf).collect().map(_.toSeq).toSeq
    Selection.writeBm25Index(docs.filter(col("doc_id") % 2 === 0),
      s"$tmp/idx")
    val vBase = graft.ops.Layout.manifestVersions(spark, s"$tmp/idx").max
    val baseRes = search(None)
    Selection.appendToBm25Index(docs.filter(col("doc_id") % 2 === 1),
      s"$tmp/idx", batchId = 0L)
    val vFull = graft.ops.Layout.manifestVersions(spark, s"$tmp/idx").max
    val fullRes = search(None)
    // a REPLACEMENT delivery of batch 0 moves the current answer...
    Selection.appendToBm25Index(
      docs.filter(col("doc_id") % 2 === 1 && col("doc_id") % 3 === 0),
      s"$tmp/idx", batchId = 0L)
    val newRes = search(None)
    assert(newRes !== fullRes, "fixture versions not distinguishable")
    assert(fullRes !== baseRes, "fixture versions not distinguishable")
    // ...but every published version still reproduces ITS answer: the
    // manifests are immutable and superseded files survive until vacuum
    assert(search(Some(vFull)) === fullRes,
      "AS OF the pre-replacement version drifted")
    assert(search(Some(vBase)) === baseRes,
      "AS OF the base version drifted")
    // an unpublished version is an audit error, never a silent fallback
    intercept[IllegalArgumentException] { search(Some(9999L)) }
    // vacuum is the retention horizon: past versions' superseded files go
    assert(graft.ops.Layout.vacuumLayout(spark, s"$tmp/idx") > 0)
    assert(search(None) === newRes)
  }

  test("compactSearchRoot carries the ann and quality_model siblings across the swap") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_rootcmp").toString
    val full = Selection.retrievalIndex(spark, "/root/testdata/sf0.001")
    Selection.compactSearchRoot(spark, full, s"$tmp/out")
    val terms = Seq("hash", "join", "window")
    def search(root: String) =
      Selection.bm25SearchIndex(spark, root, terms, topK = 20)
        .collect().map(_.toSeq).toSeq
    // lexical leg folded + identical
    val out = search(s"$tmp/out")
    assert(out === search(full) && out.nonEmpty)
    // siblings survived: the publish-by-rename swap leaves /similar and
    // /quality serving (readable layouts, identical content)
    assert(spark.read.parquet(s"$tmp/out/ann/cents").count() ===
      spark.read.parquet(s"$full/ann/cents").count())
    assert(spark.read.parquet(s"$tmp/out/quality_model").collect()
        .map(_.toSeq).toSet ===
      spark.read.parquet(s"$full/quality_model").collect()
        .map(_.toSeq).toSet)
  }

  test("dupSpans: consecutive shared gram starts merge into one cut-ready interval") {
    // Both docs share their first 9 tokens, then diverge: gram starts 0 and
    // 1 are shared, start 2 onward differ — one island per doc covering
    // token positions [0, 8] (9 tokens), from exactly 2 shared grams.
    val shared9 = (1 to 9).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      doc(1L, s"$shared9 x1 x2"),
      doc(2L, s"$shared9 y1 y2")).toDF(docCols: _*)
    val out = Selection.dupSpans(docs).orderBy("doc_id").collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Long]("span_start") === 0L)
      assert(r.getAs[Long]("span_end") === 8L)
      assert(r.getAs[Long]("n_grams") === 2L)
      assert(r.getAs[Long]("n_tokens") === 9L)
    }
    // a doc with no shared grams emits no interval at all
    val lone = Seq(doc(3L, (1 to 20).map(i => s"z$i").mkString(" ")))
      .toDF(docCols: _*)
    assert(Selection.dupSpans(docs.unionByName(lone))
      .filter(col("doc_id") === 3L).count() === 0L)

    // the rewriter applies the intervals: shared prefix cut, unique tails
    // kept; the untouched doc passes through whole
    val clean = Selection.despanCorpus(docs.unionByName(lone))
      .orderBy("doc_id").collect()
    assert(clean.map(_.getAs[String]("clean_text")).toSeq ===
      Seq("x1 x2", "y1 y2", (1 to 20).map(i => s"z$i").mkString(" ")))
    assert(clean.map(_.getAs[Long]("n_kept")).toSeq === Seq(2L, 2L, 20L))
    assert(clean.map(_.getAs[Long]("n_tokens")).toSeq === Seq(11L, 11L, 20L))
  }

  test("bpe batched trainer: disjoint merges land together, conflicts defer, exhausted round no-ops") {
    // Hand-derived: round 1 pairs are "a b":4, "x y":3, "b a":2 — ranks
    // 1, 2, 3. (x,y) is disjoint from (a,b) → kept alongside it; (b,a)
    // shares BOTH symbols with rank 1 → dropped. Applying both kept merges
    // turns abab into [ab, ab] and xy into [xy], so round 2's only pair is
    // "ab ab":2. Round 3 has no pairs at all (every word one symbol):
    // empty candidate table, no output row, and the merge application must
    // be a no-op rather than row-destroying.
    val docs = Seq(
      doc(1L, "abab abab"),
      doc(2L, "xy xy xy")).toDF(docCols: _*)
    val out = TextAnalysis.bpeTrainBatched(docs, rounds = 3, batch = 3)
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 1L, "a b", 4L), (1L, 2L, "x y", 3L), (2L, 1L, "ab ab", 2L)))
  }

  test("bpe encode: three trained merges compress the dominant word to one token") {
    // Corpus-wide winners, hand-derived: r1 "a b" (freq 4 beats ba:2, xy:3),
    // r2 "x y" (3 beats "ab ab":2), r3 "ab ab". So "abab" ends as ONE token
    // [abab] and "xy" as ONE token [xy]; char counts are untouched.
    val docs = Seq(
      doc(1L, "abab abab"),
      doc(2L, "xy xy xy")).toDF(docCols: _*)
    val out = TextAnalysis.bpeEncode(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L, 8L, 2L), (2L, 3L, 6L, 3L)))
    // encoder applies the LAST round's winner too — with only 2 rounds,
    // "abab" stays two [ab] tokens
    val two = TextAnalysis.bpeEncode(docs, rounds = 2).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(two === Seq((1L, 2L, 8L, 4L), (2L, 3L, 6L, 3L)))
  }

  test("bpe vocab: token doc/occurrence counts match the hand-derived merges") {
    val docs = Seq(
      doc(1L, "abab abab"),
      doc(2L, "xy xy xy")).toDF(docCols: _*)
    // after r1 a+b, r2 x+y, r3 ab+ab: doc1 = [abab]x2, doc2 = [xy]x3
    val v3 = TextAnalysis.bpeVocab(docs, rounds = 3)
      .as[(String, Long, Long)].collect().toSeq
    assert(v3 === Seq(("abab", 1L, 2L), ("xy", 1L, 3L)))
    // with 2 rounds the last merge is absent: doc1 stays [ab][ab] per word
    val v2 = TextAnalysis.bpeVocab(docs, rounds = 2)
      .as[(String, Long, Long)].collect().toSeq
    assert(v2 === Seq(("ab", 1L, 4L), ("xy", 1L, 3L)))
  }

  test("bpe decode round-trip: stripping separators reproduces every word exactly") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      doc(1L, "abab abab"),
      doc(2L, "xy xy xy"),
      doc(3L, "ba ba abab")).toDF(docCols: _*)
    val seg = TextAnalysis.bpeSegment(docs, rounds = 3)
      .filter(col("doc_id").isNotNull)
    val dec = TextAnalysis.bpeDecode(seg)
    // the lossless law: decoded == word on EVERY row
    assert(dec.filter(col("decoded") =!= col("word")).isEmpty)
    // and nothing was dropped or invented: the decoded multiset equals the
    // eligible (len >= 2, lowercased) word multiset of the corpus
    val decoded = dec.groupBy("doc_id", "decoded").count()
    val words = docs.filter(col("doc_id").isNotNull)
      .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("doc_id"), col("w").as("decoded")).count()
    assert(decoded.exceptAll(words).isEmpty && words.exceptAll(decoded).isEmpty)
  }

  test("bpe encode from a persisted merge table equals the inline-trained encode bit-for-bit") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      doc(1L, "abab abab"),
      doc(2L, "xy xy xy"),
      doc(3L, "ba ba abab")).toDF(docCols: _*)
    val inline = TextAnalysis.bpeEncode(docs, rounds = 3).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // ship the unbatched trainer's table (rk lifts to 1), round-trip it
    // through parquet — the production artifact path — and encode from it
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpe_tbl").toString
    TextAnalysis.bpeTrainRounds(docs, rounds = 3)
      .withColumn("rk", lit(1L))
      .write.mode("overwrite").parquet(tmp)
    val fromTable = TextAnalysis.bpeEncodeWith(docs,
      spark.read.parquet(tmp), maxMerges = 3).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(fromTable === inline,
      "table-fed encode diverged from the inline-trained encode")
    // ranks past the table's end are no-ops, not row-destroyers
    val padded = TextAnalysis.bpeEncodeWith(docs,
      spark.read.parquet(tmp), maxMerges = 9).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(padded === inline, "absent merge ranks must be no-ops")
    // and the batched trainer's gapped ranks apply in (round, rk) order:
    // its table for this corpus merges (a,b)+(x,y) together, then (ab,ab)
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_bpe_tbl2").toString
    TextAnalysis.bpeTrainBatched(docs, rounds = 3, batch = 3)
      .write.mode("overwrite").parquet(tmp2)
    val batched = TextAnalysis.bpeEncodeWith(docs,
      spark.read.parquet(tmp2), maxMerges = 9).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // same final segmentation on this corpus: all three merges applied
    assert(batched.map(t => (t._1, t._2, t._3)) ===
      inline.map(t => (t._1, t._2, t._3)))
  }

  test("bpe vocab from a persisted merge table equals the inline-trained vocab bit-for-bit") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      doc(1L, "abab abab"),
      doc(2L, "xy xy xy"),
      doc(3L, "ba ba abab")).toDF(docCols: _*)
    val inline = TextAnalysis.bpeVocab(docs, rounds = 3)
      .as[(String, Long, Long)].collect().toSeq
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpe_vtbl").toString
    TextAnalysis.bpeTrainRounds(docs, rounds = 3)
      .withColumn("rk", lit(1L))
      .write.mode("overwrite").parquet(tmp)
    val fromTable = TextAnalysis.bpeVocabWith(docs,
      spark.read.parquet(tmp), maxMerges = 3)
      .as[(String, Long, Long)].collect().toSeq
    assert(fromTable === inline,
      "table-fed vocab diverged from the inline-trained vocab")
    // ranks past the table's end are no-ops here too
    val padded = TextAnalysis.bpeVocabWith(docs,
      spark.read.parquet(tmp), maxMerges = 9)
      .as[(String, Long, Long)].collect().toSeq
    assert(padded === inline, "absent merge ranks must be no-ops")
  }

  test("dsir: target-like raw docs outweigh off-domain ones; deterministic") {
    // Target (src1) speaks vocabulary A; half the raw docs speak A, half
    // speak B. The log-likelihood-ratio weight must rank every A-speaking
    // raw doc above every B-speaking one — the Gumbel noise (|g| <= ~42e6
    // micro) is orders below the vocabulary separation on these doc sizes.
    val vocabA = (1 to 8).map(i => s"alpha$i")
    val vocabB = (1 to 8).map(i => s"beta$i")
    def speak(v: Seq[String], seed: Int) =
      (0 until 60).map(j => v((j * 7 + seed) % v.size)).mkString(" ")
    val docs = (
      (0 until 5).map(i => (100L + i, speak(vocabA, i), "en", "src1",
        60L)) ++
      (0 until 10).map(i => (i.toLong, speak(vocabA, i + 1), "en", "web",
        60L)) ++
      (10 until 20).map(i => (i.toLong, speak(vocabB, i), "en", "web",
        60L))).toDF(docCols: _*)
    val out = Selection.dsirResample(docs, k = 10)
    val picked = out.select("doc_id").as[Long].collect().toSet
    assert(picked === (0L until 10L).toSet,
      s"expected the 10 A-speaking raw docs, got $picked")
    // target docs are never selected (they're the reference, not the pool)
    assert(picked.forall(_ < 100L))
    // deterministic end-to-end (hash-drawn Gumbel, no RNG state)
    assert(out.exceptAll(Selection.dsirResample(docs, k = 10)).isEmpty)
  }
}
