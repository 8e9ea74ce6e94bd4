package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sequence packing invariants: contiguous offsets, full coverage, exact
  * chunk capacities except the shard tail. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  // token counts 3, 5, 4, 2 in one shard; chunk size 4 ->
  // stream [0,14): chunks 0..3, last chunk holds 2 tokens
  private val docs = Seq(
    (1L, "a b c", "en"),
    (2L, "d e f g h", "en"),
    (3L, "i j k l", "en"),
    (4L, "m n", "en")
  ).toDF("doc_id", "text", "lang")

  test("packPlan: offsets are contiguous per shard in doc_id order") {
    val p = Packing.packPlan(docs, "lang", 4).orderBy("doc_id").collect()
    assert(p.map(_.getAs[Long]("start_offset")).toSeq === Seq(0L, 3L, 8L, 12L))
    assert(p.map(_.getAs[Long]("end_offset")).toSeq === Seq(3L, 8L, 12L, 14L))
    assert(p.map(_.getAs[Long]("first_chunk")).toSeq === Seq(0L, 0L, 2L, 3L))
    assert(p.map(_.getAs[Long]("last_chunk")).toSeq === Seq(0L, 1L, 2L, 3L))
  }

  test("chunkManifest: chunks sum to capacity except the tail; docs fully covered") {
    val m = Packing.chunkManifest(docs, "lang", 4)
    val perChunk = m.groupBy("chunk_id").agg(sum("tokens_in_chunk").as("n"))
      .orderBy("chunk_id").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(perChunk === Seq(0L -> 4L, 1L -> 4L, 2L -> 4L, 3L -> 2L))
    // every doc's tokens are fully assigned across its chunks
    val perDoc = m.groupBy("doc_id").agg(sum("tokens_in_chunk").as("n"))
      .orderBy("doc_id").collect().map(_.getLong(1))
    assert(perDoc.toSeq === Seq(3L, 5L, 4L, 2L))
  }

  test("null-text docs are dropped, not exploded into descending ranges") {
    val withNull = docs.unionByName(
      Seq((5L, null: String, "en")).toDF("doc_id", "text", "lang"))
    // size(split(NULL)) = -1 would make last_chunk < first_chunk and emit a
    // DESCENDING sequence range; the guard drops the row instead, leaving
    // every other doc's offsets untouched.
    val p = Packing.packPlan(withNull, "lang", 4).orderBy("doc_id").collect()
    assert(p.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(p.map(_.getAs[Long]("end_offset")).toSeq === Seq(3L, 8L, 12L, 14L))
    val m = Packing.chunkManifest(withNull, "lang", 4)
    assert(m.filter(col("tokens_in_chunk") <= 0).isEmpty)
    assert(m.filter(col("doc_id") === 5L).isEmpty)
  }

  test("shards pack independently") {
    val two = docs.withColumn("lang",
      when(col("doc_id") % 2 === 0, "es").otherwise("en"))
    val m = Packing.chunkManifest(two, "lang", 4)
    // en: docs 1,3 -> 7 tokens; es: docs 2,4 -> 7 tokens; both start at chunk 0
    val starts = m.groupBy("shard").agg(min("chunk_id").as("c0"), sum("tokens_in_chunk").as("n"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(starts("en") === ((0L, 7L)) && starts("es") === ((0L, 7L)))
  }

  test("slidingManifest with stride == window equals chunkManifest") {
    val sliding = Packing.slidingManifest(docs, "lang", 4, 4)
      .withColumnRenamed("window_id", "chunk_id")
      .withColumnRenamed("tokens_in_window", "tokens_in_chunk")
    val chunks = Packing.chunkManifest(docs, "lang", 4)
    assert(sliding.exceptAll(chunks).isEmpty && chunks.exceptAll(sliding).isEmpty)
  }

  test("slidingManifest overlap: stream [0,14), window 4, stride 2") {
    val m = Packing.slidingManifest(docs, "lang", 4, 2)
    // windows start at 0,2,...,12: 7 windows; all full except the last
    val perWin = m.groupBy("window_id").agg(sum("tokens_in_window").as("n"))
      .orderBy("window_id").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(perWin === Seq(0L -> 4L, 1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 4L,
      5L -> 4L, 6L -> 2L))
    // interior tokens are covered twice: doc coverage = n_tokens*2 +/- edges
    // doc 2 spans [3,8): windows 0..3 hold 1, 3, 4, 2 of its tokens -> 10
    val d2 = m.filter(col("doc_id") === 2L)
      .agg(sum("tokens_in_window")).head.getLong(0)
    assert(d2 === 10L)
    // every window's doc spans are contiguous: min start = window start
    assert(m.filter(col("tokens_in_window") <= 0).count() === 0)
  }

  test("lengthBucketedBatches: covers every doc once; sorted waste <= arrival-order waste") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val B = 32
    val batches = Packing.lengthBucketedBatches(docs, B).collect()
    val nDocs = docs.count()
    assert(batches.map(_.getAs[Long]("n_docs")).sum === nDocs)
    // every batch full except possibly the last
    assert(batches.init.forall(_.getAs[Long]("n_docs") === B.toLong))
    assert(batches.forall(r => r.getAs[Long]("waste") >= 0))
    // the operator's raison d'être: batching by length strictly beats
    // arrival-order (doc_id-order) batching on total padding waste for
    // any length-diverse corpus
    val lens = docs
      .select(col("doc_id"),
        size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("len"))
      .orderBy("doc_id").collect().map(_.getLong(1))
    val arrivalWaste = lens.grouped(B)
      .map(g => g.length * g.max - g.sum).sum
    val sortedWaste = batches.map(_.getAs[Long]("waste")).sum
    assert(sortedWaste < arrivalWaste,
      s"sorted $sortedWaste !< arrival $arrivalWaste")
    // scale property: the only unpartitioned window runs over the LENGTH
    // HISTOGRAM (distinct lengths), never the corpus rows
    val p = Packing.lengthBucketedBatches(docs, B)
      .queryExecution.sparkPlan.toString
    assert(p.contains("Window"), p)
  }

  test("BPE-count batching ranks on tokenizer cost, not whitespace") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = TextAnalysis.bpeTrainBatched(docs)
    val lens = TextAnalysis.bpeEncodeWith(docs, merges, maxMerges = 9)
      .select(col("doc_id"), col("n_tokens").as("len"))
    val bpe = Packing.lengthBucketedBatchesFromLens(lens, 32).collect()
    // covers exactly the encoded docs, waste non-negative
    assert(bpe.map(_.getAs[Long]("n_docs")).sum === lens.count())
    assert(bpe.forall(_.getAs[Long]("waste") >= 0L))
    // and it is genuinely a different cost model: the BPE token totals
    // differ from the whitespace totals (merges shrink, segmentation
    // into >= 2-char words shifts), so the batch layout is its own
    val ws = Packing.lengthBucketedBatches(docs, 32).collect()
    assert(bpe.map(_.getAs[Long]("sum_len")).sum !==
      ws.map(_.getAs[Long]("sum_len")).sum)
  }

  test("BPE-count chunk manifest keeps the packing invariant: full chunks except shard tails") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val counts = TextAnalysis.bpeEncodeWith(docs,
        TextAnalysis.bpeTrainBatched(docs), maxMerges = 9)
      .select(col("doc_id"), col("n_tokens"))
      .join(docs.select(col("doc_id"), col("lang").as("shard")), "doc_id")
      .select(col("doc_id"), col("shard"), col("n_tokens"))
    val manifest = Packing.chunkManifestFromOffsets(
      Packing.offsetsFromCounts(counts), chunkTokens = 512)
    val perChunk = manifest.groupBy("shard", "chunk_id")
      .agg(sum("tokens_in_chunk").as("n")).collect()
    val lastChunk = perChunk.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).max).toMap
    perChunk.foreach { r =>
      val full512 = r.getLong(1) < lastChunk(r.getString(0))
      if (full512) assert(r.getLong(2) === 512L,
        s"non-tail chunk ${r.getString(0)}/${r.getLong(1)} holds ${r.getLong(2)}")
      else assert(r.getLong(2) <= 512L)
    }
    // total tokens conserved: manifest sums == per-doc BPE counts
    assert(perChunk.map(_.getLong(2)).sum ===
      counts.agg(sum("n_tokens")).collect().head.getLong(0))
  }

  test("lengthBucketedBatches: null/tokenless docs are dropped, same guard as offsets") {
    import spark.implicits._
    // a null text (size() == -1) must neither rank nor drive waste
    // negative; real docs batch exactly as if the null row were absent
    val docs = Seq(
      (1L, "a b c", "en", "s", 5L), (2L, null.asInstanceOf[String], "en", "s", 0L),
      (3L, "d", "en", "s", 1L), (4L, "e f", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Packing.lengthBucketedBatches(docs, batchSize = 2).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === 3L)
    assert(rows.forall(_.getAs[Long]("waste") >= 0L))
    // batches equal those over the clean subset alone
    val clean = Packing.lengthBucketedBatches(
      docs.filter(col("doc_id") =!= 2L), batchSize = 2).collect()
    assert(rows.map(_.toSeq).toSeq === clean.map(_.toSeq).toSeq)
  }
}
