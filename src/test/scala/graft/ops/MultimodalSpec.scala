package graft.ops

import graft.SparkSpec

/** Multimodal plumbing: the real codec round trips, decoded-feature
  * extraction, and the container-size contract q30's oracle adjudicates. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world", "en", "s1", 11L),
    (2L, "spark", "en", "s2", 5L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("encodeMedia: container sizes match each format's closed form") {
    implicit val s = spark
    val rows = Multimodal.encodeMedia(docs).collect().sortBy(_.doc_id)
    for ((r, meta) <- rows.zip(Seq((1L, 11L), (2L, 5L)))) {
      val (d, nChars) = meta
      val w = (nChars % 24 + 8).toInt
      val h = (d % 18 + 6).toInt
      val stride = (3 * w + 3) / 4 * 4
      assert(r.image.length === 54 + h * stride, s"doc $d BMP size")
      val n = (nChars % 256 + 64).toInt
      assert(r.audio.length === 58 + 2 * n, s"doc $d WAV size")
      val nf = (d % 6 + 2).toInt
      assert(r.video.length === 16 + nf * w * h * 3, s"doc $d GVF1 size")
    }
  }

  // ------------------------------------------------------- real codecs

  test("BMP: byte-exact round trip across padding widths; malformed input refused") {
    val rng = new scala.util.Random(7)
    // w=8 pads 0, w=10 pads 2, w=9 pads 1, w=11 pads 3 — every stride case
    for (w <- Seq(8, 9, 10, 11); h <- Seq(1, 5)) {
      val px = Array.fill(w * h * 3)(rng.nextInt(256).toByte)
      val (dw, dh, back) = MediaCodec.decodeBmp(MediaCodec.encodeBmp(w, h, px))
      assert((dw, dh) === (w, h))
      assert(back === px, s"round trip broke at w=$w h=$h")
    }
    intercept[IllegalArgumentException] {
      MediaCodec.decodeBmp("notabmp".getBytes ++ new Array[Byte](64))
    }
  }

  test("WAV: round trip walks past the planted junk chunk; validates format") {
    val rng = new scala.util.Random(11)
    val samples = Array.fill(333)((rng.nextInt(65536) - 32768).toShort)
    val bytes = MediaCodec.encodeWav(16000, samples)
    // the junk chunk really is between fmt and data
    assert(new String(bytes, 36, 4, "US-ASCII") === "jnk ")
    val (rate, back) = MediaCodec.decodeWav(bytes)
    assert(rate === 16000)
    assert(back === samples)
    intercept[IllegalArgumentException] {
      MediaCodec.decodeWav("RIFFxxxxJUNK".getBytes ++ new Array[Byte](32))
    }
  }

  test("video container: header + lazy frame slicing round trip") {
    val rng = new scala.util.Random(13)
    val frames = Array.fill(5)(Array.fill(4 * 3 * 3)(rng.nextInt(256).toByte))
    val (w, h, nf, frame) =
      MediaCodec.decodeVideo(MediaCodec.encodeVideo(4, 3, frames))
    assert((w, h, nf) === (4, 3, 5))
    for (f <- 0 until 5) assert(frame(f) === frames(f))
  }

  test("aHash is position-sensitive: a scanline flip changes bands, not sums") {
    // guards the bottom-up un-flip: channel SUMS are order-invariant, so
    // only the resize-sampled hash can catch a decoder that forgets to
    // restore top-down row order
    val d = 42L; val w = 16; val h = 12
    val px = MediaCodec.renderFrame(d, w, h)
    val flipped = new Array[Byte](px.length)
    for (y <- 0 until h)
      System.arraycopy(px, y * w * 3, flipped, (h - 1 - y) * w * 3, w * 3)
    val a = Multimodal.imageFeaturesFromBytes(d, MediaCodec.encodeBmp(w, h, px))
    val b = Multimodal.imageFeaturesFromBytes(d, MediaCodec.encodeBmp(w, h, flipped))
    assert((a.sum_b, a.sum_g, a.sum_r) === (b.sum_b, b.sum_g, b.sum_r))
    assert(Seq(a.ahash_b0, a.ahash_b1, a.ahash_b2, a.ahash_b3)
      !== Seq(b.ahash_b0, b.ahash_b1, b.ahash_b2, b.ahash_b3),
      "flip-invariant hash cannot catch scanline-order bugs")
  }

  test("aHash index lifecycle: append == one-shot; point search pruned; replay snapshot-isolated") {
    implicit val s = spark
    import org.apache.spark.sql.functions.{col, lit}
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ahash").toString
    // one-shot reference vs base + appended batch
    Multimodal.writeAhashIndex(corpus, s"$tmp/full")
    Multimodal.writeAhashIndex(corpus.filter(col("doc_id") % 2 === 0),
      s"$tmp/inc")
    Multimodal.appendToAhashIndex(corpus.filter(col("doc_id") % 2 === 1),
      s"$tmp/inc", batchId = 0L)
    def pairs(base: String) =
      Multimodal.ahashPairsFromIndex(spark, base, 8)
        .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    val full = pairs(s"$tmp/full")
    assert(pairs(s"$tmp/inc") === full && full.nonEmpty)
    // and both equal the inline tier
    val inline = Multimodal.imageNearDupPairs(corpus, 8)
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    assert(full === inline)
    // replay idempotent: the re-delivery lands under a fresh delivery id
    // and swaps the manifest — visible rows unchanged, and vacuum returns
    // the physical layout to one copy per batch
    def visibleBands(): Long =
      spark.read.parquet(s"$tmp/inc/bands")
        .filter(Layout.committedBatchFilter(spark, s"$tmp/inc")).count()
    val n = visibleBands()
    Multimodal.appendToAhashIndex(corpus.filter(col("doc_id") % 2 === 1),
      s"$tmp/inc", batchId = 0L)
    assert(visibleBands() === n)
    assert(pairs(s"$tmp/inc") === full)
    assert(Layout.vacuumLayout(spark, s"$tmp/inc") > 0)
    assert(spark.read.parquet(s"$tmp/inc/bands").count() === n)

    // torn partials + an EMPTY recovery delivery: the pre-write clear
    // replaces the crashed attempt's files instead of committing them
    val physT = Layout.beginBatchCommit(spark, s"$tmp/inc", 1L)
    // claim the delivery (pending marker) like the real append does
    Layout.clearPhysicalDelivery(spark, s"$tmp/inc", physT)
    spark.read.parquet(s"$tmp/inc/bands").limit(10)
      .drop("batch_id").withColumn("batch_id", lit(physT))
      .write.mode("append").partitionBy("band", "vb", "batch_id")
      .parquet(s"$tmp/inc/bands")
    Multimodal.appendToAhashIndex(corpus.limit(0), s"$tmp/inc", batchId = 1L)
    assert(pairs(s"$tmp/inc") === full,
      "empty recovery committed the torn partials")
    assert(spark.read.parquet(s"$tmp/inc/bands")
        .filter(col("batch_id") === physT).count() === 0L,
      "torn partials survived the empty recovery")

    // point search == the pair set restricted to one doc
    val probe = full.head.head.asInstanceOf[Long]
    val expected = full.collect {
      case Seq(a: Long, b: Long, hm: Long) if a == probe || b == probe =>
        (if (a == probe) b else a, hm)
    }.sortBy(p => (p._2, p._1))
    val qb = Multimodal.imageFeatures(
        corpus.filter(col("doc_id") === probe)).collect().head
    val got = Multimodal.ahashSearchIndex(spark, s"$tmp/inc",
        Seq(qb.getAs[Long]("ahash_b0"), qb.getAs[Long]("ahash_b1"),
          qb.getAs[Long]("ahash_b2"), qb.getAs[Long]("ahash_b3")),
        8, excludeDocId = probe)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected)
    // the search is directory-pruned on the layout's partition columns
    val plan = Multimodal.ahashSearchIndex(spark, s"$tmp/inc",
        Seq(qb.getAs[Long]("ahash_b0"), qb.getAs[Long]("ahash_b1"),
          qb.getAs[Long]("ahash_b2"), qb.getAs[Long]("ahash_b3")), 8, probe)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("band"),
      s"band pruning missing from the point search:\n$plan")

    // snapshot protocol: begin allocates the next delivery id without
    // disturbing the served pair set — mid-replay a concurrent /imagedup
    // keeps serving the previous committed delivery, never a torn or
    // vanished batch (Layout manifest protocol)
    val physB = Layout.beginBatchCommit(spark, s"$tmp/inc", 0L)
    assert(physB >= Layout.GenStride &&
      Layout.logicalBatchLocal(physB) === 0L)
    assert(pairs(s"$tmp/inc") === full,
      "begin disturbed the served aHash snapshot")

    // negative ids reserved for the base partition
    intercept[IllegalArgumentException] {
      Multimodal.appendToAhashIndex(corpus, s"$tmp/inc", batchId = -1L)
    }

    // offline compaction into a fresh root: pairs identical, fewer files
    val (inF, outF) =
      Multimodal.compactAhashIndex(spark, s"$tmp/inc", s"$tmp/cmp")
    assert(pairs(s"$tmp/cmp") === full)
    assert(outF < inF,
      s"compaction did not shrink the bands layout: $inF -> $outF")
  }

  test("captionFarmPairs: same text + same image excluded; same text + " +
      "different image reported; different texts never pair") {
    val tpl = "subscribe now for daily deals and exclusive offers today"
    val farm = Seq(
      (1L, tpl, "en", "s1", tpl.length.toLong),
      (2L, tpl, "en", "s2", tpl.length.toLong), // same text, SAME image as 1
      (3L, tpl, "en", "s3", tpl.length.toLong), // same text, DIFFERENT image
      (4L, "a genuinely different document body about parquet readers",
        "en", "s4", 58L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    // planted fingerprints (the synthetic generator keys images on doc_id,
    // so identical images across docs only exist via an explicit frame —
    // which is also the operator's contract: any fingerprint source works)
    val feats = Seq(
      (1L, 0x1234L, 0x00FFL, 0xAAAAL, 0x0F0FL),
      (2L, 0x1234L, 0x00FFL, 0xAAAAL, 0x0F0FL),
      (3L, 0xEDCBL, 0xFF00L, 0x5555L, 0xF0F0L), // bitwise-far from 1/2
      (4L, 0x1234L, 0x00FFL, 0xAAAAL, 0x0F0FL)
    ).toDF("doc_id", "ahash_b0", "ahash_b1", "ahash_b2", "ahash_b3")
    val out = Multimodal.captionFarmPairs(farm, feats)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).sortBy(p => (p._1, p._2))
    // (1,2): texts identical but images identical too -> NOT a farm pair;
    // (1,3) and (2,3): template text over a different image -> reported at
    // full 64-bit disagreement; 4 never pairs (different text, despite
    // sharing 1's image)
    assert(out.map(p => (p._1, p._2)).toSeq === Seq((1L, 3L), (2L, 3L)))
    assert(out.forall(p => p._3 === 1.0 && p._4 === 64L))
    // threshold faces: at imgMaxHamming=64 nothing disagrees enough
    assert(Multimodal.captionFarmPairs(farm, feats, imgMaxHamming = 64)
      .count() === 0L)
    // a doc with no fingerprint drops out (cross-modal needs both legs)
    assert(Multimodal.captionFarmPairs(farm, feats.filter($"doc_id" =!= 3L))
      .count() === 0L)
  }

  test("stolenImagePairs: cross-source image matches reported, within-source " +
      "reuse excluded") {
    val srcDocs = Seq(
      (1L, "t1", "en", "hostA", 2L),
      (2L, "t2", "en", "hostA", 2L), // same image as 1, SAME source
      (3L, "t3", "en", "hostB", 2L), // same image as 1, different source
      (4L, "t4", "en", "hostC", 2L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = Seq(
      (1L, 2L, 0L),  // within-source: excluded
      (1L, 3L, 2L),  // cross-source: reported
      (2L, 3L, 2L),  // cross-source: reported
      (3L, 4L, 7L)   // cross-source: reported
    ).toDF("doc_a", "doc_b", "hamming")
    val out = Multimodal.stolenImagePairs(srcDocs, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4))).sortBy(p => (p._1, p._2))
    assert(out.map(p => (p._1, p._2)).toSeq ===
      Seq((1L, 3L), (2L, 3L), (3L, 4L)))
    assert(out.forall(p => p._4 != p._5))
  }

  test("mediaQualityGate: integer-exact flags, keep is their negation, both outcomes occur") {
    implicit val s = spark
    val gate = Multimodal.mediaQualityGate(
      graft.Tables.documents(spark, "/root/testdata/sf0.001")).collect()
    assert(gate.length === 500)
    val kept = gate.count(_.getAs[Boolean]("keep"))
    assert(kept > 0 && kept < 500, s"gate is degenerate: kept $kept/500")
    gate.foreach { r =>
      val flags = Seq("too_dark", "too_bright", "low_structure", "quiet",
        "clipped").map(r.getAs[Boolean])
      assert(r.getAs[Boolean]("keep") === !flags.exists(identity))
    }
  }

  test("decode kernels run one pass per partition over real payloads") {
    implicit val s = spark
    val img = Multimodal.imageFeatures(docs).collect().sortBy(_.getLong(0))
    assert(img.length === 2)
    assert(img.head.getAs[Int]("w") === (11 % 24 + 8))
    assert(img.head.getAs[Int]("h") === (1 % 18 + 6))
    val aud = Multimodal.audioFeatures(docs).collect().sortBy(_.getLong(0))
    assert(aud.head.getAs[Long]("n_samples") === (11 % 256 + 64).toLong)
    assert(aud.head.getAs[Long]("zero_cross") > 0L)
    val vid = Multimodal.videoSignatures(docs).collect().sortBy(_.getLong(0))
    assert(vid.head.getAs[Int]("n_frames") === (1 % 6 + 2))
    assert(vid.head.getAs[String]("sig").split(",").length ===
      vid.head.getAs[Int]("n_sampled"))
  }

  test("direct banded clustering == CC over the pair spelling (two implementations, one answer)") {
    val rng = new scala.util.Random(41)
    def rnd() = rng.nextLong() & 0xffffL
    // mixed fixture: an exact-dup group, a drift chain (A~B~C with the
    // ends > maxHamming apart, so transitivity must do the work), a
    // cross-group near-dup, and singletons
    val h0 = Seq(0x1111L, 0x2222L, 0x3333L, 0x4444L)
    val chain1 = Seq(0x1111L ^ 0x7L, 0x2222L, 0x3333L, 0x4444L)   // ham 3
    val chain2 = Seq(0x1111L ^ 0x7L, 0x2222L ^ 0x70L, 0x3333L ^ 0x700L,
      0x4444L)                                                     // +6 from chain1
    val feats = (
      (0L to 4L).map(i => (i, h0)) ++                              // exact dups
      Seq((10L, chain1), (11L, chain2)) ++                         // drift chain
      (20L to 29L).map(i => (i, Seq(rnd(), rnd(), rnd(), rnd())))  // mostly singles
    ).map { case (id, b) => (id, b(0), b(1), b(2), b(3)) }
      .toDF("doc_id", "ahash_b0", "ahash_b1", "ahash_b2", "ahash_b3")
    val direct = Multimodal.bandedClustersFromFeats(feats, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet
    val viaPairs = graft.llm.Dedup.connectedComponentsFast(
        Multimodal.bandedPairsFromFeats(feats, maxHamming = 8),
        "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet
    assert(direct === viaPairs && direct.nonEmpty)
    // the fixture binds: the chain actually merged into cluster 0
    assert(direct.contains((11L, 0L, false)), direct.toString)
  }

  test("a degenerate fingerprint shared by 10^4 docs clusters without the quadratic pair blowup") {
    // The pair spelling would materialize ~5*10^7 within-group rows (its
    // output contract) and one 10^4-element collect_list row; the direct
    // clustering path must touch neither — one group row, rep-graph CC,
    // one member join. Oracle-by-construction: all duplicate members plus
    // the near group land in cluster 0; the far singleton stays out.
    import org.apache.spark.sql.functions.{col, lit}
    val n = 10000L
    val dup = spark.range(n).select(col("id").as("doc_id"),
      lit(1L).as("ahash_b0"), lit(2L).as("ahash_b1"),
      lit(3L).as("ahash_b2"), lit(4L).as("ahash_b3"))
    val near = Seq((20000L, 1L, 2L, 3L, 100L), (20001L, 1L, 2L, 3L, 100L))
      .toDF("doc_id", "ahash_b0", "ahash_b1", "ahash_b2", "ahash_b3")
    val far = Seq((30000L, 0xF0F0L, 0x0F0FL, 0xAAAAL, 0x5555L))
      .toDF("doc_id", "ahash_b0", "ahash_b1", "ahash_b2", "ahash_b3")
    val labels = Multimodal.bandedClustersFromFeats(
      dup.unionByName(near).unionByName(far), maxHamming = 8)
    val plan = labels.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("collect_list"),
      s"direct clustering built a per-group array row:\n$plan")
    val rows = labels.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.length === (n + 2).toInt, s"got ${rows.length}")
    assert(rows.forall(_._2 == 0L))
    assert(rows.count(_._3) === 1 && rows.find(_._3).get._1 === 0L)
    assert(!rows.exists(_._1 == 30000L), "far singleton leaked into a cluster")
  }
}
