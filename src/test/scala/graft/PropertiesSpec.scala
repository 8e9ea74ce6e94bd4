package graft

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.ops.{Ratios, Statements}

/** Property-based invariants (SURVEY §5 item 3) over generated fact tables:
  * dedup emits <=1 row per key; pivot row-count == distinct keys; fcf
  * null-propagation + A6 sign; safeDiv totality. Plain ScalaCheck (no
  * scalatest bridge in the offline cache); Spark jobs are expensive so
  * minSuccessful is kept low. */
object PropertiesSpec extends Properties("graft") {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withMaxSize(30)

  private val factGen = for {
    cik <- Gen.oneOf("c1", "c2", "c3")
    fy <- Gen.choose(2018, 2021)
    tag <- Gen.oneOf("Revenues", "Assets", "NetIncomeLoss")
    value <- Gen.choose(-1000.0, 1000.0)
    filedDay <- Gen.choose(0, 364)
    id <- Gen.choose(1L, 100000L)
  } yield (cik, fy, tag, value,
    Date.valueOf(java.time.LocalDate.of(2022, 1, 1).plusDays(filedDay)), id)

  private val tableGen = Gen.nonEmptyListOf(factGen)

  property("latestWins emits exactly one row per distinct key") =
    Prop.forAll(tableGen) { facts =>
      val df = facts.toDF("cik", "fiscal_year", "tag", "value", "filed", "fact_id")
      val out = Statements.latestWins(
        Seq("cik", "fiscal_year", "tag"), Statements.dedupOrder)(df)
      val maxPerKey = out.groupBy("cik", "fiscal_year", "tag").count()
        .agg(max("count")).collect().head.getLong(0)
      val keys = df.select("cik", "fiscal_year", "tag").distinct().count()
      maxPerKey == 1L && out.count() == keys
    }

  property("pivot row-count equals distinct (cik, fiscal_year)") =
    Prop.forAll(tableGen) { facts =>
      val df = facts.toDF("cik", "fiscal_year", "tag", "value", "filed", "fact_id")
      val deduped = Statements.latestWins(
        Seq("cik", "fiscal_year", "tag"), Statements.dedupOrder)(df)
        .select("cik", "fiscal_year", "tag", "value")
      Statements.pivotWide(deduped).count() ==
        df.select("cik", "fiscal_year").distinct().count()
    }

  private val pairGen = Gen.nonEmptyListOf(for {
    a <- Gen.option(Gen.choose(-100.0, 100.0))
    b <- Gen.option(Gen.frequency(1 -> Gen.const(0.0), 3 -> Gen.choose(-100.0, 100.0)))
  } yield (a, b))

  property("safeDiv: null iff denominator null/zero or numerator null") =
    Prop.forAll(pairGen) { pairs =>
      pairs.toDF("a", "b")
        .select(col("a"), col("b"), Ratios.safeDiv(col("a"), col("b")).as("r"))
        .collect().forall { r =>
          val ok = (r.isNullAt(0), r.isNullAt(1)) match {
            case (false, false) if r.getDouble(1) != 0.0 =>
              !r.isNullAt(2) && r.getDouble(2) == r.getDouble(0) / r.getDouble(1)
            case _ => r.isNullAt(2)
          }
          ok
        }
    }

  // ---------------------------------------------------------------------
  // Custom joins vs brute-force references on generated tables
  // ---------------------------------------------------------------------

  private val asofGen = for {
    lefts <- Gen.nonEmptyListOf(for {
      k <- Gen.oneOf("a", "b")
      t <- Gen.choose(0, 50)
    } yield (k, t))
    rights <- Gen.listOf(for {
      k <- Gen.oneOf("a", "b")
      t <- Gen.choose(0, 50)
    } yield (k, t))
  } yield (lefts.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
    // as-of contract requires <=1 right row per (key, time)
    rights.distinct.zipWithIndex.map { case ((k, t), i) => (k, t, s"r$i") })

  property("asof join == brute-force latest right at-or-before, per key") =
    Prop.forAll(asofGen) { case (lefts, rights) =>
      val l = lefts.toDF("id", "k", "t")
      val r = rights.toDF("k", "rt", "tag")
      val out = graft.ops.AsofJoin.asof(l, r, Seq("k"), "t", "rt", Seq("tag"))
        .collect().map(x => x.getLong(0) -> Option(x.getAs[String]("asof_tag"))).toMap
      lefts.forall { case (id, k, t) =>
        val expected = rights.filter(x => x._1 == k && x._2 <= t)
          .sortBy(x => (x._2, x._3)).lastOption.map(_._3)
        // ties on rt impossible (distinct) so lastOption by rt is THE answer
        out(id) == expected
      }
    }

  private val rangeGen = for {
    ivs <- Gen.nonEmptyListOf(for {
      k <- Gen.oneOf("a", "b")
      s <- Gen.choose(0, 300)
      len <- Gen.choose(0, 400)
    } yield (k, s, s + len))
    pts <- Gen.nonEmptyListOf(for {
      k <- Gen.oneOf("a", "b")
      t <- Gen.choose(0, 700)
    } yield (k, t))
  } yield (ivs.zipWithIndex.map { case ((k, s, e), i) => (i.toLong, k, s, e) },
    pts.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) })

  property("bucketed range join == brute-force containment filter") =
    Prop.forAll(rangeGen) { case (ivs, pts) =>
      def date(days: Int) = Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(days))
      val ivDf = ivs.map { case (id, k, s, e) => (id, k, date(s), date(e)) }
        .toDF("iv_id", "k", "start", "end")
      val ptDf = pts.map { case (id, k, t) => (id, k, date(t)) }
        .toDF("pt_id", "k", "t")
      val out = graft.ops.RangeJoin.containmentJoin(ivDf, ptDf,
        Seq("k"), "start", "end", "t")
        .select("iv_id", "pt_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for {
        (ivId, ik, s, e) <- ivs
        (ptId, pk, t) <- pts
        if ik == pk && t >= s && t <= e
      } yield (ivId, ptId)).toSet
      out == expected
    }

  private val wideGen = Gen.nonEmptyListOf(for {
    n <- Gen.choose(0, 1000000)
    ocf <- Gen.option(Gen.choose(-500.0, 500.0))
    capex <- Gen.option(Gen.choose(-500.0, 500.0))
  } yield (s"c$n", 2020, ocf, capex))

  property("fcf defined iff ocf and capex both present; capex >= 0 after A6") =
    Prop.forAll(wideGen) { rows0 =>
      val base = rows0.toDF("cik", "fiscal_year",
        "NetCashProvidedByUsedInOperatingActivities",
        "PaymentsToAcquirePropertyPlantAndEquipment")
      val padded = graft.sec.SecTags.coreTags
        .filterNot(t => t == "NetCashProvidedByUsedInOperatingActivities" ||
          t == "PaymentsToAcquirePropertyPlantAndEquipment")
        .foldLeft(base)((df, t) => df.withColumn(t, lit(null).cast("double")))
      Statements.derive(padded)
        .select("operating_cash_flow", "capex", "free_cash_flow")
        .collect().forall { r =>
          val defined = !r.isNullAt(0) && !r.isNullAt(1)
          defined == !r.isNullAt(2) && (r.isNullAt(1) || r.getDouble(1) >= 0.0)
        }
    }

  private val edgeListGen = Gen.nonEmptyListOf(for {
    a <- Gen.choose(1L, 12L)
    b <- Gen.choose(1L, 12L)
    if a != b
  } yield (math.min(a, b), math.max(a, b)))

  property("connectedComponents matches brute-force union-find") =
    Prop.forAll(edgeListGen) { edges =>
      val got = graft.llm.Dedup.connectedComponents(
        edges.toDF("doc_id_a", "doc_id_b"), "doc_id_a", "doc_id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: textbook union-find with path compression
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(x => x -> find(x)).toMap
      got == expected
    }

  private val packDocsGen = Gen.nonEmptyListOf(for {
    id <- Gen.choose(1L, 1000000L)
    nTok <- Gen.choose(1, 40)
    shard <- Gen.oneOf("en", "es")
  } yield (id, Seq.fill(nTok)("w").mkString(" "), shard))
    .map(_.distinctBy(_._1))

  property("packing: chunks at capacity except shard tails; tokens fully covered") =
    Prop.forAll(packDocsGen, Gen.choose(4, 16)) { (docs, chunkTokens) =>
      val df = docs.toDF("doc_id", "text", "lang")
      val m = graft.llm.Packing.chunkManifest(df, "lang", chunkTokens).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val perDoc = m.groupBy(_._3).view.mapValues(_.map(_._4).sum).toMap
      val tokensOf = docs.map { case (id, text, _) =>
        id -> text.split(" ").length.toLong }.toMap
      val covered = tokensOf.forall { case (id, n) => perDoc.getOrElse(id, 0L) == n }
      val lastChunk = m.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val capacities = m.groupBy(x => (x._1, x._2)).forall { case ((sh, c), rows) =>
        val s = rows.map(_._4).sum
        if (c == lastChunk(sh)) s <= chunkTokens else s == chunkTokens
      }
      covered && capacities
    }

  // Adversarial corpora for the prefix-filter losslessness claim: tiny and
  // empty-gram docs (text shorter than the trigram width), exact duplicates,
  // shared prefixes, and multiple buckets.
  private val jaccardDocsGen = Gen.nonEmptyListOf(for {
    id <- Gen.choose(1L, 1000000L)
    base <- Gen.oneOf("", "ab", "alpha beta gamma delta", "alpha beta gamma",
      "the quick brown fox jumps", "the quick brown dog sits",
      "zzz yyy xxx www", "lorem ipsum dolor sit amet")
    suffix <- Gen.oneOf("", " tail", " tail two")
    src <- Gen.oneOf("s1", "s2")
  } yield (id, base + suffix, "en", src)).map(_.distinctBy(_._1))

  property("ngram Jaccard: prefix tier emits the identical pair set (lossless)") =
    Prop.forAll(jaccardDocsGen, Gen.oneOf(0.3, 0.5, 0.6, 0.8)) { (docs, t) =>
      val df = docs.toDF("doc_id", "text", "lang", "source")
      def pairs(prefix: Boolean) =
        graft.llm.Dedup.ngramJaccardPairs(df, Seq("source"), t, prefix)
          .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      pairs(prefix = true) == pairs(prefix = false)
    }

  private val bm25DocsGen: Gen[List[(Long, String, String, String, Long)]] =
    Gen.nonEmptyListOf(for {
      id <- Gen.choose(1L, 100000L)
      nWords <- Gen.choose(1, 30)
      words <- Gen.listOfN(nWords, Gen.oneOf("alpha", "beta", "gamma",
        "delta", "filler", "pad", "noise"))
    } yield (id, words.mkString(" "), "en", "web", words.mkString(" ").length.toLong))
      .map(_.distinctBy(_._1))

  property("bm25: one extra occurrence of a query term never lowers a doc's score") =
    Prop.forAll(bm25DocsGen) { docs =>
      val base = docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      val target = docs.head
      // same doc with the query term appended once; dl grows by one token,
      // but tf-saturation monotonicity must dominate for the OWN doc
      val boosted = (docs.tail :+
        (target._1, target._2 + " alpha", target._3, target._4, target._5))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      def score(df: org.apache.spark.sql.DataFrame): Long =
        graft.llm.TextAnalysis.bm25Rank(df, Seq("alpha"), topK = 1000)
          .filter(col("doc_id") === target._1)
          .collect().headOption.map(_.getAs[Long]("score_micro")).getOrElse(0L)
      score(boosted) >= score(base)
    }

  // ---- media codec round trips (pure JVM — no Spark job per case) ----

  private val bmpGen = for {
    w <- Gen.choose(1, 40)
    h <- Gen.choose(1, 30)
    px <- Gen.listOfN(w * h * 3,
      Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
  } yield (w, h, px)

  property("BMP codec: decode(encode(px)) == px across every stride/padding") =
    Prop.forAll(bmpGen) { case (w, h, px) =>
      val (dw, dh, back) =
        ops.MediaCodec.decodeBmp(ops.MediaCodec.encodeBmp(w, h, px))
      dw == w && dh == h && back.sameElements(px)
    }

  property("WAV codec: the chunk walk recovers every sample and the rate") =
    Prop.forAll(Gen.choose(8000, 48000),
      Gen.nonEmptyListOf(Gen.choose(Short.MinValue, Short.MaxValue))) {
      (rate, ss) =>
        val samples = ss.toArray
        val (r, back) =
          ops.MediaCodec.decodeWav(ops.MediaCodec.encodeWav(rate, samples))
        r == rate && back.sameElements(samples)
    }

  private val videoGen = for {
    w <- Gen.choose(1, 8)
    h <- Gen.choose(1, 8)
    nf <- Gen.choose(1, 6)
    frames <- Gen.listOfN(nf, Gen.listOfN(w * h * 3,
      Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
  } yield (w, h, frames)

  property("video container: every frame slices back bit-identical") =
    Prop.forAll(videoGen) { case (w, h, frames) =>
      val (dw, dh, n, at) =
        ops.MediaCodec.decodeVideo(ops.MediaCodec.encodeVideo(w, h,
          frames.toArray))
      dw == w && dh == h && n == frames.length &&
        frames.indices.forall(i => at(i).sameElements(frames(i)))
    }

  property("PPS sample: selection is invariant under any constant weight scale") =
    Prop.forAll(bm25DocsGen, Gen.oneOf(3L, 17L, 1000L)) { (docs, scale) =>
      val df = docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      val scaled = df.withColumn("n_chars", col("n_chars") * scale)
      def sel(d: org.apache.spark.sql.DataFrame) =
        graft.llm.Selection.seqPoissonSample(d, k = 3)
          .select("source", "rk", "doc_id")
          .collect().map(_.toSeq).toSet
      sel(df) == sel(scaled)
    }

  // ANALYZE shard law: however the rows are hash-sharded (any modulus, so
  // shard counts of 1..5 including empty shards), the merged wide partials
  // finalize to EXACTLY the one-shot stats — counts add, native min/max
  // fold, HLL registers max; none is order- or layout-sensitive. Nullable
  // lang exercises null_count and null-skipping NDV through the merge.
  private val statsDocGen = for {
    id <- Gen.choose(1L, 100000L)
    lang <- Gen.option(Gen.oneOf("en", "fr", "de"))
    source <- Gen.oneOf("web", "books", "code")
    n <- Gen.choose(-50L, 5000L)
  } yield (id, lang, source, n)

  property("ANALYZE shard merge == one-shot for any shard layout") =
    Prop.forAll(Gen.nonEmptyListOf(statsDocGen), Gen.choose(1, 5)) {
      (rows, nShards) =>
        val df = rows.toDF("doc_id", "lang", "source", "n_chars")
        val cols = Seq("doc_id", "lang", "source", "n_chars")
        val shards = (0 until nShards).map(i =>
          ops.Analyze.statsShard(
            df.where(pmod(col("doc_id"), lit(nShards)) === i), cols))
          .reduce(_ unionByName _)
        ops.Analyze.statsFromShards(shards, cols).collect().toSeq ==
          ops.Analyze.columnStats(df, cols).collect().toSeq
    }

  // CMS merge law: however the keys are sharded, the counter-additive fold
  // of shard sketches is BYTE-identical to the one-shot sketch (integer
  // sums — order- and layout-free), the invariant both the q175-style
  // shard gates and the streaming maintenance lean on.
  property("CMS shard merge == one-shot bytes for any shard layout") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(1L, 40L)), Gen.choose(1, 5)) {
      (keys, nShards) =>
        val df = keys.toDF("k")
        val shards = (0 until nShards).map(i =>
          df.where(pmod(col("k"), lit(nShards)) === i)
            .agg(graft.expr.Cms.sketch(col("k")).as("sk")))
          .reduce(_ unionByName _)
        val merged = shards.agg(graft.expr.Cms.merge(col("sk")).as("sk"))
          .collect().head.getAs[Array[Byte]](0)
        val oneShot = df.agg(graft.expr.Cms.sketch(col("k")).as("sk"))
          .collect().head.getAs[Array[Byte]](0)
        java.util.Arrays.equals(merged, oneShot)
    }

  // Banded exact quantile law: for ANY multiset and any q in (0, 1], the
  // histogram-band algorithm returns exactly the ceil(q*n)-th smallest
  // value (ties, negatives, constant columns, single elements included) —
  // the invariant q180 leans on at corpus scale.
  property("banded quantile == rank-based k-th smallest") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-1000L, 1000L)),
      Gen.choose(1, 100)) { (xs, pct) =>
      val q = pct / 100.0
      val got = ops.Quality.exactQuantileBanded(xs.toDF("v"), col("v"), q)
      got == xs.sorted.apply(math.ceil(q * xs.size).toInt - 1)
    }

  // The grouped (in-plan) variant obeys the same law per group.
  property("grouped banded quantile == per-group rank k-th smallest") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 3), Gen.choose(-500L, 500L))),
      Gen.choose(1, 100)) { (xs, pct) =>
      val q = pct / 100.0
      val got = ops.Quality.groupedQuantileBanded(
          xs.toDF("lang", "v"), "lang", col("v"), q)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val want = xs.groupBy(_._1).map { case (g, vs) =>
        val sorted = vs.map(_._2).sorted
        g -> sorted(math.ceil(q * sorted.size).toInt - 1)
      }
      got == want
    }

  // Quarantine conservation law: for ANY rows (nulls included) and this
  // constraint set, good + quarantined == input as multisets, the two
  // sides are disjoint, and a NULL constraint verdict passes (SQL CHECK
  // semantics) while FALSE quarantines.
  property("enforceConstraints conserves rows; null verdict passes") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.zip(
      Gen.option(Gen.choose(-5L, 5L)), Gen.alphaStr.map(_.take(4))))) { xs =>
      val df = xs.toDF("v", "s")
      val (good, bad) = ops.Quality.enforceConstraints(df, Seq(
        ("v_pos", col("v") > 0), // NULL v → unknown → passes
        ("s_short", length(col("s")) <= 2)))
      val inRows = df.collect().map(_.toSeq).toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      val outRows = (good.collect().map(_.toSeq) ++
          bad.drop("violations").collect().map(_.toSeq)).toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      val nullsPass = good.collect().forall(r => r.isNullAt(0) ||
          r.getLong(0) > 0) &&
        bad.collect().forall(r => !r.isNullAt(0) ||
          !r.getSeq[String](2).contains("v_pos"))
      inRows == outRows && nullsPass
    }

  // VACUUM KEEP horizon law, over arbitrary delivery histories: after d
  // re-deliveries of one logical batch and a vacuum keeping n versions,
  // (a) exactly max(0, d - n) superseded delivery directories are
  // reclaimed, (b) every manifest version inside the horizon still
  // reproduces ITS answer via AS OF, (c) the current read never moves.
  property("VACUUM KEEP n: horizon versions reproduce; d-n dirs reclaimed") =
    Prop.forAll(Gen.choose(2, 4), Gen.choose(1, 5)) { (d, n) =>
      val base = java.nio.file.Files
        .createTempDirectory("graft_vacuum_prop_").toString
      (1 to d).foreach { i =>
        val p = ops.Layout.beginBatchCommit(spark, base, 0L)
        Seq((1L, s"v$i")).toDF("id", "t").withColumn("batch_id", lit(p))
          .write.partitionBy("batch_id").mode("append").parquet(s"$base/t")
        ops.Layout.finishBatchCommit(spark, base, p)
      }
      val versions = ops.Layout.manifestVersions(spark, base) // init + d
      def asOf(v: Long): Seq[String] =
        spark.read.parquet(s"$base/t")
          .filter(ops.Layout.committedBatchFilterAt(spark, base, Some(v)))
          .select("t").collect().map(_.getString(0)).toSeq
      val removed = ops.Layout.vacuumLayout(spark, base, keepVersions = n)
      val horizon = versions.takeRight(n)
      // version 1 + i carries delivery i's content; the init manifest (v1)
      // is empty by construction
      val horizonOk = horizon.forall { v =>
        val expected =
          if (v == versions.head) Seq.empty[String] else Seq(s"v${v - 1}")
        asOf(v) == expected
      }
      removed == math.max(0, d - n).toLong &&
        horizonOk &&
        asOf(versions.last) == Seq(s"v$d")
    }

  // ----- Row-level delete law (r18): for ANY corpus/victim split, the
  // post-takedown minhash index answers probes exactly like an index
  // built from scratch without the victims — rep re-election, group
  // erasure, and the batch-partition rewrite all under one generator.
  // Exact/near-dup structure arises naturally from the tiny token pool.
  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "omega",
    "sigma")
  private val textGen =
    Gen.choose(2, 6).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
  private val corpusGen = for {
    n <- Gen.choose(4, 12)
    texts <- Gen.listOfN(n, textGen)
    // strict subset: deleting EVERY indexed doc is the root's retirement
    // (resetCommitLog / remove), not a takedown — the documented contract
    victims <- Gen.someOf(0 until n) suchThat (_.size < n)
  } yield (texts, victims.toSet)

  property("minhash takedown == fresh build without the victims (probe law)") =
    Prop.forAll(corpusGen, Gen.listOfN(2, textGen)) {
      case ((texts, victimIdx), deltaTexts) =>
        val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val corpus = texts.zipWithIndex.map { case (t, i) =>
          (i.toLong, t, "en", "s", t.length.toLong)
        }
        val victims = victimIdx.map(_.toLong).toSeq.sorted
        val delta = deltaTexts.zipWithIndex.map { case (t, i) =>
          (1000L + i, t, "en", "d", t.length.toLong)
        }.toDF(cols: _*)
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_tkdn_prop_").toString
        llm.Dedup.writeMinhashIndex(corpus.toDF(cols: _*), s"$tmp/idx")
        if (victims.nonEmpty)
          llm.Dedup.deleteDocsFromMinhashIndex(spark, s"$tmp/idx", victims)
        llm.Dedup.writeMinhashIndex(
          corpus.filterNot(c => victimIdx.contains(c._1.toInt))
            .toDF(cols: _*), s"$tmp/fresh")
        def probe(p: String): Seq[(Long, Long)] =
          llm.Dedup.probeMinhashIndex(spark, delta, p, 0.8)
            .select("doc_id_a", "doc_id_b").collect()
            .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        probe(s"$tmp/idx") == probe(s"$tmp/fresh")
    }
}
