package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Reference-LM perplexity (CCNet pattern, stupid-backoff smoothing):
  * exact per-tier scores on a hand-built corpus, the shard-additivity law,
  * and the drop semantics for unscorable documents. */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  // Reference (trusted source): tokens a b a b c →
  // unigrams a:2 b:2 c:1, N=5; bigrams "a b":2 "b a":1 "b c":1.
  private val corpus = Seq(
    (1L, "a b a b c", "en", "src0"),
    (2L, "a b", "en", "web"), // bigram seen: ln(c1=2) - ln(c_pair=2) = 0
    (3L, "c a", "en", "web"), // backoff tier 2: ln(N=5) - ln(c2=2 * 0.4)
    (4L, "a z", "en", "web"), // OOV tier 3: ln(5) - ln(0.4)
    (5L, "a b", "xx", "web"), // no model for lang xx → dropped
    (6L, "a", "en", "web")    // <2 tokens → no bigrams → absent
  ).toDF("doc_id", "text", "lang", "source")

  private def micro(x: Double): Long = math.floor(x * 1000000 + 0.5).toLong

  test("the three backoff tiers score exactly (integer-micro arithmetic)") {
    val out = LangModel.lmScore(corpus).orderBy("doc_id").collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Double]("avg_surprisal")).toMap
    assert(byId(2L) === micro(0.0) / 1e6)
    assert(byId(3L) ===
      micro(math.log(5.0) - math.log(2.0 * LangModel.Backoff)) / 1e6)
    assert(byId(4L) ===
      micro(math.log(5.0) - math.log(LangModel.Backoff)) / 1e6)
    // reference doc 1 scores too (all its bigrams are tier-1 hits)
    assert(byId.contains(1L))
    // lang without a model and sub-2-token docs are absent, not scored-0
    assert(!byId.contains(5L) && !byId.contains(6L))
  }

  test("the filter keeps docs at the threshold and drops above it") {
    // maxAvg 0.0: only doc 2 (avg exactly 0.0, boundary inclusive) and
    // doc 1 (ln(2/2), ln(2/1)... positive) — compute: doc 1 bigrams
    // a-b (0), b-a (ln2), a-b (0), b-c (ln2) → avg > 0 → dropped.
    val kept = LangModel.lmFilter(corpus, maxAvg = 0.0)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L))
  }

  test("shard-trained merged stats equal the one-shot build and score identically") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val ref = docs.filter(col("source") === LangModel.RefSource)
    val a = ref.filter(col("doc_id") % 2 === 0)
    val b = ref.filter(col("doc_id") % 2 =!= 0)
    val mergedU = LangModel.mergeLmUnigramStats(
      LangModel.lmUnigramStats(a), LangModel.lmUnigramStats(b))
    val oneU = LangModel.lmUnigramStats(ref)
    assert(mergedU.exceptAll(oneU).count() === 0)
    assert(oneU.exceptAll(mergedU).count() === 0)
    val mergedP = LangModel.mergeLmBigramStats(
      LangModel.lmBigramStats(a), LangModel.lmBigramStats(b))
    val oneP = LangModel.lmBigramStats(ref)
    assert(mergedP.exceptAll(oneP).count() === 0)
    assert(oneP.exceptAll(mergedP).count() === 0)
    val sM = LangModel.lmScoreWith(docs, mergedU, mergedP)
    val sO = LangModel.lmScoreWith(docs, oneU, oneP)
    assert(sM.exceptAll(sO).count() === 0)
    assert(sO.exceptAll(sM).count() === 0)
  }

  test("vocab cap: totals preserved exactly, in-vocab scores unchanged, " +
      "the capped-out tail absorbs deterministically into the OOV tiers") {
    // reference: a:4 b:3 c:2, N=9; bigrams (a,a):3 (a,b):1 (b,b):2 (b,c):1
    val ref = Seq((1L, "a a a a b b b c c", "en", "src0"))
      .toDF("doc_id", "text", "lang", "source")
    val uni = LangModel.lmUnigramStats(
      ref.filter(col("source") === "src0"))
    val pair = LangModel.lmBigramStats(
      ref.filter(col("source") === "src0"))
    val (cUni, cPair) = LangModel.capLmModel(uni, pair, maxVocab = 2)
    // the tail FOLDS, never drops: per-lang token totals are exact
    assert(rows(LangModel.lmCorpusStats(cUni)) ===
      rows(LangModel.lmCorpusStats(uni)))
    // vocabulary is bounded by config: 2 kept rows + 1 tail row
    assert(cUni.count() === 3)
    assert(cUni.filter(col("h") === LangModel.OovTailHash)
      .select("c_uni").head.getLong(0) === 2L) // c's folded count
    // bigram rows whose context survived stay; the one c-context row
    // ((c,c)) goes with its dropped context
    assert(pair.count() === 5 && cPair.count() === 4)
    def score(docs: org.apache.spark.sql.DataFrame,
        u: org.apache.spark.sql.DataFrame,
        p: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      LangModel.lmScoreWith(docs, u, p).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Double]("avg_surprisal")).toMap
    // a doc over KEPT vocabulary scores identically under the cap
    val inVocab = Seq((10L, "a b", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    assert(score(inVocab, cUni, cPair)(10L) ===
      score(inVocab, uni, pair)(10L))
    // a doc whose bigram is unseen and whose w2 is the capped-OUT token:
    // uncapped backs off to c's unigram (ln(9/(2*0.4))), capped hits the
    // OOV floor (ln(9/0.4)) — the tail is absorbed deterministically,
    // and the N in both is the SAME 9 (the fold's whole point)
    val oov = Seq((11L, "a c", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    assert(score(oov, uni, pair)(11L) ===
      micro(math.log(9.0) - math.log(2.0 * LangModel.Backoff)) / 1e6)
    assert(score(oov, cUni, cPair)(11L) ===
      micro(math.log(9.0) - math.log(LangModel.Backoff)) / 1e6)
    // capped tables still shard-merge by addition (the tail rows share
    // the sentinel key, so two capped shards fold like any other rows)
    val merged = LangModel.mergeLmUnigramStats(cUni, cUni)
    assert(merged.filter(col("h") === LangModel.OovTailHash)
      .select("c_uni").head.getLong(0) === 4L)
  }

  test("subtractive takedown: subtract(train(all), removed) == " +
      "train(all minus removed) row-for-row; foreign docs refuse") {
    val ref = Seq(
      (1L, "a a a a b b b c c", "en", "src0"),
      (2L, "b c a b a c b a a", "en", "src0"),
      (3L, "d d a b d c d a b", "en", "src0"))
      .toDF("doc_id", "text", "lang", "source")
    val uni = LangModel.lmUnigramStats(ref)
    val pair = LangModel.lmBigramStats(ref)
    val removed = ref.filter(col("doc_id") === 2L)
    val survivors = ref.filter(col("doc_id") =!= 2L)
    val (su, sp) = LangModel.subtractLmStats(uni, pair, removed)
    def uniSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(uniSet(su) === uniSet(LangModel.lmUnigramStats(survivors)))
    assert(uniSet(sp) === uniSet(LangModel.lmBigramStats(survivors)))
    // totals re-derive consistently from the subtracted unigrams
    assert(uniSet(LangModel.lmCorpusStats(su)) ===
      uniSet(LangModel.lmCorpusStats(
        LangModel.lmUnigramStats(survivors))))
    // scoring through the subtracted model == retrained model
    val probe = Seq((10L, "a b c d", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    def sc(u: org.apache.spark.sql.DataFrame,
        p: org.apache.spark.sql.DataFrame) =
      LangModel.lmScoreWith(probe, u, p).collect().map(_.toSeq).toSeq
    assert(sc(su, sp) ===
      sc(LangModel.lmUnigramStats(survivors),
        LangModel.lmBigramStats(survivors)))
    // removing docs the model never trained on: loud refusal (a clamped
    // model matches no corpus), never a silent floor at zero
    val foreign = Seq((99L, "z z z z z z z z z z", "en", "src0"))
      .toDF("doc_id", "text", "lang", "source")
    // the foreign tokens just DROP OUT via the left join (they subtract
    // from nothing) — underflow needs a token the model HAS, with a
    // higher count in the removed frame than the model ever saw
    val overdraft = Seq((99L, "a a a a a a a a a a a a a a", "en", "src0"))
      .toDF("doc_id", "text", "lang", "source")
    val (ou, _) = LangModel.subtractLmStats(uni, pair, overdraft)
    val e = intercept[Exception](ou.collect())
    assert(e.getMessage.contains("underflow") ||
      (e.getCause != null && e.getCause.getMessage.contains("underflow")))
    // and a pure-foreign removal leaves the model untouched (nothing to
    // subtract — its rows simply do not intersect)
    val (fu, fp) = LangModel.subtractLmStats(uni, pair, foreign)
    assert(uniSet(fu) === uniSet(uni) && uniSet(fp) === uniSet(pair))
    // strict containment: the same foreign removal REFUSES up front —
    // every removed key must be a key the model holds
    val se = intercept[IllegalArgumentException](
      LangModel.subtractLmStats(uni, pair, foreign, strict = true))
    assert(se.getMessage.contains("containment"))
    // while a genuinely-contained removal passes strict unchanged
    val (cu, cp) = LangModel.subtractLmStats(uni, pair, removed,
      strict = true)
    assert(uniSet(cu) === uniSet(su) && uniSet(cp) === uniSet(sp))
  }

  test("capped models refuse subtraction (the folded tail hides removed " +
      "mass); the retrain operation == a fresh train on the survivors") {
    val ref = Seq(
      (1L, "a a a a b b b c c", "en", "src0"),
      (2L, "b c a b a c b a a", "en", "src0"),
      (3L, "d d a b d c d a b", "en", "src0"),
      (4L, "scored probe text here", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val (cuni, cpair) = LangModel.capLmModel(
      LangModel.lmUnigramStats(ref.filter(col("source") === "src0")),
      LangModel.lmBigramStats(ref.filter(col("source") === "src0")),
      maxVocab = 2)
    val removed = ref.filter(col("doc_id") === 2L)
    val e = intercept[UnsupportedOperationException](
      LangModel.subtractLmStats(cuni, cpair, removed))
    assert(e.getMessage.contains("Retrain") ||
      e.getMessage.contains("retrain"))
    // the prescribed path: retrain the persisted model on the survivors
    val tmp = java.nio.file.Files.createTempDirectory("graft_lm_retrain")
      .toString
    LangModel.retrainLmModelAfterTakedown(ref, s"$tmp/a",
      victimDocIds = Seq(2L), maxVocab = Some(2))
    LangModel.writeLmModel(ref.filter(col("doc_id") =!= 2L), s"$tmp/b",
      maxVocab = Some(2))
    Seq("uni", "pair").foreach { t =>
      val a = spark.read.parquet(s"$tmp/a/lm_model/$t")
      val b = spark.read.parquet(s"$tmp/b/lm_model/$t")
      assert(a.exceptAll(b).unionByName(b.exceptAll(a)).count() === 0L)
    }
  }

  test("reference docs score lower than the rest (the calibration premise)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val scored = LangModel.lmScore(docs)
      .join(docs.select("doc_id", "source"), "doc_id")
      .groupBy(col("source") === LangModel.RefSource)
      .agg(avg("avg_surprisal").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getAs[Double]("m")).toMap
    assert(scored(true) < scored(false))
  }
}
