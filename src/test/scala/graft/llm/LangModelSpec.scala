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
