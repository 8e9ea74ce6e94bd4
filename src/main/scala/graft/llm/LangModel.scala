package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextOps._

/** Reference-LM perplexity scoring — the CCNet quality-filter pattern
  * (Wenzek et al. 2019, arXiv:1911.00359): train a per-language n-gram
  * language model on a TRUSTED reference source (CCNet uses Wikipedia; here
  * the synthetic corpus's `source = 'src0'` slice), score every document
  * under its own language's model, and filter on mean per-token surprisal.
  * Low surprisal = fluent, in-domain text; high = boilerplate/noise. This is
  * extension surface (the reference warehouse has no text pipeline) — the
  * self-trained q73/q102 surprisal scores are in-corpus signals; this family
  * adds the out-of-domain scoring CCNet actually filters with: the model is
  * trained on one corpus and applied to another, so unseen tokens/bigrams
  * are normal and smoothing is load-bearing.
  *
  * Smoothing = "stupid backoff" (Brants et al. 2007, "Large Language Models
  * in Machine Translation"): unnormalized scores
  *
  *   S(w2|w1) = c(w1 w2)/c(w1)        if the bigram was seen, else
  *              0.4 * c(w2)/N         if the unigram w2 was seen, else
  *              0.4 * 1/N             (out-of-vocabulary floor)
  *
  * — no discounting or normalization pass, which is exactly why it scales:
  * the model IS the count tables, counts are additive over doc-disjoint
  * shards ([[mergeLmUnigramStats]]/[[mergeLmBigramStats]] — the same
  * composition law as the BM25 stats tables), and training is one
  * map-side-combinable groupBy per n-gram order.
  *
  * Determinism/oracle discipline (SURVEY §7.4): n-grams shuffle as 60-bit
  * md5 hashes ([[TextOps.hash60]]), never strings (the q102 recipe); each
  * per-bigram surprisal −ln S is quantized to integer micros BEFORE the
  * per-doc sum, so aggregation order cannot move a bit; every double op is
  * mirrored term-by-term in the DuckDB oracle.
  *
  * Scale shape (100 TB corpus, bounded reference): the unigram table is
  * vocabulary-sized and the per-lang token totals are one row per language —
  * both broadcast. The bigram table is reference-corpus-bounded (CCNet's
  * per-lang models are a few GB): below the broadcast threshold AQE
  * broadcasts it; beyond, the score join shuffles the exploded corpus ONCE
  * on (lang, hp, hb) while both unigram probes stay map-side. Nothing in
  * the plan is ever keyed on corpus-scale strings.
  */
object LangModel {

  /** Backoff multiplier λ from Brants et al. 2007 §4 (their empirically
    * fixed 0.4). Embedded as a literal on both engines. */
  val Backoff = 0.4

  /** The trusted reference source the per-language models train on. */
  val RefSource = "src0"

  /** Mean-surprisal keep threshold for [[lmFilter]], in nats. Documents at
    * or below it pass (lower surprisal = more reference-like). Calibrated
    * once on the synthetic corpus: reference docs average ~2.2 nats, the
    * rest ~3.8 (p50 3.76, p90 4.18) — 4.0 keeps the head+middle and drops
    * the worst ~quarter, the CCNet head/middle/tail shape. */
  val MaxAvgSurprisal = 4.0

  /** Per-doc bigram hash frame: one row per adjacent token pair with the
    * three hashes scoring needs — hp = h(w1) (context count probe),
    * hb = h("w1 w2") (bigram probe), h2 = h(w2) (backoff unigram probe).
    * Hash-only output: corpus-scale shuffles downstream never carry text. */
  private[llm] def bigramFrame(docs: DataFrame): DataFrame =
    graft.Tables.spread(docs)
      .select(col("doc_id"), col("lang"), toks(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), col("lang"),
        // native kernel == the transform(sequence(...), struct(hash60 x3))
        // spelling (interpreted lambda per pair), hashing each token once
        explode(graft.expr.BigramHash3Seq(col("t"))).as("p"))
      .select(col("doc_id"), col("lang"), col("p.hp").as("hp"),
        col("p.hb").as("hb"), col("p.h2").as("h2"))

  /** Per-language unigram counts over a reference corpus: (lang, h, c_uni).
    * One explode + one hash-keyed count with map-side partials. */
  def lmUnigramStats(ref: DataFrame): DataFrame =
    graft.Tables.spread(ref)
      .select(col("lang"), explode(toks(col("text"))).as("w"))
      .select(col("lang"), hash60(col("w")).as("h"))
      .groupBy("lang", "h").agg(count(lit(1)).as("c_uni"))

  /** Per-language bigram counts over a reference corpus:
    * (lang, hp, hb, c_pair). hp rides along (functionally determined by hb
    * for real bigrams, 2^-60 collisions aside) so scoring probes one table. */
  def lmBigramStats(ref: DataFrame): DataFrame =
    bigramFrame(ref)
      .groupBy("lang", "hp", "hb").agg(count(lit(1)).as("c_pair"))

  /** Per-language token totals (lang, n_tok) — derived from the unigram
    * table, so a merged/appended model's totals are always consistent with
    * its counts (the BM25 corpus-stats discipline). */
  def lmCorpusStats(uni: DataFrame): DataFrame =
    uni.groupBy("lang").agg(sum("c_uni").as("n_tok"))

  /** Sentinel hash for the capped-out vocabulary tail: [[TextOps.hash60]]
    * yields non-negative 60-bit values, so -1 can never collide with a
    * real token and the scoring probes (keyed on real hashes) never see
    * the tail row — only [[lmCorpusStats]] sums it. */
  val OovTailHash: Long = -1L

  /** Bound the model broadcast by CONFIG instead of by the reference
    * corpus (the SCALE.md audit row's "prune vocab if the reference
    * corpus is unbounded"): keep the top `maxVocab` unigrams per language
    * by count (ties broken by hash — a total order, so the cap is
    * deterministic), FOLD the dropped tail's counts into one
    * [[OovTailHash]] row per language, and drop bigram rows whose context
    * token fell out of vocabulary. The fold is load-bearing:
    * [[lmCorpusStats]] re-derives n_tok from the unigram table, so a
    * tail row (instead of a plain drop) keeps every surviving score's
    * denominator EXACTLY the uncapped reference token count — capping
    * narrows the vocabulary, it never silently shrinks the corpus.
    * Dropped tokens route to the tiers scoring already has: a bigram
    * whose context survived still scores seen-bigram; one whose w2
    * survived backs off to the unigram tier; everything else hits the
    * OOV floor — deterministic, spec-pinned. Both capped tables stay
    * shard-mergeable (counts are still sums; tail rows merge by
    * addition under the same (lang, h) key). */
  def capLmModel(uni: DataFrame, pair: DataFrame, maxVocab: Int)
      : (DataFrame, DataFrame) = {
    require(maxVocab >= 1, s"maxVocab must be >= 1, got $maxVocab")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("c_uni").desc, col("h").asc)
    val ranked = uni.withColumn("__rn", row_number().over(w))
    val kept = ranked.filter(col("__rn") <= maxVocab).drop("__rn")
    val tail = ranked.filter(col("__rn") > maxVocab)
      .groupBy("lang").agg(sum("c_uni").as("c_uni"))
      .select(col("lang"), lit(OovTailHash).as("h"), col("c_uni"))
    val cappedPair = pair.join(
      kept.select(col("lang"), col("h").as("hp")),
      Seq("lang", "hp"), "left_semi")
    (kept.unionByName(tail), cappedPair)
  }

  /** Counts are sums over docs, so doc-disjoint shards compose EXACTLY:
    * merged stats == one-shot stats over the union corpus (spec-pinned).
    * Same additivity law as [[TextAnalysis.mergeBm25TermStats]]. */
  def mergeLmUnigramStats(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("lang", "h")
      .agg(sum("c_uni").as("c_uni"))

  def mergeLmBigramStats(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("lang", "hp", "hb")
      .agg(sum("c_pair").as("c_pair"))

  /** SUBTRACTIVE takedown for the reference-LM count tables — the shard
    * law run backwards: counts are sums over docs, so removing docs
    * subtracts exactly their own counts, and the result is row-identical
    * to retraining on the reference corpus minus the removed docs
    * (spec-pinned) at the cost of ONE pass over the REMOVED docs — never
    * a reference-corpus rescan. Rows reaching zero DROP (a zero-count
    * token was never "seen"; keeping it would move the unseen/backoff
    * boundary), and a SEEN key driven NEGATIVE refuses loudly — counts
    * higher than the model ever held prove the removed frame was not part
    * of the trained corpus, and a silently clamped model matches no
    * corpus at all. A removed key the model never saw at all is IGNORED
    * by default (the left join comes from the stats side — spec-pinned):
    * that is the correct semantics when the removal frame is the victims'
    * full text but the model was trained capped/filtered. `strict = true`
    * adds the containment check for callers who want a wholly-foreign
    * removal to refuse too: any removed key absent from the model throws
    * (one anti-join count over the removal-sized stats — never a
    * reference rescan). Totals stay consistent for free:
    * [[lmCorpusStats]] re-derives n_tok from the subtracted unigrams.
    * The same law covers every plain-count stats mart (DSIR bucket
    * counts, source mixtures); HLL-bearing marts have NO inverse
    * (registers are maxima) and rebuild instead — stated at their
    * SCALE.md rows. */
  def subtractLmStats(uni: DataFrame, pair: DataFrame,
      removedDocs: DataFrame, strict: Boolean = false)
      : (DataFrame, DataFrame) = {
    // a CAPPED model ([[capLmModel]]) cannot subtract: the folded tail
    // row hides which removed tokens it absorbed, so the removed docs'
    // out-of-vocab counts would silently SURVIVE inside the tail and
    // every denominator would keep counting the deleted corpus — the
    // same silent corruption the HLL refusal guards against. Retrain
    // instead ([[retrainLmModelAfterTakedown]] / [[capLmModel]] over the
    // surviving reference).
    if (!uni.filter(col("h") === lit(OovTailHash)).isEmpty)
      throw new UnsupportedOperationException(
        "capped LM model: the folded vocabulary tail hides the removed " +
          "docs' out-of-vocab counts, so subtraction would silently keep " +
          "deleted mass in every score's denominator. Retrain on the " +
          "surviving reference instead (retrainLmModelAfterTakedown, or " +
          "capLmModel over freshly-trained stats).")
    val rmUni = lmUnigramStats(removedDocs)
    val rmPair = lmBigramStats(removedDocs)
    if (strict) {
      val foreign =
        rmUni.join(uni, Seq("lang", "h"), "left_anti").count() +
          rmPair.join(pair, Seq("lang", "hp", "hb"), "left_anti").count()
      require(foreign == 0L,
        s"LM subtract containment violation: $foreign removed n-gram keys " +
          "never appeared in the trained model — the removed docs were " +
          "not (all) part of the trained reference corpus; rebuild " +
          "instead of subtracting")
    }
    def sub(stats: DataFrame, removed: DataFrame, keys: Seq[String],
        cnt: String): DataFrame = {
      val r = removed.withColumnRenamed(cnt, "__rm")
      val diff = when(col(cnt) - coalesce(col("__rm"), lit(0L)) < 0L,
          raise_error(lit("LM subtract underflow: the removed docs were " +
            "not part of the trained reference corpus — rebuild instead " +
            "of subtracting")).cast("long"))
        .otherwise(col(cnt) - coalesce(col("__rm"), lit(0L)))
      stats.join(r, keys, "left")
        .select((keys.map(col) :+ diff.as(cnt)): _*)
        .filter(col(cnt) > 0L)
    }
    (sub(uni, rmUni, Seq("lang", "h"), "c_uni"),
      sub(pair, rmPair, Seq("lang", "hp", "hb"), "c_pair"))
  }

  /** Score documents under a trained model: per doc,
    * avg_surprisal = mean over its bigrams of −ln S(w2|w1) (nats, via the
    * integer-micro quantization described in the object scaladoc).
    *
    * Documents whose `lang` has no reference model are DROPPED (inner join
    * on the per-lang totals): there is nothing meaningful to score them
    * against — CCNet likewise only scores languages it has a model for.
    * Sub-2-token documents have no bigrams and are likewise absent.
    *
    * Join shape: totals + unigrams broadcast (vocabulary-sized); the bigram
    * model joins on (lang, hp, hb) — AQE-broadcast here, a single exploded-
    * corpus shuffle at reference scales beyond the threshold. */
  def lmScoreWith(docs: DataFrame, uni: DataFrame, pair: DataFrame)
      : DataFrame =
    scoredBigrams(docs, uni, pair)
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_bigrams"), sum("s_micro").as("sum_micro"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"),
        (col("sum_micro").cast("double") / col("n_bigrams").cast("double")
          / lit(1000000.0)).as("avg_surprisal"))

  /** The pre-aggregation frame: one row per scored bigram,
    * (doc_id, lang, s_micro). Shared by the batch fold above and the
    * streaming twin (whose per-doc fold runs in flatMapGroupsWithState —
    * the joins here are all stream-static, legal in append mode). */
  private[graft] def scoredBigrams(docs: DataFrame, uni: DataFrame,
      pair: DataFrame): DataFrame = {
    val u1 = uni.select(col("lang"), col("h").as("hp"),
      col("c_uni").as("c1"))
    val u2 = uni.select(col("lang"), col("h").as("h2"),
      col("c_uni").as("c2"))
    val n = lmCorpusStats(uni)
    val micro = (x: Column) =>
      floor(x * lit(1000000) + lit(0.5)).cast("long")
    val sMicro =
      when(col("c_pair").isNotNull,
        micro(log(col("c1").cast("double")) -
          log(col("c_pair").cast("double"))))
      .when(col("c2").isNotNull,
        micro(log(col("n_tok").cast("double")) -
          log(col("c2").cast("double") * lit(Backoff))))
      .otherwise(
        micro(log(col("n_tok").cast("double")) - log(lit(Backoff))))
    bigramFrame(docs)
      .join(pair, Seq("lang", "hp", "hb"), "left")
      .join(broadcast(u1), Seq("lang", "hp"), "left")
      .join(broadcast(u2), Seq("lang", "h2"), "left")
      .join(broadcast(n), Seq("lang"))
      .select(col("doc_id"), col("lang"), sMicro.as("s_micro"))
  }

  /** Persist the per-language reference model under `basePath/lm_model`:
    * the two count tables ARE the model (stupid backoff has no
    * normalization pass); totals re-derive from the unigrams at read so a
    * later merged/appended model can never carry inconsistent totals —
    * which [[capLmModel]]'s tail fold preserves, so `maxVocab` bounds
    * the persisted (and broadcast) model size by config without moving
    * any denominator. */
  def writeLmModel(docs: DataFrame, basePath: String,
      refSource: String = RefSource,
      maxVocab: Option[Int] = None): Unit = {
    val ref = docs.filter(col("source") === refSource)
    val (uni, pair) = maxVocab match {
      case Some(n) => capLmModel(lmUnigramStats(ref), lmBigramStats(ref), n)
      case None => (lmUnigramStats(ref), lmBigramStats(ref))
    }
    uni.write.mode("overwrite").parquet(s"$basePath/lm_model/uni")
    pair.write.mode("overwrite").parquet(s"$basePath/lm_model/pair")
  }

  /** Retrain the PERSISTED reference model after a takedown — the delete
    * tier for trained/capped LM models: [[subtractLmStats]] covers the
    * uncapped count tables exactly, but a capped model's folded tail has
    * no inverse (the subtract guard refuses it), and a takedown whose
    * legal scope covers MODEL PARAMETERS wants the weights themselves
    * re-derived from the surviving reference either way. One pass over
    * the surviving reference slice; equality law (LangModelSpec): the
    * retrained tables == [[writeLmModel]] over docs-minus-victims —
    * training is deterministic count arithmetic. */
  def retrainLmModelAfterTakedown(docs: DataFrame, basePath: String,
      victimDocIds: Seq[Long], refSource: String = RefSource,
      maxVocab: Option[Int] = None): Unit = {
    require(victimDocIds.nonEmpty, "empty takedown set")
    writeLmModel(
      docs.filter(!col("doc_id").isin(victimDocIds.distinct: _*)),
      basePath, refSource, maxVocab)
  }

  /** Train-on-reference + score-everything convenience: the CCNet pass.
    * The reference slice is a pushed-down filter of the same scan. */
  def lmScore(docs: DataFrame, refSource: String = RefSource): DataFrame = {
    val ref = docs.filter(col("source") === refSource)
    lmScoreWith(docs, lmUnigramStats(ref), lmBigramStats(ref))
  }

  /** The perplexity quality filter: keep documents whose mean surprisal
    * under their language's reference model is at most `maxAvg` nats.
    * Unscorable docs (no model for the lang, or <2 tokens) do not pass —
    * at 100 TB those route to their own review bucket, not silently into
    * the kept set. */
  def lmFilter(docs: DataFrame, maxAvg: Double = MaxAvgSurprisal,
      refSource: String = RefSource): DataFrame =
    lmScore(docs, refSource)
      .filter(col("avg_surprisal") <= maxAvg)
      .select("doc_id", "lang", "n_bigrams", "avg_surprisal")

  // ---------------------------------------------------------------------------
  // Registered queries + DuckDB oracles
  // ---------------------------------------------------------------------------

  import graft.{Q, Tables}
  import LlmQueries.{h60, tokCte}

  /** Shared oracle chain: bigram hash frame over all docs (with source so
    * the model CTEs can restrict to the reference slice), reference model
    * counts, and the three-tier backoff score — generated next to the Scala
    * so the two spellings cannot drift. `refExtra` further restricts the
    * REFERENCE slice (q192 trains on the reference minus a takedown set —
    * one generated body, the q100/q190 no-drift discipline). */
  private def scoreCtes: String = scoreCtesWhere("")

  private def scoreCtesWhere(refExtra: String): String = s"""$tokCte,
bi AS (SELECT doc_id, lang, source,
         unnest([{'hp': ${h60("t[i+1]")},
                  'hb': ${h60("t[i+1] || ' ' || t[i+2]")},
                  'h2': ${h60("t[i+2]")}}
                 for i in range(0, len(t) - 1)]) AS p
       FROM tok WHERE len(t) >= 2),
bh AS (SELECT doc_id, lang, source, p.hp AS hp, p.hb AS hb, p.h2 AS h2
       FROM bi),
rtok AS (SELECT lang, unnest(t) AS w FROM tok
         WHERE source = '$RefSource'$refExtra),
uni AS (SELECT lang, ${h60("w")} AS h, CAST(count(*) AS BIGINT) AS c_uni
        FROM rtok GROUP BY 1, 2),
pair AS (SELECT lang, hp, hb, CAST(count(*) AS BIGINT) AS c_pair
         FROM bh WHERE source = '$RefSource'$refExtra GROUP BY 1, 2, 3),
n AS (SELECT lang, CAST(sum(c_uni) AS BIGINT) AS n_tok FROM uni GROUP BY 1),
s AS (SELECT bh.doc_id, bh.lang,
        CASE WHEN c_pair IS NOT NULL THEN
               CAST(floor((ln(CAST(c1 AS DOUBLE)) - ln(CAST(c_pair AS DOUBLE)))
                          * 1000000 + 0.5) AS BIGINT)
             WHEN c2 IS NOT NULL THEN
               CAST(floor((ln(CAST(n_tok AS DOUBLE))
                           - ln(CAST(c2 AS DOUBLE) * $Backoff))
                          * 1000000 + 0.5) AS BIGINT)
             ELSE
               CAST(floor((ln(CAST(n_tok AS DOUBLE)) - ln($Backoff))
                          * 1000000 + 0.5) AS BIGINT) END AS s_micro
      FROM bh
      LEFT JOIN pair ON pair.lang = bh.lang AND pair.hp = bh.hp
                    AND pair.hb = bh.hb
      LEFT JOIN (SELECT lang, h, c_uni AS c1 FROM uni) u1
             ON u1.lang = bh.lang AND u1.h = bh.hp
      LEFT JOIN (SELECT lang, h, c_uni AS c2 FROM uni) u2
             ON u2.lang = bh.lang AND u2.h = bh.h2
      JOIN n ON n.lang = bh.lang),
a AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(s_micro) AS BIGINT) AS sum_micro
      FROM s GROUP BY doc_id, lang),
scored AS (SELECT doc_id, lang, n_bigrams,
             CAST(sum_micro AS DOUBLE) / CAST(n_bigrams AS DOUBLE) / 1000000.0
               AS avg_surprisal
           FROM a)"""

  val queries: Seq[Q] = Seq(
    // The CCNet pass end-to-end: train per-lang reference models on the
    // trusted source, score EVERY document (reference docs included — they
    // calibrate where the in-domain mass sits). Honest direct build: train
    // + score in one plan, no mart.
    Q("q150_lm_perplexity",
      (s, dir) => lmScore(Tables.documents(s, dir)).orderBy("doc_id"),
      Some(s"""WITH $scoreCtes
SELECT doc_id, lang, n_bigrams, avg_surprisal FROM scored
ORDER BY doc_id""")),

    // SUBTRACTIVE takedown of the trained model (the delete tier for
    // plain-count stats marts): remove a doc_id set from the reference
    // slice by subtracting its own counts — one pass over the REMOVED
    // docs, never a reference rescan — and score everything through the
    // subtracted model. Oracle = the same scoring chain RETRAINED on the
    // reference minus the victims (one generated body, so the spellings
    // cannot drift): equality pins subtract == retrain end-to-end,
    // n_tok shifts included.
    Q("q192_lm_subtractive_takedown",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val ref = docs.filter(col("source") === RefSource)
        val removed = ref.filter(pmod(col("doc_id"), lit(11)) === 3)
        val (su, sp) = subtractLmStats(
          lmUnigramStats(ref), lmBigramStats(ref), removed)
        lmScoreWith(docs, su, sp).orderBy("doc_id")
      },
      Some(s"""WITH ${scoreCtesWhere(" AND doc_id % 11 <> 3")}
SELECT doc_id, lang, n_bigrams, avg_surprisal FROM scored
ORDER BY doc_id""")),

    // The filter surface: survivors at the calibrated threshold.
    Q("q151_lm_ppl_filter",
      (s, dir) => lmFilter(Tables.documents(s, dir)).orderBy("doc_id"),
      Some(s"""WITH $scoreCtes
SELECT doc_id, lang, n_bigrams, avg_surprisal FROM scored
WHERE avg_surprisal <= $MaxAvgSurprisal
ORDER BY doc_id""")),

    // Shard-composability gate: model counts are additive over doc-disjoint
    // shards, so shard-trained + merged stats must equal the one-shot build
    // AND score identically — the property that lets a 100 TB reference
    // train incrementally (the BM25 stats-table law, q100 family). The
    // oracle is the literal expected row (q147's gate pattern): the gate's
    // value is the Spark-side multiset comparisons, not the SQL.
    Q("q152_lm_stats_merge",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val ref = docs.filter(col("source") === RefSource)
        val (refA, refB) = (ref.filter(col("doc_id") % 2 === 0),
          ref.filter(col("doc_id") % 2 =!= 0))
        val mergedU = mergeLmUnigramStats(lmUnigramStats(refA),
          lmUnigramStats(refB))
        val mergedP = mergeLmBigramStats(lmBigramStats(refA),
          lmBigramStats(refB))
        val oneU = lmUnigramStats(ref)
        val oneP = lmBigramStats(ref)
        // multiset symmetric difference in ONE ±1-weighted aggregate —
        // value-identical to the exceptAll-both-ways count at half the
        // scans (LlmQueries.symDiffCount doc)
        def diffCount(a: DataFrame, b: DataFrame, as: String): DataFrame =
          LlmQueries.symDiffCount(a, b, as)
        val sMerged = lmScoreWith(docs, mergedU, mergedP)
        val sOne = lmScoreWith(docs, oneU, oneP)
        diffCount(mergedU, oneU, "n_uni_diff")
          .crossJoin(diffCount(mergedP, oneP, "n_pair_diff"))
          .crossJoin(diffCount(sMerged, sOne, "n_score_diff"))
          .crossJoin(oneU.agg(countDistinct(col("lang")).as("n_langs")))
          .select(
            (col("n_uni_diff") === 0).as("uni_identical"),
            (col("n_pair_diff") === 0).as("pair_identical"),
            (col("n_score_diff") === 0).as("scores_identical"),
            (col("n_langs") >= 1).as("model_nonempty"))
      },
      Some("SELECT TRUE AS uni_identical, TRUE AS pair_identical, " +
        "TRUE AS scores_identical, TRUE AS model_nonempty")))
}
