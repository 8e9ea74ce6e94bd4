package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextOps._

/** Text-analysis operators over `documents`: quality stats, token counting,
  * n-gram language ID, and winnowing fingerprints. All narrow projections —
  * zero shuffles; they fuse into whatever scan feeds them, which is exactly
  * what a 100 TB quality-filter pass needs (one read, one write).
  */
object TextAnalysis {

  /** BPE-ish token pattern: runs of <=4 letters, digit runs, or single
    * non-alnum chars — a deterministic stand-in for a real subword
    * tokenizer's piece count. */
  val bpePattern = "[a-z]{1,4}|[0-9]+|[^a-z0-9\\s]"

  /** Quality/statistics block: char & token counts, BPE-ish token count,
    * average token length, distinct-token ratio, stopword ratio, punctuation
    * ratio, and a composite quality score. */
  def textStats(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val nToks = size(t).cast("long")
    val nChars = length(col("text")).cast("long")
    val alphaLen = length(array_join(t, "")).cast("long")
    // native membership count: size(filter(t, isin)) runs its lambda
    // interpreted per token (see graft.expr scaladoc)
    val stopHits = graft.expr.MembershipCount(t, stopwords)
    val punct = (nChars -
      length(regexp_replace(col("text"), "[^a-z0-9\\s]", "")).cast("long"))
    val distinctRatio = size(array_distinct(t)).cast("double") / nToks.cast("double")
    val stopRatio = stopHits.cast("double") / nToks.cast("double")
    // Gopher-style repetition signal: fraction of word 2-grams that are
    // repeats of an earlier 2-gram in the same doc (1 - distinct/total),
    // counted over POSITIONAL 2-GRAM HASHES (native kernel; the oracle
    // hashes identically, so any collision hits both engines the same way).
    val rep2 = rep2gramRatio(t, nToks)
    docs.select(
      col("doc_id"),
      nChars.as("n_chars_txt"),
      nToks.as("n_tokens"),
      regexp_count(col("text"), lit(bpePattern)).cast("long").as("n_bpe_tokens"),
      (alphaLen.cast("double") / nToks.cast("double")).as("avg_token_len"),
      distinctRatio.as("distinct_ratio"),
      stopRatio.as("stopword_ratio"),
      rep2.as("rep_2gram_ratio"),
      (punct.cast("double") / nChars.cast("double")).as("punct_ratio"),
      // Composite score: association order matters for float parity — the
      // DuckDB mirror in LlmSql reproduces it term by term.
      ((distinctRatio * lit(0.5)) + (stopRatio * lit(0.3)) +
        (when(nToks >= 20, lit(1.0)).otherwise(nToks.cast("double") / lit(20.0))
          * lit(0.2))).as("quality_score"))
  }

  private[llm] def rep2gramRatio(t: org.apache.spark.sql.Column,
      nToks: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(nToks >= 2,
      lit(1.0) - size(array_distinct(shingleHashSeq(t, 2))).cast("double") /
        (nToks - 1).cast("double"))
      .otherwise(lit(0.0))

  /** The corpus quality-filter pass: keep documents whose stats clear the
    * thresholds — the operation the stats exist FOR. One narrow
    * filter+project fused with the scan; at 100 TB this is the single-read
    * pass that writes the training shard. */
  def qualityFilter(docs0: DataFrame,
      minTokens: Long = 20, maxRep2: Double = 0.2,
      minDistinct: Double = 0.5): DataFrame = {
    val docs = graft.Tables.spread(docs0)
    val t = toks(col("text"))
    val nToks = size(t).cast("long")
    val distinctRatio = size(array_distinct(t)).cast("double") / nToks.cast("double")
    val stopRatio = graft.expr.MembershipCount(t, stopwords)
      .cast("double") / nToks.cast("double")
    val rep2 = rep2gramRatio(t, nToks)
    val quality = (distinctRatio * lit(0.5)) + (stopRatio * lit(0.3)) +
      (when(nToks >= 20, lit(1.0)).otherwise(nToks.cast("double") / lit(20.0)) * lit(0.2))
    docs.select(col("doc_id"), col("lang"), col("source"),
        nToks.as("n_tokens"), rep2.as("rep_2gram_ratio"),
        distinctRatio.as("distinct_ratio"), quality.as("quality_score"))
      .filter(col("n_tokens") >= minTokens &&
        col("rep_2gram_ratio") <= maxRep2 &&
        col("distinct_ratio") >= minDistinct)
  }

  /** n-gram language ID: score = total matched characters of each language's
    * char-trigram markers (substring counting via literal-replace length
    * delta — `replace`, not regex, for exact DuckDB parity); predicted
    * language = argmax with ties broken by profile order. */
  def langId(docs: DataFrame): DataFrame = {
    def score(profile: Seq[String]): Column =
      profile.map { tri =>
        length(col("text")) - length(replace(col("text"), lit(tri), lit("")))
      }.reduce(_ + _).cast("long")
    val scored = docs.select(
      (col("doc_id") +: langProfiles.map { case (l, p) => score(p).as(s"score_$l") }): _*)
    val names = langProfiles.map(_._1)
    val best = names.map(l => col(s"score_$l"))
      .reduce((a, b) => greatest(a, b))
    // `when` chains evaluate first-to-last, so building the chain in profile
    // order makes earlier languages win score ties (the documented tie-break).
    val predOrdered = names.foldLeft(Option.empty[Column]) { (acc, l) =>
      val cond = col(s"score_$l") === best && best > 0
      Some(acc.fold(when(cond, lit(l)))(c => c.when(cond, lit(l))))
    }.get.otherwise("und")
    scored.select(
      (col("doc_id") +: names.map(l => col(s"score_$l"))) :+
        predOrdered.as("pred_lang"): _*)
  }

  /** tf-idf top terms per document: tf from one explode+count, document
    * frequency from a second aggregation over the (doc, token) pairs, idf =
    * ln(N/df), top `topK` terms per doc by score.
    *
    * Scale shape: two shuffles (token-grouped df, doc-grouped rank window) —
    * both on keys whose cardinality grows with the corpus; the corpus-size
    * scalar N broadcasts. The score is quantized to integer micro-units
    * (floor(x*1e6+0.5)) BEFORE ranking: ln() is correct only to ~1 ulp and
    * the last ulp may differ between libm implementations, so both the
    * emitted value and the rank order live on the quantized integers, which
    * the engines compute identically. */
  def tfidfTopTerms(docs0: DataFrame, topK: Int = 3): DataFrame = {
    val docs = graft.Tables.spread(docs0)
    val tf = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("token"))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = broadcast(docs.agg(count(lit(1)).as("n_docs")))
    val scoreMicro = floor(
      col("tf").cast("double") *
        log(col("n_docs").cast("double") / col("df").cast("double")) *
        lit(1000000) + lit(0.5)).cast("long")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(col("score_micro").desc, col("token").asc)
    tf.join(dfreq, "token")
      .crossJoin(n)
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        scoreMicro.as("score_micro"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topK)
      .select("doc_id", "rk", "token", "tf", "df", "score_micro")
  }

  /** Unigram-LM surprisal score — the perplexity-filter proxy (the CCNet
    * recipe scores docs with a KenLM model; the unigram form is the
    * model-free tier with the same plan shape): per-doc mean of
    * −ln p(token) under the corpus unigram distribution. Low mean surprisal
    * = repetitive/common text, high = rare-token soup; both tails are the
    * filter's prey.
    *
    * Per-token surprisal is quantized to integer micro-units BEFORE the
    * per-doc aggregation (the q56 recipe): all cross-engine float risk is
    * confined to one ln() rounding per DISTINCT frequency value, and the
    * doc-level sum is exact integer arithmetic.
    *
    * Scale shape: one shuffle on token (freq), one back-join (vocab-sized
    * right side — broadcastable at corpus scale), one shuffle on doc_id for
    * the final mean. Same plan family as tf-idf (q56). */
  def unigramSurprisal(docs: DataFrame): DataFrame = {
    val tokens = graft.Tables.spread(docs)
      .select(col("doc_id"), explode(toks(col("text"))).as("token"))
    val freq = tokens.groupBy("token").agg(count(lit(1)).as("cnt"))
    // total token count summed from the vocab-sized freq table — NOT a
    // second pass over the corpus tokens
    val tot = broadcast(freq.agg(sum(col("cnt")).as("n_total")))
    val surprisalMicro = floor(
      (log(col("n_total").cast("double")) - log(col("cnt").cast("double")))
        * lit(1000000) + lit(0.5)).cast("long")
    tokens.join(freq, "token")
      .crossJoin(tot)
      .select(col("doc_id"), surprisalMicro.as("s_micro"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("s_micro")).as("sum_micro"))
      .select(col("doc_id"), col("n_tokens"),
        (col("sum_micro").cast("double") / col("n_tokens").cast("double")
          / lit(1000000.0)).as("avg_surprisal"))
  }

  /** BM25 lexical ranking (Robertson/Okapi) for a fixed query-term set — the
    * lexical leg hybrid retrieval pairs with the embedding leg (q54):
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)),
    * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1).
    *
    * Float discipline (q56 recipe): idf is micro-quantized per TERM (one
    * ln rounding per distinct df); the tf-normalization is division-only
    * IEEE arithmetic with every constant spelled identically in both
    * engines; each (doc, term) contribution is floored to integer micro
    * units BEFORE the per-doc sum, which is exact long addition — so rank
    * order never rides a libm last-ulp.
    *
    * Scale shape: `arrays_overlap` prunes non-matching docs BEFORE the
    * explode (narrow); the surviving (doc, term) explode filters to the
    * |terms|-bounded query set, so the tf table carries only matching
    * postings; df and the (N, Σdl) scalar broadcast. One extra corpus pass
    * computes doc lengths — partial-agged to two longs. Top-k is
    * TakeOrderedAndProject, never a global sort. */
  def bm25Rank(docs0: DataFrame, terms: Seq[String], topK: Int = 20): DataFrame = {
    // query-bounded df for the one-shot path: prune to matching docs, keep
    // only query terms BEFORE the distinct-explode — identical df values to
    // bm25TermStats (docs containing term), without the full-vocabulary
    // shuffle that belongs to the maintained-index build
    val docs = graft.Tables.spread(docs0)
    val termArr = array(terms.map(lit): _*)
    val queryDf = docs
      .select(toks(col("text")).as("t"))
      .filter(arrays_overlap(col("t"), termArr))
      .select(explode(array_intersect(col("t"), termArr)).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
    bm25RankWith(docs, queryDf, bm25CorpusStats(docs), terms, topK)
  }

  /** The per-term half of the BM25 index: document frequency over the full
    * vocabulary. df is a count of doc-disjoint contributions, so the table
    * is maintainable under the q69 contract: for a doc-disjoint delta,
    * merge = union + groupBy + sum — no corpus rescan (spec-pinned:
    * merge(parts) == rebuild(whole), exactly). */
  def bm25TermStats(docs: DataFrame): DataFrame =
    graft.Tables.spread(docs)
      .select(explode(array_distinct(toks(col("text")))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))

  /** The scalar half of the index: (n_docs, Σdl) — algebraic, so the same
    * union+sum merge maintains it. */
  def bm25CorpusStats(docs: DataFrame): DataFrame =
    docs.select(size(toks(col("text"))).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))

  /** Merge a doc-disjoint delta's statistics into the standing index —
    * touches only the stats tables (vocabulary-sized + one row), never the
    * corpus. */
  def mergeBm25TermStats(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("term").agg(sum("df").as("df"))

  def mergeBm25CorpusStats(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl"))

  /** The full inverted-postings table (doc_id, term, tf, dl) — what a
    * serving layer caches so per-query scoring touches the query terms'
    * postings rows, never the corpus text. Same maintenance story as the
    * stats tables: doc-disjoint deltas union in (postings rows are per-doc,
    * no merge needed). */
  def bm25Postings(docs: DataFrame): DataFrame =
    graft.Tables.spread(docs)
      .select(col("doc_id"), toks(col("text")).as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("dl"),
        explode(col("t")).as("term"))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))

  /** [[bm25Postings]] with the term's token POSITIONS kept (sorted int
    * array) — the positional index layout (what Lucene calls positions):
    * BM25 consumers ignore the column (parquet prunes it from their
    * scans), phrase queries ([[graft.llm.Selection.phraseSearchIndex]])
    * run the q122 shifted-intersection arithmetic over it without
    * re-tokenizing the corpus. Size cost is one int per token occurrence —
    * the index grows to O(corpus tokens), the standard positional-index
    * trade, paid once at build and only by readers that ask for the
    * column. */
  def bm25PositionalPostings(docs: DataFrame): DataFrame =
    graft.Tables.spread(docs)
      .select(col("doc_id"), toks(col("text")).as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("dl"),
        posexplode(col("t")).as(Seq("pos", "term")))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))

  /** Score from the postings table instead of raw text: filter postings to
    * the query terms (partition-prunable on a term-keyed layout), join the
    * broadcast stats, rank. Identical output to [[bm25Rank]]
    * (spec-pinned). */
  def bm25RankFromPostings(postings: DataFrame, termStats: DataFrame,
      corpusStats: DataFrame, terms: Seq[String], topK: Int = 20): DataFrame =
    bm25Score(postings.filter(col("term").isin(terms: _*)), termStats,
      corpusStats, topK)

  /** [[bm25TermStats]] when the postings table already exists — counting
    * postings rows per term IS df (postings are per (doc, term)). */
  def bm25TermStatsFromPostings(postings: DataFrame): DataFrame =
    postings.groupBy("term").agg(count(lit(1)).as("df"))

  /** [[bm25CorpusStats]] from postings: every doc owns >= 1 postings row
    * (toks of empty text yields [""]), so distinct (doc_id, dl) recovers
    * the corpus exactly. */
  def bm25CorpusStatsFromPostings(postings: DataFrame): DataFrame =
    postings.select("doc_id", "dl").distinct()
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))

  /** THE scoring arithmetic, in exactly one place (the generated oracles
    * pin every constant and operation order — two copies could drift):
    * input is a (doc_id, dl, term, tf) frame already restricted to the
    * query terms. */
  private def bm25Score(tf: DataFrame, termStats: DataFrame,
      corpusStats: DataFrame, topK: Int): DataFrame = {
    val idfMicro = floor(log(
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5))
        / (col("df").cast("double") + lit(0.5)) + lit(1.0))
      * lit(1000000) + lit(0.5)).cast("long")
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val tfNorm = (col("tf").cast("double") * lit(2.2)) /
      (col("tf").cast("double") +
        lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl)))
    tf.join(broadcast(termStats), "term")
      .crossJoin(broadcast(corpusStats))
      .select(col("doc_id"),
        floor(idfMicro.cast("double") * tfNorm + lit(0.5)).cast("long")
          .as("cm"))
      .groupBy("doc_id")
      .agg(sum("cm").as("score_micro"), count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** Positional phrase matching: per-doc count of EXACT n-term phrase
    * occurrences (adjacent, in order) — the retrieval feature tf-over-bags
    * cannot express ("sort merge" as a unit, not two independent terms).
    * Arithmetic: for phrase term k, take its token positions shifted left
    * by k; an exact occurrence at position p puts p into EVERY shifted
    * set, so the occurrence positions are the intersection of all n sets
    * and n_occ is its size — one narrow projection per doc, no explode,
    * no join, no shuffle before the final sort.
    *
    * Scale shape: an `array_contains` conjunction prunes non-candidate
    * docs before any position work (codegen'd short-circuit on the
    * tokenized array); survivors pay |phrase| passes over their own
    * tokens. Corpus-scale cost is the scan itself; per-doc work is
    * O(dl · |phrase|), data-parallel. The positional-postings variant
    * (precomputed position lists in the index) is the layout upgrade if
    * phrase queries become hot — the arithmetic is identical, positions
    * just come from the index instead of re-tokenizing. */
  def phraseOccurrences(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val t = toks(col("text"))
    val hasAll = phrase.map(w => array_contains(t, w)).reduce(_ && _)
    val shifted = phrase.zipWithIndex.map { case (w, k) =>
      filter(
        transform(t, (x, i) => when(x === lit(w), i - lit(k))),
        v => v.isNotNull)
    }
    graft.Tables.spread(docs)
      .filter(hasAll)
      .select(col("doc_id"),
        size(shifted.reduce(array_intersect)).cast("long").as("n_occ"))
      .filter(col("n_occ") > 0)
      .orderBy(col("n_occ").desc, col("doc_id").asc)
  }

  /** Ordered-proximity chain count over per-term position arrays
    * (UNSHIFTED token positions): the number of term-0 positions that
    * anchor a chain p0 < p1 < … < p_{n-1} with every adjacent gap in
    * [1, 1+slop] — Lucene's ordered sloppy phrase, counted by distinct
    * anchor (counting every chain combinatorially explodes on repetitive
    * text and ranks noise above signal). Computed right-to-left:
    * S_{n-1} = P_{n-1}; S_k = filter(P_k, p ∃ q ∈ S_{k+1}: q−p ∈ [1,
    * 1+slop]); count = |S_0|. slop=0 degenerates to the exact-phrase
    * count (gaps of exactly 1 ⇔ adjacency), which is how the proximity
    * oracle cross-checks [[phraseOccurrences]]. Pure array HOFs — one
    * projection, no explode/join/shuffle; per-doc cost O(Σ|P_k|²)
    * bounded by the doc's own occurrence counts. */
  private[llm] def proximityChainCount(posCols: Seq[org.apache.spark.sql.Column],
      slop: Int): org.apache.spark.sql.Column =
    size(posCols.init.foldRight(posCols.last) { (pk, sNext) =>
      filter(pk, p => exists(sNext,
        q => (q - p) >= 1 && (q - p) <= lit(1 + slop)))
    }).cast("long")

  /** Ordered proximity search over the corpus text — [[phraseOccurrences]]
    * with per-gap slack: per-doc count of anchors admitting an in-order
    * chain with every adjacent gap ≤ 1+slop tokens. Same scan shape as
    * the exact tier: `array_contains` conjunction prunes non-candidates,
    * survivors pay |phrase| position passes + the chain HOF. */
  def proximityOccurrences(docs: DataFrame, phrase: Seq[String],
      slop: Int): DataFrame = {
    require(phrase.size >= 2, "proximity needs at least two terms")
    require(slop >= 0, "slop must be >= 0")
    val t = toks(col("text"))
    val hasAll = phrase.map(w => array_contains(t, w)).reduce(_ && _)
    val posCols = phrase.map { w =>
      filter(transform(t, (x, i) => when(x === lit(w), i)), v => v.isNotNull)
    }
    graft.Tables.spread(docs)
      .filter(hasAll)
      .select(col("doc_id"),
        proximityChainCount(posCols, slop).as("n_occ"))
      .filter(col("n_occ") > 0)
      .orderBy(col("n_occ").desc, col("doc_id").asc)
  }

  /** [[bm25Rank]] against EXTERNAL statistics — the serving shape when the
    * index is maintained incrementally: scoring scans only the docs being
    * ranked; df/avgdl come from the stats tables. */
  def bm25RankWith(docs: DataFrame, termStats: DataFrame,
      corpusStats: DataFrame, terms: Seq[String], topK: Int = 20): DataFrame = {
    val termArr = array(terms.map(lit): _*)
    val tf = docs.select(col("doc_id"), toks(col("text")).as("t"))
      .select(col("doc_id"), col("t"), size(col("t")).cast("long").as("dl"))
      .filter(arrays_overlap(col("t"), termArr))
      .select(col("doc_id"), col("dl"), explode(col("t")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    bm25Score(tf, termStats, corpusStats, topK)
  }

  /** Bigram-conditional surprisal — the next tier above q73's unigram proxy
    * toward the KenLM-style perplexity filter: per-doc mean of
    * −ln p(w_i | w_{i-1}) with p estimated from corpus bigram counts over
    * their prefix marginal (c_prev = Σ_cur c(prev, cur), so each
    * conditional sums to exactly 1 — no smoothing constant to mirror).
    * Repetitive text (looping bigrams) scores near 0; rare-transition soup
    * scores high — the same two tails q73 hunts, but sensitive to ORDER,
    * which a unigram model cannot see.
    *
    * Same float discipline and plan family as q73: one bigram-keyed count
    * shuffle, a bigram-vocab back-join (broadcastable at corpus scale), a
    * prefix marginal over the vocab table (never the corpus), per-instance
    * micro-quantized ln, exact integer per-doc sums. */
  def bigramSurprisal(docs: DataFrame): DataFrame = {
    // Shuffle keys are 60-bit HASHES of (prev, bigram), never the strings:
    // corpus-scale bigram text shuffling is exactly what parked the string
    // spelling in the giant-allocation heap band at sf1. A 2^-60 collision
    // merges two bigrams' counts — deterministic, mirrored bit-for-bit by
    // the oracle's identical md5 arithmetic.
    //
    // Deliberate trade-off vs q96's shared-exchange recipe: `bi` feeds both
    // the count aggregate and the probe join, so the tokenize+hash explode
    // runs twice — here the aggregate collapses to the bigram VOCAB, which
    // broadcasts at corpus scale, making the probe join map-side; forcing
    // one exchange (repartition on hb) would put a corpus-sized shuffle on
    // the probe path instead. Recompute-narrow-twice beats
    // shuffle-the-corpus-once for this shape.
    val bi = graft.Tables.spread(docs)
      .select(col("doc_id"), toks(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        // native kernel (graft.expr.BigramHash3Seq) == the interpreted
        // transform/struct spelling; h2 rides along unused (token hashes
        // are computed once either way)
        explode(graft.expr.BigramHash3Seq(col("t"))).as("p"))
      .select(col("doc_id"), col("p.hp").as("hp"), col("p.hb").as("hb"))
    val pairCnt = bi.groupBy("hp", "hb").agg(count(lit(1)).as("c_pair"))
    val prevCnt = pairCnt.groupBy("hp").agg(sum("c_pair").as("c_prev"))
    val sMicro = floor(
      (log(col("c_prev").cast("double")) - log(col("c_pair").cast("double")))
        * lit(1000000) + lit(0.5)).cast("long")
    bi.join(pairCnt, Seq("hp", "hb"))
      .join(prevCnt, Seq("hp"))
      .select(col("doc_id"), sMicro.as("s_micro"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("s_micro").as("sum_micro"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("sum_micro").cast("double") / col("n_bigrams").cast("double")
          / lit(1000000.0)).as("avg_surprisal"))
  }

  /** The BPE pair-count kernel: corpus-wide frequencies of adjacent
    * character pairs within words — the counting step a byte-pair-encoding
    * tokenizer trainer iterates (count pairs → merge the winner → recount).
    * One round is registered (q103); the trainer loop re-runs the kernel
    * over re-segmented words, each round the same linear explode + one
    * pair-keyed count with map-side partials. Top-k via
    * TakeOrderedAndProject. */
  def bpePairCounts(docs: DataFrame, topK: Int = 20): DataFrame =
    // count over DISTINCT words x multiplicity: pair counts are additive
    // over equal words (sum(wcnt x pairs-in-word) == count over every
    // occurrence, exact integers), so the explode+count runs on the
    // vocabulary, not the corpus — the shuffle carries distinct-word
    // partials either way, but the per-row pair work collapses by the
    // corpus's word-repetition factor (guide §2.3 aggregate early)
    graft.Tables.spread(docs)
      .select(explode(toks(col("text"))).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("wcnt"))
      .select(explode(expr(
        "transform(sequence(0, length(word) - 2), i -> substring(word, i + 1, 2))"))
        .as("pair"), col("wcnt"))
      .groupBy("pair").agg(sum("wcnt").as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(topK)

  /** The iterated BPE trainer q103's kernel promises: `rounds` rounds of
    * count pairs → merge the corpus-wide winner → re-segment → recount.
    * Output: one row per round, (round, pair, cnt) — the merge table a
    * tokenizer ships.
    *
    * Representation: each word is a SYMBOL-SEQUENCE STRING with every
    * symbol wrapped in U+001F unit separators ("ab" segmented [a, b] is
    * "␟a␟␟b␟"). Applying a merge (a, b) is then literal
    * `replace(seq, "␟a␟␟b␟", "␟ab␟")` — and literal replace is
    * left-to-right NON-OVERLAPPING in both engines, which is exactly the
    * classic BPE merge rule ("aaa" under (a,a) → [aa, a]). No array fold,
    * no UDF, and the oracle mirrors it with the same replace arithmetic in
    * unrolled CTEs (fixed rounds → straight-line SQL). U+001F is stripped
    * from input words first, so the wrapper can never collide with data.
    *
    * Scale shape per round: one narrow re-segmentation map (the nested
    * replaces compose into a single pass over the words — no
    * materialization between rounds), one pair-keyed count with map-side
    * partials, and a 1-row winner broadcast into the next round via
    * crossJoin (the aggregate-scalar pattern) — no driver state, no
    * collect; `rounds` is a compile-time constant, so the driver loop only
    * builds the plan. Winners are lazily localCheckpointed (1 row) so the
    * two consumers (output union, next round's merge) share one count job. */
  def bpeTrainRounds(docs: DataFrame, rounds: Int = 3): DataFrame = {
    val US = "\u001f"
    def wrap(c: Column): Column = concat(lit(US), c, lit(US))
    // Spread the pruned text column BEFORE the explode (Tables.spread): the
    // per-char wrap, the round-r replace chain, and the pair explode all run
    // upstream of the first exchange, and an under-split input serializes
    // them — measured here at 11.3 CPU-s doing ~1.4 effective cores of work
    // (wall 8.1 s → 2.0 s with the spread in).
    // The trainer counts over DISTINCT words x multiplicity: a pair count
    // is additive over equal words (sum(wcnt x pairs-in-word) equals the
    // per-occurrence count exactly, in integers), so every round's explode
    // + count runs on the VOCABULARY, not the corpus. The distinct table
    // is eagerly localCheckpointed (vocabulary-sized) so the per-round
    // winner jobs replay the replace chain from it instead of
    // re-tokenizing the corpus each round (JFR: the regex split + lower
    // of toks dominated the post-kernel profile). The wrap itself is the
    // native byte-pass kernel (graft.expr.BpeKernels): the old
    // concat_ws/transform/filter/split HOF chain evaluated interpreted
    // per (word x char) and disabled whole-stage codegen.
    val words = graft.Tables.spread(docs.select(col("text")))
      .select(explode(toks(col("text"))).as("w0"))
      .select(regexp_replace(col("w0"), US, "").as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("wcnt"))
      .select(graft.expr.BpeWrap(col("word")).as("seq"), col("wcnt"))
      .localCheckpoint()
    var seqs = words
    var out: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      // native adjacent-pair kernel == the syms split + pair transform;
      // sub-2-symbol seqs yield the empty array, which explode drops
      // (the old filter(size >= 2) guard)
      val counts = seqs
        .select(explode(graft.expr.BpeAdjacentPairs(col("seq"))).as("pair"),
          col("wcnt"))
        .groupBy("pair").agg(sum("wcnt").as("cnt"))
      val winner = counts
        .orderBy(col("cnt").desc, col("pair").asc).limit(1)
        .select(lit(r.toLong).as("round"), col("pair"), col("cnt"))
        .localCheckpoint(false)
      out = Some(out.fold(winner)(_.unionByName(winner)))
      if (r < rounds) {
        val ab = winner.select(split(col("pair"), " ").as("ab"))
          .select(element_at(col("ab"), 1).as("a"),
            element_at(col("ab"), 2).as("b"))
        // Left join on TRUE (see bpeEncode): an exhausted round (empty
        // winner) is a no-op, not a row-destroying cross with zero rows.
        seqs = seqs.join(broadcast(ab), lit(true), "left")
          .select(when(col("a").isNull, col("seq"))
            .otherwise(replace(col("seq"),
              concat(wrap(col("a")), wrap(col("b"))),
              wrap(concat(col("a"), col("b"))))).as("seq"), col("wcnt"))
      }
    }
    out.get.orderBy("round")
  }

  /** The batched BPE trainer round — the shape a 30k-merge production vocab
    * needs. [[bpeTrainRounds]] runs one Spark job per LEARNED MERGE; a real
    * tokenizer has tens of thousands of merges, so the cost axis must be
    * jobs-per-BATCH: each round counts pairs once and applies the top-`batch`
    * NON-CONFLICTING merges together, cutting the round count ~batch-fold.
    *
    * Conflict rule (prefix-conflict-free): a rank-i candidate is kept iff NO
    * higher-ranked candidate j < i shares an endpoint symbol with it
    * (j.a or j.b ∈ {i.a, i.b}) — j's own kept status does not matter, which
    * keeps the rule non-recursive and therefore expressible as one bounded
    * anti-join in both engines (slightly more conservative than the greedy
    * chain; deterministic either way). Disjoint endpoint symbols mean the
    * U+001F-wrapped replace patterns cannot overlap, so applying a round's
    * kept merges in rank order equals applying them in any order — batching
    * is sound, not just fast.
    *
    * Output: (round, rk, pair, cnt) — rk is the candidate rank within the
    * round (gaps where a conflicting candidate was dropped), so the shipped
    * merge table preserves both round structure and within-round priority.
    *
    * Scale shape per round: the same narrow re-segmentation + pair count as
    * the unbatched trainer, ONE ≤batch-row ranked candidate table
    * (localCheckpointed — three consumers), a batch²-bounded conflict
    * anti-join on that tiny table, and `batch` chained 1-row broadcast
    * left joins applying the kept merges. Driver holds no data; `rounds`
    * and `batch` are compile-time constants, so the loop only builds the
    * plan. */
  def bpeTrainBatched(docs: DataFrame, rounds: Int = 3,
      batch: Int = 3): DataFrame = {
    val US = "\u001f"
    def wrap(c: Column): Column = concat(lit(US), c, lit(US))
    val wRank = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("pair").asc)
    // distinct-word x multiplicity counting + eager vocabulary checkpoint
    // (see bpeTrainRounds): exact same integers, vocabulary-sized rounds
    var seqs = graft.Tables.spread(docs.select(col("text")))
      .select(explode(toks(col("text"))).as("w0"))
      .select(regexp_replace(col("w0"), US, "").as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("wcnt"))
      .select(graft.expr.BpeWrap(col("word")).as("seq"), col("wcnt"))
      .localCheckpoint()
    var out: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      // ranked top-`batch` candidates; the rank window runs on ≤batch rows
      // (post-limit), so the un-partitioned window is a non-issue
      val ranked = seqs
        .select(explode(graft.expr.BpeAdjacentPairs(col("seq"))).as("pair"),
          col("wcnt"))
        .groupBy("pair").agg(sum("wcnt").as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc).limit(batch)
        .withColumn("rk", row_number().over(wRank).cast("long"))
        .withColumn("ab", split(col("pair"), " "))
        .select(col("rk"), col("pair"), col("cnt"),
          element_at(col("ab"), 1).as("a"), element_at(col("ab"), 2).as("b"))
        .localCheckpoint(false)
      val prior = ranked.select(col("rk").as("jrk"),
        col("a").as("ja"), col("b").as("jb"))
      val kept = ranked.join(prior,
          col("jrk") < col("rk") &&
            (col("ja") === col("a") || col("ja") === col("b") ||
             col("jb") === col("a") || col("jb") === col("b")),
          "left_anti")
        .localCheckpoint(false)
      out = Some(out.fold(
        kept.select(lit(r.toLong).as("round"), col("rk"), col("pair"),
          col("cnt")))(
        _.unionByName(kept.select(lit(r.toLong).as("round"), col("rk"),
          col("pair"), col("cnt")))))
      if (r < rounds) {
        // apply the round's kept merges in rank order: `batch` chained
        // 1-row broadcast left joins; a dropped/absent rank is a no-op
        var s = seqs
        for (i <- 1 to batch) {
          val mi = kept.filter(col("rk") === i).select(col("a"), col("b"))
          s = s.join(broadcast(mi), lit(true), "left")
            .select(when(col("a").isNull, col("seq"))
              .otherwise(replace(col("seq"),
                concat(wrap(col("a")), wrap(col("b"))),
                wrap(concat(col("a"), col("b"))))).as("seq"), col("wcnt"))
        }
        seqs = s
      }
    }
    out.get.orderBy("round", "rk")
  }

  /** The consumer side of [[bpeTrainRounds]]: train the same `rounds` merge
    * table, then APPLY every learned merge to each document and report the
    * per-doc segmentation stats a packing pipeline budgets with —
    * (doc_id, n_words, n_chars_seg, n_tokens): eligible words, their total
    * character count (= token count before any merge), and the token count
    * after all merges. n_tokens is what a packer (q51) needs per doc to cut
    * fixed-length sequences; n_chars_seg − n_tokens is exactly the number
    * of merge applications, so compression is auditable per doc.
    *
    * Same representation and merge rule as the trainer (U+001F-wrapped
    * symbol strings, literal replace = classic non-overlapping BPE), with
    * doc identity and the per-word char count carried through the replace
    * chain — columns ride along; the merges never look at them. Unlike the
    * trainer, the winner of the LAST round is applied too (the trainer
    * only counts it): an encoder consumes the full merge table.
    *
    * Scale shape: the trainer's per-round cost (narrow re-segmentation,
    * pair-keyed count, 1-row winner broadcast) plus ONE final doc-keyed
    * aggregation. At production scale the merge table is trained once and
    * shipped; encode is then a single narrow pass + one keyed agg — this
    * query keeps train+encode in one plan so the oracle can replay both. */
  def bpeEncode(docs: DataFrame, rounds: Int = 3): DataFrame = {
    bpeSegment(docs, rounds)
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"), col("nch"),
        // == size(syms(seq)) of the old split spelling, as a native pass
        graft.expr.BpeSymbolCount(col("seq")).as("ntok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("nch").as("n_chars_seg"),
        sum("ntok").as("n_tokens"))
  }

  /** The shared train+segment chain of [[bpeEncode]]/[[bpeVocab]]: trains
    * `rounds` merges inline and returns the per-word segmentation frame
    * (doc_id, word, nch, seq) — `word` is carried through the replace
    * chain untouched (columns ride along; the merges never look at it) so
    * a consumer can audit the decode law against the original. */
  def bpeSegment(docs: DataFrame, rounds: Int = 3): DataFrame = {
    val US = "\u001f"
    def wrap(c: Column): Column = concat(lit(US), c, lit(US))
    // Train on the SAME corpus as bpeTrainRounds — no doc_id filter here;
    // null-doc rows count toward the winners and are dropped only in the
    // consumers' final aggregation, so the learned merge table is exactly
    // the one the trainer ships.
    val wordsAll = graft.Tables.spread(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), explode(toks(col("text"))).as("w0"))
      .select(col("doc_id"), regexp_replace(col("w0"), US, "").as("word"))
      .filter(length(col("word")) >= 2)
    // the TRAINER side counts over distinct words x multiplicity (exact
    // same integers as per-occurrence counting; see bpeTrainRounds) from
    // one eager vocabulary-sized checkpoint, so the per-round winner jobs
    // never re-tokenize the corpus; the doc-carrying segmentation chain
    // below stays per-occurrence and is evaluated ONCE by the consumer's
    // final action (no count ever touches it mid-loop anymore)
    var wseqs = wordsAll
      .groupBy("word").agg(count(lit(1)).as("wcnt"))
      .select(graft.expr.BpeWrap(col("word")).as("seq"), col("wcnt"))
      .localCheckpoint()
    var seqs = wordsAll
      .select(col("doc_id"), col("word"),
        length(col("word")).cast("long").as("nch"),
        graft.expr.BpeWrap(col("word")).as("seq"))
    for (r <- 1 to rounds) {
      val winner = wseqs
        .select(explode(graft.expr.BpeAdjacentPairs(col("seq"))).as("pair"),
          col("wcnt"))
        .groupBy("pair").agg(sum("wcnt").as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc).limit(1)
        .localCheckpoint(false)
      val ab = winner.select(split(col("pair"), " ").as("ab"))
        .select(element_at(col("ab"), 1).as("a"),
          element_at(col("ab"), 2).as("b"))
      // Left join on TRUE, not crossJoin: if a round's pair table is empty
      // (every eligible word already one symbol) the winner is an empty
      // frame, and a cross product would annihilate every row — the round
      // must instead be a no-op on the current segmentation.
      seqs = seqs.join(broadcast(ab), lit(true), "left")
        .select(col("doc_id"), col("word"), col("nch"),
          when(col("a").isNull, col("seq"))
            .otherwise(replace(col("seq"),
              concat(wrap(col("a")), wrap(col("b"))),
              wrap(concat(col("a"), col("b"))))).as("seq"))
      if (r < rounds)
        wseqs = wseqs.join(broadcast(ab), lit(true), "left")
          .select(when(col("a").isNull, col("seq"))
            .otherwise(replace(col("seq"),
              concat(wrap(col("a")), wrap(col("b"))),
              wrap(concat(col("a"), col("b"))))).as("seq"), col("wcnt"))
    }
    seqs
  }

  /** The vocabulary face of the inline-trained encoder: explode every
    * word's post-merge symbols and report, per TOKEN, how many documents
    * and occurrences carry it — the tokenizer sanity table (which merges
    * actually fire, what the tail looks like) a vocabulary review reads.
    * Output is vocabulary-sized (alphabet + at most `rounds` merged
    * symbols), never corpus-sized; the oracle replays the identical merge
    * chain and unnests the same symbols. */
  def bpeVocab(docs: DataFrame, rounds: Int = 3): DataFrame = {
    bpeSegment(docs, rounds)
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"),
        explode(graft.expr.BpeSymbols(col("seq"))).as("token"))
      .groupBy("token")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .orderBy("token")
  }

  /** Decode — the encoder's inverse, made explicit: a BPE merge moves
    * token BOUNDARIES and never bytes, so stripping the U+001F separators
    * from a segmentation reproduces the original word exactly. Returns
    * (doc_id, word, decoded); the spec gate pins decoded == word for every
    * [[bpeSegment]] row — the lossless-round-trip law a tokenizer ships
    * under (and the reason U+001F is scrubbed from input words first). */
  def bpeDecode(segmented: DataFrame): DataFrame = {
    val US = "\u001f"
    segmented.select(col("doc_id"), col("word"),
      regexp_replace(col("seq"), US, "").as("decoded"))
  }

  /** Encode from a PERSISTED merge table — the production split
    * [[bpeEncode]] documents but does not ship: train once
    * ([[bpeTrainRounds]]/[[bpeTrainBatched]]), write the merge table,
    * encode many corpora from the written table with NO training pass in
    * the encode plan. The IVFADC index models the same train-once/
    * serve-many seam for ANN; this is the tokenizer's.
    *
    * `merges` is the trainer's shipped schema — (round, rk, pair), the
    * batched trainer's output ([[bpeTrainRounds]]' unbatched table lifts
    * with rk = 1). Merges apply in global (round, rk) order: BPE merge
    * tables are ordered by construction (later merges assume earlier ones'
    * symbols exist), and since each is the same U+001F-wrapped literal
    * replace as training, applying the written list in order reproduces
    * the inline-trained segmentation BIT-FOR-BIT (spec-pinned against
    * [[bpeEncode]] on the same corpus).
    *
    * `maxMerges` bounds the replace chain — a compile-time plan size like
    * `rounds`/`batch` everywhere else in this family; ranks past the
    * table's end (or dropped by the batched trainer's conflict rule) are
    * no-ops via the same empty-frame left-join-on-TRUE guard. The global
    * rank window runs un-partitioned on the MERGE TABLE — vocabulary-
    * sized (30k rows at production), never corpus-sized. Scale shape:
    * one narrow per-word pass (the chained replaces fuse into a single
    * projection), `maxMerges` 1-row broadcasts, one doc-keyed agg — and
    * NO pair-count shuffles, which is the whole point: the trainer's
    * per-round corpus passes are paid at training time, not per encode. */
  def bpeEncodeWith(docs: DataFrame, merges: DataFrame,
      maxMerges: Int): DataFrame = {
    bpeSegmentWith(docs, merges, maxMerges)
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"), col("nch"),
        graft.expr.BpeSymbolCount(col("seq")).as("ntok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("nch").as("n_chars_seg"),
        sum("ntok").as("n_tokens"))
  }

  /** The segmentation chain shared by [[bpeEncodeWith]] and
    * [[bpeVocabWith]]: apply a persisted merge table in global (round, rk)
    * order to the per-word character sequences — (doc_id, nch, seq), no
    * training pass in the plan. */
  private def bpeSegmentWith(docs: DataFrame, merges: DataFrame,
      maxMerges: Int): DataFrame = {
    val US = "\u001f"
    def wrap(c: Column): Column = concat(lit(US), c, lit(US))
    val ranked = merges
      .withColumn("grk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("round").asc, col("rk").asc)))
      .withColumn("ab", split(col("pair"), " "))
      .select(col("grk"), element_at(col("ab"), 1).as("a"),
        element_at(col("ab"), 2).as("b"))
      .localCheckpoint(false)
    var seqs = graft.Tables.spread(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), explode(toks(col("text"))).as("w0"))
      .select(col("doc_id"), regexp_replace(col("w0"), US, "").as("word"))
      .filter(length(col("word")) >= 2)
      .select(col("doc_id"), length(col("word")).cast("long").as("nch"),
        graft.expr.BpeWrap(col("word")).as("seq"))
    for (i <- 1 to maxMerges) {
      val mi = ranked.filter(col("grk") === i).select(col("a"), col("b"))
      seqs = seqs.join(broadcast(mi), lit(true), "left")
        .select(col("doc_id"), col("nch"),
          when(col("a").isNull, col("seq"))
            .otherwise(replace(col("seq"),
              concat(wrap(col("a")), wrap(col("b"))),
              wrap(concat(col("a"), col("b"))))).as("seq"))
    }
    seqs
  }

  /** The vocabulary face FROM a persisted merge table — [[bpeVocab]]'s
    * train-once tier (the [[bpeEncodeWith]] seam applied to the vocabulary
    * face): replay the written merges in global order, then the same token
    * unnest + doc/occurrence counts. Applying the persisted UNBATCHED
    * `rounds`-row table with `maxMerges = rounds` reproduces the
    * inline-trained [[bpeVocab]] BIT-FOR-BIT — q177 shares q176's oracle
    * and the spec pins the equality — so the inline train is the audit
    * tier and the per-corpus cost here is one no-shuffle encode pass. */
  def bpeVocabWith(docs: DataFrame, merges: DataFrame,
      maxMerges: Int): DataFrame = {
    bpeSegmentWith(docs, merges, maxMerges)
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"),
        explode(graft.expr.BpeSymbols(col("seq"))).as("token"))
      .groupBy("token")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .orderBy("token")
  }

  /** Per-doc character-distribution Shannon entropy — the quality signal
    * that separates natural text (≈ 4 bits/char neighborhoods) from both
    * base64/hex soup (high) and repeated-char padding (low), orthogonal to
    * the token-level stats (q26) and surprisal (q73).
    *
    * H = ln(n) − (Σ_c n_c·ln(n_c))/n, with each n_c·ln(n_c) term quantized
    * to integer micro-units (the q56 recipe) so the per-doc sum is exact
    * integer arithmetic and cross-engine float risk is confined to one ln()
    * rounding per distinct (char, count). One explode + two keyed
    * aggregations, both collapsing map-side; nothing scales past the
    * char-count linear pass. */
  def charEntropy(docs: DataFrame): DataFrame = {
    val counts = graft.Tables.spread(docs)
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy("doc_id", "ch")
      .agg(count(lit(1)).as("nc"))
    val termMicro = floor(col("nc").cast("double") *
      log(col("nc").cast("double")) * lit(1000000) + lit(0.5)).cast("long")
    val agg = counts.groupBy("doc_id")
      .agg(sum(termMicro).as("s_micro"), sum("nc").as("n"),
        count(lit(1)).as("n_distinct"))
      .select(col("doc_id"), col("n"), col("n_distinct"),
        ((floor(log(col("n").cast("double")) * lit(1000000) + lit(0.5))
          - col("s_micro").cast("double") / col("n").cast("double"))
          / lit(1000000.0)).as("entropy"))
    // empty-text docs must still REPORT (n=0, H=0 by convention): a quality
    // detector that silently omits the lowest-quality rows hands a
    // downstream inner join an excuse to skip them entirely.
    docs.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("entropy"), lit(0.0)).as("entropy"))
  }

  /** Winnowing document fingerprint: positional word 3-gram hashes, sliding
    * window of 4, keep each window's min hash, distinct + sort. The classic
    * local fingerprinting scheme (Schleimer et al., SIGMOD'03) as pure array
    * expressions. */
  def fingerprints(docs: DataFrame, k: Int = 3, window: Int = 4): DataFrame =
    // hs materialized in its own projection: the window pass references it
    // O(n) times, and an inlined expression would re-run the md5 chain per
    // window (measured 50x slowdown before this split). The sliding-window
    // minima run in the native kernel (graft.expr.WindowMins).
    docs.select(col("doc_id"), shingleHashSeq(toks(col("text")), k).as("hs"))
      .select(col("doc_id"),
        array_sort(array_distinct(graft.expr.WindowMins(col("hs"), window)))
          .as("fingerprint"))
      .select(col("doc_id"), size(col("fingerprint")).cast("long").as("n_fp"),
        col("fingerprint"))
}
