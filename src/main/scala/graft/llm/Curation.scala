package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import TextOps._

/** Corpus-curation operators a training-data pipeline runs between dedup
  * and packing: per-stratum quota sampling, repetition (Gopher-style)
  * filtering, incremental snapshot dedup, length-mixture reporting, and
  * target-mixture reweighting.
  *
  * 100 TB shapes:
  *   - quota sample: one shuffle on the stratum key; the per-stratum
  *     window never materializes more than a partition (rank-and-drop,
  *     no sort of the corpus). Skewed strata route through the q72
  *     two-phase salted pattern unchanged.
  *   - repetition rules: per-doc gram explode + two keyed aggregations —
  *     shuffle O(distinct grams per doc), embarrassingly parallel, no
  *     cross-doc state at all.
  *   - snapshot delta: hash anti-join of arrivals against the standing
  *     corpus's content hashes — shuffle O(|new| + |corpus hashes|), the
  *     hashes being 8 bytes/doc regardless of document size.
  *   - mixture reports/weights: aggregate to stratum cardinality (tiny),
  *     then windows over the aggregate — nothing scales with rows.
  */
object Curation {

  /** The generalized quota kernel: deterministic cap-K per stratum,
    * hash-salted order with doc_id tie-break — retry-stable and
    * cluster-size-independent. One shuffle on the stratum key; the window
    * rank-and-drops without sorting the corpus. q77's strata are
    * (lang, source); the URL-curation chain keys the same kernel on host
    * ([[UrlCuration.curatedCorpus]]) — one spelling, no drift. */
  def quotaCap(docs: org.apache.spark.sql.DataFrame, k: Int,
      keys: Seq[org.apache.spark.sql.Column], salt: String)
      : org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(keys: _*)
      .orderBy(hash60(concat(col("doc_id").cast("string"), lit(salt))),
        col("doc_id"))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Deterministic cap-K per (lang, source) stratum — the q77 contract,
    * shared by the standalone query and the q86 pipeline stage so the
    * quota semantics cannot drift between them. */
  def quotaSample(docs: org.apache.spark.sql.DataFrame, k: Int)
      : org.apache.spark.sql.DataFrame =
    quotaCap(docs, k, Seq(col("lang"), col("source")), "|quota")
      .select("doc_id", "lang", "source")

  /** RE2-safe PII patterns (run verbatim in the DuckDB mirrors). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** PII identify-and-mask over a `text` column: per-row counts plus the
    * masked text. A pure narrow map (zero shuffles), which is why the
    * STREAMING twin (StreamOps.piiScrubStream) is this same function applied
    * to a readStream frame — batch/streaming parity by construction. The
    * q84 gate injects synthetic identifiers so the oracle checks both the
    * positive and negative paths. */
  def piiScrub(docs: org.apache.spark.sql.DataFrame,
      textCol: String = "text"): org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"),
      regexp_count(col(textCol), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col(textCol), lit(PhoneRe)).cast("long").as("n_phones"),
      regexp_replace(regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>").as("clean_text"))

  /** Per-source approximate (median, MAD) through the KLL sketch — the
    * 100 TB tier of q89's robust stats: exact `percentile` buffers every
    * distinct value of a group, while the sketch partial-aggregates map-side
    * and ships O(k·log n) doubles per source. Two grouped sketch passes
    * (values, then absolute deviations about the sketched median), each
    * one keyed shuffle of sketch states. */
  def robustStatsApprox(docs: org.apache.spark.sql.DataFrame,
      k: Int = 512): org.apache.spark.sql.DataFrame = {
    val d = docs.select(col("source"), col("n_chars").cast("double").as("x"))
    val med = d.groupBy("source")
      .agg(element_at(
        graft.expr.QuantileSketch(col("x"), Seq(0.5), k), 1).as("med"))
    d.join(broadcast(med), Seq("source"))
      .withColumn("adev", abs(col("x") - col("med")))
      .groupBy("source", "med")
      .agg(element_at(
        graft.expr.QuantileSketch(col("adev"), Seq(0.5), k), 1).as("mad"))
      .select("source", "med", "mad")
  }

  /** q89's per-doc robust outlier screen with [[robustStatsApprox]] medians
    * — identical flag rule (mad=0 abstention included), approximate center/
    * spread. CurationSpec pins agreement with the exact tier within the
    * sketch's rank bound. */
  def robustOutliersApprox(docs: org.apache.spark.sql.DataFrame,
      k: Int = 512): org.apache.spark.sql.DataFrame = {
    val stats = broadcast(robustStatsApprox(docs, k))
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .join(stats, Seq("source"))
      .withColumn("adev", abs(col("n_chars").cast("double") - col("med")))
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("med"), col("mad"),
        (col("mad") > 0.0 && col("adev") > lit(3.0) * col("mad"))
          .as("is_outlier"))
  }

  /** Cross-source distinct word-3-gram overlap/containment matrix (q85).
    *
    * `maxDfSources` is the scale lever from SCALE.md: a gram present in all
    * S sources emits S²/2 join pairs, so at corpus scale the ubiquitous-gram
    * head (stopword runs) is dropped BEFORE the self-join by a document-
    * frequency ceiling. The capped tier is a documented approximation:
    * per-source totals stay exact (the denominator never changes), shared
    * counts become lower bounds that omit only grams common to > cap
    * sources — exactly the grams that carry no syndication signal. None =
    * exact, which is what q85's oracle checks. */
  def sourceOverlap(docs: org.apache.spark.sql.DataFrame,
      maxDfSources: Option[Int] = None): org.apache.spark.sql.DataFrame = {
    val grams0 = docs.select(col("source"),
        explode(shingleHashSeq(toks(col("text")), 3)).as("gh"))
      .distinct()
    val grams = maxDfSources.fold(grams0) { cap =>
      val w = Window.partitionBy("gh")
      grams0.withColumn("__df", count(lit(1)).over(w))
        .filter(col("__df") <= cap).drop("__df")
    }
    val totals = grams0.groupBy("source").agg(count(lit(1)).as("n_grams"))
    val a = grams.as("a")
    val b = grams.hint("shuffle_hash").as("b")
    a.join(b, col("a.gh") === col("b.gh") &&
        col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("shared_grams"))
      .join(broadcast(totals.select(col("source").as("src_a"),
        col("n_grams").as("grams_a"))), Seq("src_a"))
      .join(broadcast(totals.select(col("source").as("src_b"),
        col("n_grams").as("grams_b"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("shared_grams"),
        col("grams_a"), col("grams_b"),
        (col("shared_grams").cast("double") /
          least(col("grams_a"), col("grams_b")).cast("double"))
          .as("containment"))
      .orderBy("src_a", "src_b")
  }

  val queries: Seq[Q] = Seq(

    // Per-(lang, source) quota: keep at most K docs per stratum, chosen by
    // deterministic hash order (retry-stable, cluster-size-independent —
    // the q49/q52 sampling contract applied to capped selection). The cap
    // is what holds a runaway crawl domain to a bounded share of the
    // training mix.
    Q("q77_quota_sample",
      (s, dir) => quotaSample(Tables.documents(s, dir), 20).orderBy("doc_id"),
      Some("""
WITH r AS (SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY lang, source
               ORDER BY (('0x' || substr(md5(doc_id::VARCHAR || '|quota'), 1, 15))::BIGINT),
                        doc_id) AS rn
           FROM documents)
SELECT doc_id, lang, source FROM r WHERE rn <= 20 ORDER BY doc_id""")),

    // Gopher-style repetition screen: per-doc duplicate-2-gram fraction and
    // top-gram share over positional gram hashes (collisions hit both
    // engines identically, so counts match the string-gram truth). Flags
    // boilerplate/looping text that survives exact and near dedup because
    // the repetition is WITHIN the document.
    Q("q78_repetition_rules",
      (s, dir) => {
        val grams = Tables.documents(s, dir)
          .select(col("doc_id"),
            explode(shingleHashSeq(toks(col("text")), 2)).as("gh"))
        val counts = grams.groupBy("doc_id", "gh").agg(count(lit(1)).as("c"))
        val m = counts.groupBy("doc_id").agg(
          sum("c").as("n_grams"),
          count(lit(1)).as("n_distinct"),
          max("c").as("top_count"))
        val dupFrac = lit(1.0) -
          col("n_distinct").cast("double") / col("n_grams").cast("double")
        val topShare =
          col("top_count").cast("double") / col("n_grams").cast("double")
        m.select(col("doc_id"), col("n_grams"), col("n_distinct"),
          col("top_count"), dupFrac.as("dup_frac"), topShare.as("top_share"),
          (dupFrac > 0.5 || topShare > 0.2).cast("int").as("is_repetitive"))
          .orderBy("doc_id")
      },
      Some(s"""
WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
             FROM documents),
g AS (SELECT doc_id,
        unnest([(('0x' || substr(md5(array_to_string(t[i+1:i+2], ' ')), 1, 15))::BIGINT % $P)
                for i in range(0, len(t)-1)]) AS gh
      FROM tok),
c AS (SELECT doc_id, gh, count(*) AS c FROM g GROUP BY doc_id, gh),
m AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
        CAST(count(*) AS BIGINT) AS n_distinct,
        CAST(max(c) AS BIGINT) AS top_count
      FROM c GROUP BY doc_id)
SELECT doc_id, n_grams, n_distinct, top_count,
  1.0 - n_distinct::DOUBLE / n_grams::DOUBLE AS dup_frac,
  top_count::DOUBLE / n_grams::DOUBLE AS top_share,
  CAST((1.0 - n_distinct::DOUBLE / n_grams::DOUBLE) > 0.5
       OR (top_count::DOUBLE / n_grams::DOUBLE) > 0.2 AS INT) AS is_repetitive
FROM m ORDER BY doc_id""")),

    // Incremental snapshot dedup: the new crawl = genuinely new docs
    // (doc_id % 3 = 0 stands in for the delta) PLUS re-crawls of standing
    // content (every 5th standing doc re-arriving under a fresh crawl id —
    // the URL-moved/re-fetched case). Keep only content absent from the
    // standing corpus — the daily-update form of q20's exact dedup, an
    // 8-byte-per-doc hash anti-join instead of a corpus rescan. The
    // re-crawls MUST drop and the new docs MUST survive, so the gate
    // checks both directions of the join.
    Q("q79_snapshot_delta",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .withColumn("h", hash60(normText(col("text"))))
        val standing = d.filter(pmod(col("doc_id"), lit(3)) =!= 0)
        // recrawl ids offset by 1e12, outside any reachable doc_id band
        // (ScaleGen strides at 1e7) — a colliding id would make the final
        // ORDER BY doc_id a non-total order and the comparator row order
        // engine-dependent.
        val recrawls = standing
          .filter(pmod(col("doc_id"), lit(5)) === 0)
          .withColumn("doc_id", col("doc_id") + lit(1000000000000L))
        val arrivals = d.filter(pmod(col("doc_id"), lit(3)) === 0)
          .unionByName(recrawls)
        arrivals
          .join(standing.select("h").distinct(), Seq("h"), "left_anti")
          .select("doc_id", "lang", "source")
          .orderBy("doc_id")
      },
      Some("""
WITH d AS (SELECT doc_id, lang, source,
             ('0x' || substr(md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), 1, 15))::BIGINT AS h
           FROM documents),
standing AS (SELECT * FROM d WHERE doc_id % 3 <> 0),
arrivals AS (SELECT doc_id, lang, source, h FROM d WHERE doc_id % 3 = 0
             UNION ALL
             SELECT doc_id + 1000000000000, lang, source, h FROM standing
             WHERE doc_id % 5 = 0)
SELECT doc_id, lang, source FROM arrivals a
WHERE NOT EXISTS (SELECT 1 FROM standing s WHERE s.h = a.h)
ORDER BY doc_id""")),

    // Length-mixture report: docs and chars per (lang, power-of-two length
    // bucket) with each bucket's share of its language — the histogram a
    // curriculum/packing planner reads. The bucket is the count of binary
    // digits (integer-exact in both engines; log2+floor would ride on
    // libm).
    Q("q80_length_histogram",
      (s, dir) => {
        val b = Tables.documents(s, dir)
          .filter(col("n_chars") >= 1)
          .withColumn("bucket", length(bin(col("n_chars"))).cast("long"))
        val w = Window.partitionBy("lang")
        b.groupBy("lang", "bucket")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
          .withColumn("lang_share",
            col("total_chars").cast("double") /
              sum("total_chars").over(w).cast("double"))
          .orderBy("lang", "bucket")
      },
      Some("""
WITH b AS (SELECT lang, CAST(length(format('{:b}', n_chars)) AS BIGINT) AS bucket,
             n_chars
           FROM documents WHERE n_chars >= 1),
a AS (SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM b GROUP BY lang, bucket)
SELECT lang, bucket, n_docs, total_chars,
  total_chars::DOUBLE
    / CAST(sum(total_chars) OVER (PARTITION BY lang) AS BIGINT)::DOUBLE AS lang_share
FROM a ORDER BY lang, bucket""")),

    // Target-mixture reweighting: per-language sampling weight that moves
    // the corpus to a uniform language mix (weight = target share / actual
    // share) — the number fed to q52's weightedMixture to materialize the
    // rebalanced corpus. Aggregate-then-window: nothing scales with rows.
    Q("q81_mixture_weights",
      (s, dir) => {
        val perLang = Tables.documents(s, dir)
          .groupBy("lang").agg(count(lit(1)).as("n_docs"))
        val wAll = Window.partitionBy()
        perLang
          .withColumn("total", sum("n_docs").over(wAll))
          .withColumn("n_langs", count(lit(1)).over(wAll))
          .select(col("lang"), col("n_docs"),
            (col("n_docs").cast("double") / col("total").cast("double"))
              .as("actual_share"),
            ((lit(1.0) / col("n_langs").cast("double")) /
              (col("n_docs").cast("double") / col("total").cast("double")))
              .as("weight"))
          .orderBy("lang")
      },
      Some("""
WITH perlang AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
                 FROM documents GROUP BY lang),
m AS (SELECT lang, n_docs,
        CAST(sum(n_docs) OVER () AS BIGINT) AS total,
        CAST(count(*) OVER () AS BIGINT) AS n_langs
      FROM perlang)
SELECT lang, n_docs,
  n_docs::DOUBLE / total::DOUBLE AS actual_share,
  (1.0 / n_langs::DOUBLE) / (n_docs::DOUBLE / total::DOUBLE) AS weight
FROM m ORDER BY lang""")),

    // Robust per-source length outliers: median/MAD z-score (the screen
    // that survives the heavy-tailed length distributions real crawls have,
    // where mean/stddev — q76's parametric form — is dragged by the very
    // outliers it hunts). Two grouped exact medians + two broadcast
    // join-backs; the aggregates are source-cardinality-sized, so nothing
    // scales beyond the two linear passes.
    Q("q89_robust_outliers",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val med = d.groupBy("source")
          .agg(percentile(col("n_chars"), lit(0.5)).as("med"))
        val withMed = d.join(broadcast(med), Seq("source"))
          .withColumn("adev", abs(col("n_chars").cast("double") - col("med")))
        val mad = withMed.groupBy("source")
          .agg(percentile(col("adev"), lit(0.5)).as("mad"))
        // mad = 0 guard: a source where >= half the docs share one length
        // would otherwise turn `adev > 3*mad` into a strict length-equality
        // filter (every deviation flags); with no spread to calibrate
        // against, the robust screen abstains rather than degenerates.
        withMed.join(broadcast(mad), Seq("source"))
          .select(col("doc_id"), col("source"), col("n_chars"),
            col("med"), col("mad"),
            (col("mad") > 0.0 && col("adev") > lit(3.0) * col("mad"))
              .as("is_outlier"))
          .orderBy("doc_id")
      },
      Some("""
WITH med AS (SELECT source, quantile_cont(n_chars, 0.5) AS med
             FROM documents GROUP BY source),
wm AS (SELECT d.doc_id, d.source, d.n_chars, m.med,
         abs(d.n_chars::DOUBLE - m.med) AS adev
       FROM documents d JOIN med m ON d.source = m.source),
mad AS (SELECT source, quantile_cont(adev, 0.5) AS mad FROM wm GROUP BY source)
SELECT wm.doc_id, wm.source, wm.n_chars, wm.med, mad.mad,
  (mad.mad > 0.0 AND wm.adev > 3.0 * mad.mad) AS is_outlier
FROM wm JOIN mad ON wm.source = mad.source
ORDER BY wm.doc_id""")),

    // The q89/q93 exact/approx pairing (the q44/q87 recipe): same robust
    // screen, median/MAD from the KLL sketch instead of exact percentile.
    // Self-auditing gate: the query recomputes each sketched estimate's
    // TRUE rank over the source's values (resp. absolute deviations) and
    // emits only the rank-window BOOLEANS against the 5% bound — the oracle
    // is the all-true constant, so a bound violation (or sketch
    // nondeterminism) reds the gate without the oracle needing to replay
    // compaction arithmetic.
    Q("q93_robust_outliers_approx",
      (s, dir) => {
        val eps = 0.05
        val d = Tables.documents(s, dir)
          .select(col("source"), col("n_chars").cast("double").as("x"))
        val stats = broadcast(robustStatsApprox(Tables.documents(s, dir)))
        d.join(stats, Seq("source"))
          .withColumn("adev", abs(col("x") - col("med")))
          .groupBy("source", "med", "mad")
          .agg(count(lit(1)).as("n"),
            sum(when(col("x") < col("med"), 1L).otherwise(0L)).as("lt_med"),
            sum(when(col("x") <= col("med"), 1L).otherwise(0L)).as("le_med"),
            sum(when(col("adev") < col("mad"), 1L).otherwise(0L)).as("lt_mad"),
            sum(when(col("adev") <= col("mad"), 1L).otherwise(0L)).as("le_mad"))
          .select(col("source"),
            ((col("lt_med").cast("double") / col("n").cast("double")
              - lit(eps) <= lit(0.5)) &&
              (lit(0.5) <= col("le_med").cast("double") / col("n").cast("double")
                + lit(eps))).as("med_within_bound"),
            ((col("lt_mad").cast("double") / col("n").cast("double")
              - lit(eps) <= lit(0.5)) &&
              (lit(0.5) <= col("le_mad").cast("double") / col("n").cast("double")
                + lit(eps))).as("mad_within_bound"))
          .orderBy("source")
      },
      Some("""
SELECT DISTINCT source, TRUE AS med_within_bound, TRUE AS mad_within_bound
FROM documents ORDER BY source""")),

    // CCNet-style shared-segment (boilerplate) strip: segment each doc into
    // consecutive 8-token chunks, count each segment's distinct-doc
    // frequency within its source, drop segments appearing in >= 2 docs
    // (nav chrome / legal footers / mirrored intros — the repeated matter
    // that survives doc-level dedup because the REST of the doc differs),
    // and reassemble the survivors in order. Scale shape: one segment
    // explode (linear), one (source, segment) agg, one join back — no
    // cross-doc comparisons; exact duplicates lose every segment, which is
    // correct (q20 owns whole-doc dedup).
    Q("q83_boilerplate_strip",
      (s, dir) => {
        val segLen = 8
        val segs = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), toks(col("text")).as("t"))
          // greatest(…, 1): size(t) >= 1 always holds (split of empty text
          // yields [""]), but if n_segs could ever reach 0, sequence(0, -1)
          // would fabricate the descending [0, -1] — make the >= 1
          // invariant explicit instead of implicit (the gramPrep rule).
          .withColumn("n_segs",
            greatest(expr(s"(size(t) + ${segLen - 1}) div $segLen"), lit(1)))
          .select(col("doc_id"), col("source"),
            posexplode(transform(sequence(lit(0), col("n_segs") - 1),
              i => array_join(slice(col("t"), i * segLen + 1, lit(segLen)), " ")))
              .as(Seq("seg_idx", "seg")))
        val freq = segs.groupBy("source", "seg")
          .agg(countDistinct("doc_id").as("seg_docs"))
        segs.join(freq, Seq("source", "seg"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_segs"),
            sum(when(col("seg_docs") < 2, 1L).otherwise(0L)).as("n_kept"),
            array_join(transform(array_sort(collect_list(
              when(col("seg_docs") < 2, struct(col("seg_idx"), col("seg"))))),
              x => x.getField("seg")), " ").as("clean_text"))
          .orderBy("doc_id")
      },
      Some("""
WITH tok AS (SELECT doc_id, source,
               regexp_split_to_array(trim(lower(text)), '\s+') AS t
             FROM documents),
sl AS (SELECT doc_id, source,
         [{'seg_idx': i, 'seg': array_to_string(t[i*8+1 : i*8+8], ' ')}
          for i in range(0, (len(t) + 7) // 8)] AS seglist
       FROM tok),
segs AS (SELECT doc_id, source, CAST(s.seg_idx AS INTEGER) AS seg_idx,
           s.seg AS seg
         FROM (SELECT doc_id, source, unnest(seglist) AS s FROM sl)),
freq AS (SELECT source, seg, count(DISTINCT doc_id) AS seg_docs
         FROM segs GROUP BY source, seg),
f AS (SELECT s.doc_id, s.seg_idx, s.seg, q.seg_docs
      FROM segs s JOIN freq q ON s.source = q.source AND s.seg = q.seg)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs,
  CAST(sum(CASE WHEN seg_docs < 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  coalesce(string_agg(CASE WHEN seg_docs < 2 THEN seg END, ' '
                      ORDER BY seg_idx), '') AS clean_text
FROM f GROUP BY doc_id ORDER BY doc_id""")),

    // PII masking: every 5th doc gets a deterministic synthetic email +
    // phone appended (the corpus itself is clean — the injection is what
    // gives the oracle both positive and negative rows), then both are
    // regex-masked and counted. Patterns are RE2-safe so the DuckDB mirror
    // executes them verbatim. A pure narrow map — nothing shuffles at any
    // scale.
    Q("q84_pii_scrub",
      (s, dir) => {
        val withPii = Tables.documents(s, dir)
          .withColumn("txt",
            when(pmod(col("doc_id"), lit(5)) === 0,
              concat(col("text"), lit(" contact user"),
                col("doc_id").cast("string"), lit("@mail.example.com or call 555-"),
                lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
                lit(" now")))
              .otherwise(col("text")))
        piiScrub(withPii, "txt").orderBy("doc_id")
      },
      Some("""
WITH p AS (SELECT doc_id,
             CASE WHEN doc_id % 5 = 0
                  THEN text || ' contact user' || doc_id::VARCHAR ||
                       '@mail.example.com or call 555-' ||
                       lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' now'
                  ELSE text END AS txt
           FROM documents)
SELECT doc_id,
  CAST(len(regexp_extract_all(txt,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(txt, '\b\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
  regexp_replace(regexp_replace(txt,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS clean_text
FROM p ORDER BY doc_id""")),

    // Cross-source contamination matrix: distinct word-3-gram overlap and
    // containment for every source pair — the audit that finds mirrored /
    // syndicated content BETWEEN crawl domains before it skews mixture
    // weights. Scale shape: distinct (source, gram) is one agg; the
    // self-join's blowup is bounded by gram posting lists, and the output
    // by sources² (tiny) — never doc-pair-quadratic.
    Q("q85_source_overlap",
      (s, dir) => sourceOverlap(Tables.documents(s, dir)),
      Some(s"""
WITH tok AS (SELECT doc_id, source,
               regexp_split_to_array(trim(lower(text)), '\\s+') AS t
             FROM documents),
g0 AS (SELECT source,
         unnest([(('0x' || substr(md5(array_to_string(t[i+1:i+3], ' ')), 1, 15))::BIGINT
                  % ${P}) for i in range(0, len(t) - 2)]) AS gh
       FROM tok),
g AS (SELECT DISTINCT source, gh FROM g0),
totals AS (SELECT source, CAST(count(*) AS BIGINT) AS n_grams
           FROM g GROUP BY source),
pairs AS (SELECT a.source AS src_a, b.source AS src_b,
            CAST(count(*) AS BIGINT) AS shared_grams
          FROM g a JOIN g b ON a.gh = b.gh AND a.source < b.source
          GROUP BY a.source, b.source)
SELECT src_a, src_b, shared_grams,
  ta.n_grams AS grams_a, tb.n_grams AS grams_b,
  shared_grams::DOUBLE / least(ta.n_grams, tb.n_grams)::DOUBLE AS containment
FROM pairs
JOIN totals ta ON ta.source = pairs.src_a
JOIN totals tb ON tb.source = pairs.src_b
ORDER BY src_a, src_b""")))
}
