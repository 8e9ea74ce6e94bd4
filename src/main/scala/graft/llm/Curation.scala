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

  val queries: Seq[Q] = Seq(

    // Per-(lang, source) quota: keep at most K docs per stratum, chosen by
    // deterministic hash order (retry-stable, cluster-size-independent —
    // the q49/q52 sampling contract applied to capped selection). The cap
    // is what holds a runaway crawl domain to a bounded share of the
    // training mix.
    Q("q77_quota_sample",
      (s, dir) => {
        val k = 20
        val docs = Tables.documents(s, dir)
        val w = Window.partitionBy("lang", "source")
          .orderBy(hash60(concat(col("doc_id").cast("string"), lit("|quota"))),
            col("doc_id"))
        docs.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k)
          .select("doc_id", "lang", "source")
          .orderBy("doc_id")
      },
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
        val recrawls = standing
          .filter(pmod(col("doc_id"), lit(5)) === 0)
          .withColumn("doc_id", col("doc_id") + lit(1000000L))
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
             SELECT doc_id + 1000000, lang, source, h FROM standing
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
FROM m ORDER BY lang""")))
}
