package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextOps._

/** Benchmark decontamination: flag training documents that share word
  * n-grams with an evaluation/benchmark set, so eval data can be excluded
  * from the training shard (the standard n-gram-overlap decontamination
  * pass LLM corpora run before training).
  *
  * Plan shape at 100 TB: the benchmark side is SMALL (eval sets are
  * megabytes) — its distinct gram hashes broadcast; the corpus side is one
  * narrow shingle+explode pass, a broadcast semi-join (no shuffle of the
  * corpus), and one aggregation keyed on doc_id — co-partitioned with any
  * doc-keyed layout. Nothing scales with corpus × benchmark.
  */
object Decontam {

  // Distinct k-gram hashes per doc in ONE native pass (positional hashes
  // kernel + array_distinct) — no interpreted string-array lambdas, and
  // the distinct-hash set equals the hash of the distinct-gram set.
  private def gramHashes(df: DataFrame, k: Int): DataFrame =
    df.select(col("doc_id"),
      explode(array_distinct(graft.expr.ShingleHashSeq(toks(col("text")), k)))
        .as("gh"))

  /** doc_id -> distinct overlapping-gram count, for docs with >=1 hit. */
  private def hitCounts(train: DataFrame, benchmark: DataFrame, k: Int): DataFrame = {
    val benchGrams = broadcast(gramHashes(benchmark, k).select("gh").distinct())
    gramHashes(train, k)
      .join(benchGrams, Seq("gh"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Per-doc contamination report: `n_hits` = distinct `k`-gram overlaps
    * with the benchmark set, `contaminated` = any overlap. Every `train`
    * doc appears (zero-hit docs included). */
  def contaminationReport(train: DataFrame, benchmark: DataFrame,
      k: Int = 3): DataFrame =
    train.select("doc_id")
      .join(hitCounts(train, benchmark, k), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))

  /** The filter form: drop contaminated docs from the training shard —
    * anti-join straight against the hit keys (no report round-trip). */
  def decontaminate(train: DataFrame, benchmark: DataFrame,
      k: Int = 3): DataFrame =
    train.join(hitCounts(train, benchmark, k).select("doc_id"),
      Seq("doc_id"), "left_anti")

  /** [[contaminationReport]] for a benchmark side TOO BIG TO BROADCAST: the
    * corpus grams are prefiltered map-side through a distributed Bloom
    * sketch of the benchmark grams (Spark's own BloomFilterAggregate /
    * BloomFilterMightContain pair, SQL-registered by GraftExtensions), and
    * only the surviving sliver shuffles into the exact semi-join. The sketch
    * admits false positives — the exact join removes them, so the OUTPUT is
    * identical to [[contaminationReport]] (no false negatives by
    * construction) — but never ships the corpus: the pattern Spark's
    * InjectRuntimeFilter applies to joins, spelled explicitly.
    *
    * The probe's filter argument must be a scalar subquery (its type check
    * rejects a plain column), so the prefilter step is SQL over session temp
    * views; everything else stays on the DataFrame API. */
  def bloomContaminationReport(train: DataFrame, benchmark: DataFrame,
      k: Int = 3, estItems: Long = 1L << 20): DataFrame = {
    val spark = train.sparkSession
    val bg = gramHashes(benchmark, k).select("gh").distinct()
    // Per-call view names: fixed names would let two concurrent calls on
    // one session clobber each other's inputs. spark.sql() resolves the
    // views at analysis time, so they can be dropped right after.
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val trainView = s"graft_bloom_train_grams_$tag"
    val benchView = s"graft_bloom_bench_grams_$tag"
    val candidates =
      try {
        gramHashes(train, k).createOrReplaceTempView(trainView)
        bg.createOrReplaceTempView(benchView)
        spark.sql(s"""
          SELECT doc_id, gh FROM $trainView
          WHERE graft_might_contain(
            (SELECT graft_bloom_agg(xxhash64(gh), ${estItems}L)
             FROM $benchView),
            xxhash64(gh))""")
      } finally {
        spark.catalog.dropTempView(trainView)
        spark.catalog.dropTempView(benchView)
      }
    val hits = candidates.join(bg, Seq("gh"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    train.select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** [[contaminationReport]] with the benchmark side prefiltered through a
    * COUNT-MIN SKETCH of the corpus grams — the frequency sketch's applied
    * consumer (the q58 Bloom precedent, pointed the other way): probe
    * every benchmark gram against the corpus sketch BEFORE the join, and
    * drop the ones the sketch scores 0. CMS never undercounts (its
    * one-sided guarantee), so a zero estimate PROVES the gram is absent
    * from the corpus and cannot contaminate — no false negatives; the
    * overcounted survivors are removed by the exact semi-join exactly like
    * Bloom's false positives. OUTPUT is therefore identical to
    * [[contaminationReport]] (q178 shares q50's oracle).
    *
    * Scale shape: at 100 TB the corpus sketch is a PERSISTED/streamed
    * artifact (q173's shard-additive merge law + the streaming
    * maintenance twin), a few hundred KB regardless of corpus size, so
    * the probe is a broadcast-sized scalar pass over the benchmark —
    * megabytes — and only benchmark grams that actually occur in the
    * corpus reach the broadcast semi-join. This query keeps the sketch
    * build inline so the oracle replays the whole chain; `sketchOf` is
    * the seam a persisted sketch drops into. */
  /** One shard's Count-Min partial of the corpus grams — a single (sk)
    * row. The streaming maintenance unit ([[graft.streaming.StreamOps]]
    * lands one per micro-batch) and the batch shard unit alike: CMS
    * counters are integer SUMS, so [[gramSketchFromShards]]' fold is
    * BYTE-IDENTICAL to the one-shot sketch of the union — the strongest
    * merge law in the sketch family (stronger than HLL's register max),
    * spec-pinned in StreamBatchEquivalenceSpec. */
  def gramSketchShard(train: DataFrame, k: Int = 3): DataFrame =
    gramHashes(train, k).agg(graft.expr.Cms.sketch(col("gh")).as("sk"))

  /** Counter-additive fold of [[gramSketchShard]] rows → the 1-row sketch
    * frame [[cmsContaminationReport]]'s `sketchOf` seam consumes. */
  def gramSketchFromShards(shards: DataFrame): DataFrame =
    shards.agg(graft.expr.Cms.merge(col("sk")).as("sk"))

  def cmsContaminationReport(train: DataFrame, benchmark: DataFrame,
      k: Int = 3, sketchOf: Option[DataFrame] = None): DataFrame = {
    import graft.expr.Cms
    val trainGrams = gramHashes(train, k)
    // one corpus pass folds every train gram into a fixed counter table
    // (TypedImperativeAggregate: map-side partials, counter-additive merge)
    val sketch = sketchOf.getOrElse(
      trainGrams.agg(Cms.sketch(col("gh")).as("sk")))
    val bg = gramHashes(benchmark, k).select("gh").distinct()
    // the prefilter: crossJoin with the 1-row sketch (the aggregate-scalar
    // pattern), keep only grams the corpus sketch CAN contain
    val live = bg.crossJoin(broadcast(sketch))
      .filter(Cms.estimateOf(col("sk"), col("gh")) > 0L)
      .select("gh")
    val hits = trainGrams
      .join(broadcast(live), Seq("gh"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    train.select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }
}
