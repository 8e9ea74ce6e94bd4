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

  /** Per-doc contamination report: `n_hits` = distinct `k`-gram overlaps
    * with the benchmark set, `contaminated` = any overlap. Every `train`
    * doc appears (zero-hit docs included). */
  def contaminationReport(train: DataFrame, benchmark: DataFrame,
      k: Int = 3): DataFrame = {
    // Distinct k-gram hashes per doc in ONE native pass (positional hashes
    // kernel + array_distinct) — no interpreted string-array lambdas, and
    // the distinct-hash set equals the hash of the distinct-gram set.
    def gramHashes(df: DataFrame) = df.select(col("doc_id"),
      explode(array_distinct(graft.expr.ShingleHashSeq(toks(col("text")), k)))
        .as("gh"))
    val benchGrams = broadcast(gramHashes(benchmark).select("gh").distinct())
    val hits = gramHashes(train)
      .join(benchGrams, Seq("gh"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
    train.select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** The filter form: drop contaminated docs from the training shard. */
  def decontaminate(train: DataFrame, benchmark: DataFrame,
      k: Int = 3): DataFrame =
    train.join(
      contaminationReport(train, benchmark, k)
        .filter(col("contaminated"))
        .select("doc_id"),
      Seq("doc_id"), "left_anti")
}
