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
    val benchGrams = broadcast(
      benchmark
        .select(explode(shingles(toks(col("text")), k)).as("g"))
        .select(hash60(col("g")).as("gh"))
        .distinct())
    val hits = train
      .select(col("doc_id"), explode(shingles(toks(col("text")), k)).as("g"))
      .select(col("doc_id"), hash60(col("g")).as("gh"))
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
