package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextOps.hash60

/** Deterministic sampling and train/val/test assignment — the selection ops a
  * training-data pipeline runs after filtering/dedup.
  *
  * Everything keys off `hash60(key || '|' || salt) % 100`: a pure, narrow,
  * engine-portable expression, so
  *   - the same row lands in the same split on EVERY run, cluster size, and
  *     partitioning (unlike `rand()`- or `sample()`-based selection, which
  *     is neither repeatable across retries nor joinable across tables);
  *   - changing `salt` draws an independent re-split without touching data;
  *   - downstream tables sampled with the same key+salt stay ALIGNED (a
  *     doc's embeddings follow it into train), which per-table random
  *     sampling cannot guarantee;
  *   - zero shuffle: it fuses into whatever scan feeds it at any scale.
  */
object Sampling {

  /** Bucket 0..99 for a row key: the sampling/splitting primitive. */
  def hashBucket(key: Column, salt: String): Column =
    pmod(hash60(concat(key.cast("string"), lit("|" + salt))), lit(100L))
      .cast("int")

  /** Deterministic p-percent sample: keep rows whose bucket < pct. Applied
    * per-stratum it IS stratified sampling: the hash is uniform within any
    * subpopulation, so each stratum is sampled at the same rate without a
    * per-stratum pass. */
  def hashSample(df: DataFrame, keyCol: String, pct: Int,
      salt: String = "graft"): DataFrame =
    df.filter(hashBucket(col(keyCol), salt) < pct)

  /** Train/val/test assignment: buckets [0,trainPct) -> train,
    * [trainPct, trainPct+valPct) -> val, rest -> test. Splits are disjoint
    * and exhaustive by construction. */
  def assignSplit(df: DataFrame, keyCol: String,
      trainPct: Int = 90, valPct: Int = 5,
      salt: String = "graft"): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      "split percentages must fit in [0, 100]")
    val b = hashBucket(col(keyCol), salt)
    df.withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }
}
