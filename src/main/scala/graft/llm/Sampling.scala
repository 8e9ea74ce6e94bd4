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

  /** Temperature-scaled source mixture — the multilingual balancing rule
    * (XLM-R / mT5: sample source i ∝ n_i^α; α < 1 flattens the head, so
    * low-resource sources are upsampled relative to their natural share).
    * α = 1/2 here, spelled as sqrt: IEEE-correctly-rounded in BOTH engines,
    * unlike the general exp(α·ln n) whose libm last ulp is engine-specific
    * (other α values take the q56 micro-quantized-ln recipe). Per-source
    * targets are exact integer arithmetic on micro-quantized sqrt:
    * t_i = (budget · s_i) div Σ s_j with s_i = floor(sqrt(n_i)·1e6 + 0.5)
    * — floor allocation, so Σ t_i ≤ budget with at most |sources| docs of
    * under-allocation (largest-remainder top-up would add one tiny sort if
    * a caller needs the budget exact).
    *
    * Scale shape: the count agg collapses map-side to |sources| rows; the
    * target table broadcasts back; the draw is the q77 hash-ranked window
    * on the source key (a mega-source routes through the q72 salted
    * two-phase pattern unchanged). Deterministic end to end — retry- and
    * resize-stable like every hash-keyed selection here. */
  def temperatureMixture(docs: DataFrame, budget: Long): DataFrame =
    temperatureMixtureWith(docs, sourceCounts(docs), budget)

  /** The per-source counts frame the α-scaling consumes — additive longs,
    * so partials over disjoint doc batches fold to the from-scratch build
    * by summation: the property that lets a stream maintain them
    * ([[graft.streaming.StreamOps.sourceCountsStream]]). */
  def sourceCounts(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id").isNotNull)
      .groupBy("source").agg(count(lit(1)).as("n"))

  /** The mixture over prebuilt counts — `counts` may come from the in-plan
    * aggregation or the streamed fold; the arithmetic is identical. */
  def temperatureMixtureWith(docs: DataFrame, counts: DataFrame,
      budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(hash60(concat(col("doc_id").cast("string"), lit("|tmix"))),
        col("doc_id"))
    val n = counts.select(col("source"), col("n"),
      floor(sqrt(col("n").cast("double")) * lit(1000000) + lit(0.5))
        .cast("long").as("s_micro"))
    val tot = n.agg(sum("s_micro").as("st"))
    val targets = broadcast(n.crossJoin(broadcast(tot))
      .select(col("source"), col("n"),
        expr(s"(${budget}L * s_micro) div st").as("target")))
    docs.filter(col("doc_id").isNotNull)
      .withColumn("rk", row_number().over(w).cast("long"))
      .join(targets, "source")
      .filter(col("rk") <= col("target"))
      .select("source", "rk", "doc_id", "n", "target")
  }

  /** Weighted source mixture: materialize each stratum at `weightPct`% of
    * its natural rate — the mixture-building step that turns per-source
    * weights (e.g. upsample curated text, downsample crawl) into a concrete
    * row multiset. Integer percentages keep both engines in exact integer
    * arithmetic: copies = pct/100, plus one more iff the row's hash bucket
    * falls under pct%100. Replicas carry a `copy` index so downstream
    * shuffles/dedup can tell them apart. Deterministic and retry-safe like
    * every hash-keyed op here; a narrow map + bounded explode at any scale. */
  def weightedMixture(df: DataFrame, stratumCol: String,
      weightPct: Map[String, Int], defaultPct: Int = 100,
      keyCol: String = "doc_id", salt: String = "mix"): DataFrame = {
    require((weightPct.values ++ Seq(defaultPct)).forall(_ >= 0),
      "weights must be non-negative percentages")
    val wt = weightPct.foldLeft(lit(defaultPct)) { case (acc, (k, pct)) =>
      when(col(stratumCol) === k, lit(pct)).otherwise(acc)
    }
    df.withColumn("__wt", wt)
      .withColumn("n_copies",
        (col("__wt") / 100).cast("long") +
          when(hashBucket(col(keyCol), salt) < col("__wt") % 100, 1L).otherwise(0L))
      .filter(col("n_copies") >= 1)
      .withColumn("copy", explode(sequence(lit(1L), col("n_copies"))))
      .drop("__wt", "n_copies")
  }

  /** Deterministic corpus shuffle into training shards: shard =
    * hash(key|shardSalt) % nShards, order within shard = an INDEPENDENT
    * hash (different salt) — the shuffle-then-shard step that fixes
    * training-example order before packing (q51 packs within shards).
    * Hash-ordering is the distributed replacement for a global `rand()`
    * sort: repeatable across runs/retries/cluster sizes, one shuffle on the
    * shard key, and the per-shard sort parallelizes per shard instead of
    * funneling the corpus through one global order. `pos` is the final
    * 1-based position of the doc inside its shard's stream. */
  def shuffleShards(df: DataFrame, keyCol: String, nShards: Int,
      salt: String = "graft"): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("shard")
      .orderBy(col("sort_key"), col(keyCol))
    df.withColumn("shard",
        pmod(hash60(concat(col(keyCol).cast("string"), lit("|shard|" + salt))),
          lit(nShards.toLong)).cast("int"))
      .withColumn("sort_key",
        hash60(concat(col(keyCol).cast("string"), lit("|order|" + salt))))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

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
