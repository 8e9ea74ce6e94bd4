package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextOps.toks

/** Sequence packing: lay each shard's documents end-to-end into one token
  * stream and cut it into fixed-size training chunks (the concat-and-split
  * packing step that turns a filtered corpus into model-ready sequences).
  *
  * Per doc this yields its token offsets and the chunk range it lands in;
  * exploding the range gives the chunk→doc manifest (which docs a chunk
  * reads, for attention masking / provenance).
  *
  * Scale: offsets come from a cumulative sum windowed PER SHARD — a global
  * order would funnel 100 TB through one partition, so the shard key (here
  * a column; in production the shard a writer task owns) bounds every
  * window. One shuffle on the shard key; chunk explode fan-out is
  * n_tokens/chunk per doc.
  */
object Packing {

  /** Per-doc token offsets within the shard stream (deterministic: stream
    * order is (doc_id)). The base layer both chunkers share. */
  def offsets(docs: DataFrame, shardCol: String): DataFrame =
    offsetsFromCounts(docs
      .select(col("doc_id"), col(shardCol).as("shard"),
        size(toks(col("text"))).cast("long").as("n_tokens")))

  /** [[offsets]] over a caller-supplied `(doc_id, shard, n_tokens)` frame —
    * the seam that lets the packers lay out streams by any token-cost
    * measure (whitespace above; trained-BPE counts in
    * `q139_bpe_pack_manifest`). */
  def offsetsFromCounts(counts: DataFrame): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
    counts
      // A NULL text makes size() yield -1; a tokenless doc contributes no
      // chunk. Dropping n_tokens < 1 keeps every explode range downstream
      // provably ascending (sequence(first, last) with last >= first) and
      // the cumulative offsets monotone — without the guard a null doc
      // emits a DESCENDING sequence range (spurious negative-token chunk
      // rows) and corrupts every later offset in its shard.
      .filter(col("n_tokens") >= 1)
      .withColumn("end_offset", sum("n_tokens").over(w))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        (col("end_offset") - col("n_tokens")).as("start_offset"),
        col("end_offset"))
  }

  /** The one spelling of a doc's [first_chunk, last_chunk] range — shared
    * by [[packPlan]] and [[chunkManifestFromOffsets]] so the chunk-range
    * math can never diverge between the plan and the manifest. */
  private def chunkRanges(offs: DataFrame, chunkTokens: Int): DataFrame =
    offs
      .withColumn("first_chunk", floor(col("start_offset") / chunkTokens))
      .withColumn("last_chunk", floor((col("end_offset") - 1) / chunkTokens))

  /** Per-doc packing plan: token offsets plus the [first_chunk, last_chunk]
    * range of `chunkTokens`-sized chunks the doc's tokens fall into. */
  def packPlan(docs: DataFrame, shardCol: String, chunkTokens: Int): DataFrame =
    chunkRanges(offsets(docs, shardCol), chunkTokens)

  /** The chunk→doc manifest: one row per (shard, chunk, doc) the chunk
    * covers, with how many of the doc's tokens it holds. Chunk sizes sum
    * back to chunkTokens except each shard's tail chunk. */
  def chunkManifest(docs: DataFrame, shardCol: String, chunkTokens: Int): DataFrame =
    chunkManifestFromOffsets(offsets(docs, shardCol), chunkTokens)

  /** [[chunkManifest]] over a precomputed [[offsets]]/[[offsetsFromCounts]]
    * frame. */
  def chunkManifestFromOffsets(offs: DataFrame, chunkTokens: Int): DataFrame =
    chunkRanges(offs, chunkTokens)
      .select(col("shard"), col("doc_id"), col("start_offset"), col("end_offset"),
        explode(sequence(col("first_chunk"), col("last_chunk"))).as("chunk_id"))
      .select(col("shard"), col("chunk_id"), col("doc_id"),
        (least(col("end_offset"), (col("chunk_id") + 1) * chunkTokens) -
          greatest(col("start_offset"), col("chunk_id") * chunkTokens))
          .as("tokens_in_chunk"))

  /** Sliding-window manifest: windows of `windowTokens` starting every
    * `stride` tokens in the shard stream (stride < window ⇒ overlap — the
    * context-overlap chunking RAG indexes and long-context pretraining use
    * so no boundary loses its context; stride == window degenerates to
    * `chunkManifest`). One row per (shard, window, doc) the window reads.
    *
    * `windowTokens >= stride` is required: it makes coverage total (every
    * token lands in >= 1 window) and the per-doc window range provably
    * ascending. Window w covers [w*stride, w*stride + windowTokens); a doc
    * [s, e) overlaps windows ceil((s - W + 1)/stride) .. floor((e-1)/stride)
    * (clamped at 0). Same single shard-key shuffle as packPlan; fan-out is
    * bounded by n_tokens/stride + W/stride per doc. */
  def slidingManifest(docs: DataFrame, shardCol: String, windowTokens: Int,
      stride: Int): DataFrame = {
    require(stride >= 1, "stride must be positive")
    require(windowTokens >= stride,
      "windowTokens < stride leaves tokens uncovered between windows")
    // ceil((s - W + 1) / stride) == floor((s - W + stride) / stride); exact
    // in double for any offset < 2^53.
    val firstWin = greatest(lit(0L),
      floor((col("start_offset") - windowTokens + stride) / stride.toDouble)
        .cast("long"))
    val lastWin = floor((col("end_offset") - 1) / stride.toDouble).cast("long")
    offsets(docs, shardCol)
      .select(col("shard"), col("doc_id"), col("start_offset"), col("end_offset"),
        explode(sequence(firstWin, lastWin)).as("window_id"))
      .select(col("shard"), col("window_id"), col("doc_id"),
        (least(col("end_offset"), col("window_id") * stride + windowTokens) -
          greatest(col("start_offset"), col("window_id") * stride))
          .as("tokens_in_window"))
  }

  /** Length-bucketed batching: order documents by token count and cut the
    * order into fixed-size batches — the dynamic-batching layout that
    * minimizes padding waste when sequences in a batch pad to the batch
    * max (inference serving, or padded — non-packed — training). Per
    * batch: size, max_len, token sum, and waste = n·max_len − Σlen, the
    * number a scheduler compares against arrival-order batching.
    *
    * Scale shape: the global length rank is computed WITHOUT a global
    * single-task window — rank = (docs with a strictly shorter length,
    * from a broadcast length-histogram cumsum) + (rank within my length,
    * a window PARTITIONED by length — parallel). The histogram is
    * distinct-lengths-sized (bounded: lengths are ≤ max document tokens),
    * so its cumsum window is a dimension-table job; no corpus row ever
    * funnels through one task. One length-keyed shuffle + one batch-keyed
    * aggregation. */
  def lengthBucketedBatches(docs: DataFrame, batchSize: Int): DataFrame =
    lengthBucketedBatchesFromLens(
      graft.Tables.spread(docs)
        .select(col("doc_id"), size(toks(col("text"))).cast("long").as("len"))
        // size() of a NULL text's token array is -1 and a tokenless doc
        // contributes nothing to a padded batch — the same `>= 1` guard as
        // [[offsets]], so null/empty docs can neither rank (their ordering
        // vs real lengths is engine-dependent) nor drive waste negative.
        .filter(col("len") >= 1),
      batchSize)

  /** [[lengthBucketedBatches]] over a caller-supplied `(doc_id, len)`
    * frame — the seam that lets the batcher rank on any length measure
    * (whitespace tokens above; trained-BPE token counts in
    * `q136_bpe_length_batching`). Callers own the tokenless-doc guard. */
  def lengthBucketedBatchesFromLens(lens: DataFrame, batchSize: Int): DataFrame = {
    require(batchSize >= 1, "batchSize must be positive")
    val hist = lens.groupBy("len").agg(count(lit(1)).as("n_len"))
    val cumW = Window.orderBy("len")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val cum = hist.select(col("len"),
      coalesce(sum("n_len").over(cumW), lit(0L)).as("n_before"))
    val withinW = Window.partitionBy("len").orderBy(col("doc_id").asc)
    lens.join(broadcast(cum), "len")
      .withColumn("rn", col("n_before") + row_number().over(withinW))
      .withColumn("batch_id",
        floor((col("rn") - 1) / lit(batchSize.toDouble)).cast("long"))
      .groupBy("batch_id")
      .agg(count(lit(1)).as("n_docs"), max("len").as("max_len"),
        sum("len").as("sum_len"))
      .select(col("batch_id"), col("n_docs"), col("max_len"), col("sum_len"),
        (col("n_docs") * col("max_len") - col("sum_len")).as("waste"))
      .orderBy("batch_id")
  }
}
