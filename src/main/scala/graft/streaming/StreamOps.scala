package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming surface for the events pipeline. The reference is
  * pure batch (SURVEY §2.9), but the engine's event operators are written so
  * the SAME expressions run under `readStream`: this module wires them with
  * watermarks, plus a stateful sessionizer (flatMapGroupsWithState) — the
  * streaming twin of Events.sessionize's gaps-and-islands.
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * horizon x group cardinality; the session store keeps one small record per
  * active user and emits+evicts on event-time timeout, so state size tracks
  * ACTIVE users, not history.
  */
object StreamOps {

  private val dec = DecimalType(38, 6)

  /** Tumbling 1-hour windowed aggregation with a 2-hour watermark — the
    * streaming form of Events.hourlyAgg (same aggregates; append mode emits
    * each window once its watermark passes). */
  def hourlyAggStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(dec)).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Exactly-once ingestion from an at-least-once source: drop re-delivered
    * events by id, keeping dedup state only within the watermark horizon so
    * the state store tracks the RECENT id space, not history — the streaming
    * twin of the batch insert-if-absent sink (Sinks.insertIfAbsent). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** One event on the wire. */
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** A closed (or flushed) session. `sum_value` is None when the session saw
    * no finite values — matching the batch twin, where `sum(cast(value as
    * decimal))` over all-null inputs is NULL. */
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Option[Double])

  /** In-flight session state (public: codegen'd encoders need access).
    * `total` is a DECIMAL accumulator, not a Double: every batch sum in the
    * engine routes through DECIMAL(38,6) so addition is exact and
    * order-insensitive, and the streaming state must follow the same
    * discipline or stream and batch drift by accumulation-order rounding
    * (StreamBatchEquivalenceSpec pins the equality). `total == null` until
    * the first finite value, mirroring SQL sum-of-nulls. NOTE: adopting the
    * decimal accumulator changed the state-store schema (Double →
    * Decimal(38,18)); checkpoints written by earlier builds cannot resume
    * and must be discarded. */
  case class SessionBuf(t0: Long, t1: Long, cnt: Long,
      total: java.math.BigDecimal)

  /** value → the engine's sum contract: DECIMAL(38,6), HALF_UP — exactly
    * Spark's `cast(value as decimal(38,6))`, INCLUDING the non-finite rule:
    * NaN/Infinity cast to decimal as NULL and the sum skips them
    * (BigDecimal.valueOf would throw instead, killing the query). */
  private def toDec6(v: Double): java.math.BigDecimal =
    if (java.lang.Double.isFinite(v))
      java.math.BigDecimal.valueOf(v).setScale(6, java.math.RoundingMode.HALF_UP)
    else null

  /** SQL sum semantics over the nullable accumulator: null + v = v. */
  private def accum(total: java.math.BigDecimal,
      v: java.math.BigDecimal): java.math.BigDecimal =
    if (v == null) total else if (total == null) v else total.add(v)

  /** Stateful sessionization: one state record per user; a session closes
    * when `gapMillis` passes without events (event-time timeout) and is
    * emitted downstream. flatMapGroupsWithState = the custom-state tier the
    * brief calls for; the batch twin (Events.sessionize) is the oracle-checked
    * one. */
  def sessionizeStream(events: Dataset[Event], gapMillis: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionBuf]) =>
          def emit(b: SessionBuf): Session =
            Session(userId, new java.sql.Timestamp(b.t0),
              new java.sql.Timestamp(b.t1), b.cnt,
              Option(b.total).map(_.doubleValue))
          if (rows.isEmpty && state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(emit(s))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var buf = state.getOption.orNull
            val closed = Seq.newBuilder[Session]
            for (e <- sorted) {
              val t = e.ts.getTime
              buf match {
                case null =>
                  buf = SessionBuf(t, t, 1L, toDec6(e.value))
                case b if t - b.t1 > gapMillis =>
                  closed += emit(b)
                  buf = SessionBuf(t, t, 1L, toDec6(e.value))
                case b =>
                  buf = SessionBuf(b.t0, math.max(b.t1, t), b.cnt + 1,
                    accum(b.total, toDec6(e.value)))
              }
            }
            state.update(buf)
            // Clamp: a batch of late events can put t1+gap at or below the
            // current watermark, and setTimeoutTimestamp throws on a
            // non-future timeout — which would kill the streaming query.
            state.setTimeoutTimestamp(
              math.max(buf.t1 + gapMillis, state.getCurrentWatermarkMs() + 1))
            closed.result().iterator
          }
      }
  }

  /** Stream-static enrichment join: attach a bounded dimension to every
    * event as it arrives. The static side is broadcast, so each micro-batch
    * enriches map-side — no stream-side shuffle, no state store; the
    * standard dimension-lookup shape (and the streaming twin of the
    * screener's J2 broadcast join). Left join: an event with no dimension
    * row passes through with nulls rather than silently dropping. */
  def enrichStream(events: DataFrame, dim: DataFrame,
      key: Seq[String]): DataFrame =
    events.join(broadcast(dim), key, "left")

  /** Stream-stream interval join: correlate two live event streams per
    * user — each left event matches right events at most `lagMinutes`
    * BEFORE it (the attribution shape: purchase joined to the views that
    * preceded it). Both sides carry watermarks and the join condition
    * bounds right's event time relative to left's, which is exactly what
    * lets the state store EXPIRE buffered rows: state per side is the
    * watermark horizon + lag window of events, not the stream's history.
    * Without the time-bound condition Spark would (rightly) refuse to plan
    * an inner stream-stream join as unbounded-state. */
  def correlateStreams(left: DataFrame, right: DataFrame,
      lagMinutes: Int): DataFrame = {
    val l = left.withWatermark("ts", "1 hour").alias("l")
    val r = right.withWatermark("ts", "1 hour").alias("r")
    l.join(r,
      col("l.user_id") === col("r.user_id") &&
        col("r.ts") >= col("l.ts") - expr(s"INTERVAL $lagMinutes MINUTES") &&
        col("r.ts") <= col("l.ts"),
      "inner")
      .select(col("l.user_id").as("user_id"),
        col("l.event_id").as("left_id"), col("r.event_id").as("right_id"),
        col("l.ts").as("left_ts"), col("r.ts").as("right_ts"))
  }

  /** The corpus quality-filter pass under `readStream`: the SAME pure
    * column expressions as the batch q46 (TextAnalysis.qualityFilter) —
    * zero shuffle, zero state; proof the narrow operators run unchanged in
    * streaming jobs (the engine's batch/streaming reuse contract). */
  def qualityFilterStream(docsStream: DataFrame): DataFrame =
    graft.llm.TextAnalysis.qualityFilter(docsStream)

  /** URL canonicalization under `readStream`: the SAME narrow-map column
    * expressions as the batch q160 ([[graft.llm.UrlCuration.urlMart]]) —
    * zero shuffle, zero state; the crawl-frontier canonicalize step runs
    * unchanged on the firehose (downstream: feed the url-keyed stats
    * partials exactly like the BM25/LM ingest streams). */
  def urlCanonicalizeStream(docsStream: DataFrame): DataFrame =
    graft.llm.UrlCuration.urlMart(docsStream)

  /** Classifier scoring under `readStream`: the SAME projection as the
    * batch q127 scorer against a WRITTEN model table
    * ([[graft.llm.Classifier.logregTrain]]'s (j, w, mu, sd) output) — the
    * model is a static frame that pivots to one row and broadcasts into
    * every micro-batch. Zero shuffle, zero state; the batch query's
    * output order is a batch concern (a stream emits scores as docs
    * arrive). Train offline, score the firehose — the deployment shape
    * the model table exists for. */
  def qualityScoreStream(docsStream: DataFrame,
      model: DataFrame): DataFrame =
    graft.llm.Classifier.scoreFrame(docsStream, model)

  /** Streaming twin of the q150 reference-LM perplexity scorer: the shared
    * per-bigram kernel ([[graft.llm.LangModel.scoredBigrams]] — explode +
    * stream-static model joins, all legal in append mode) followed by a
    * per-doc fold in flatMapGroupsWithState with NO retained state: a
    * document's bigrams are derived from its own input row, so every group
    * is complete within its micro-batch and emits immediately — bounded
    * memory on an unbounded stream (state is never stored; a re-delivered
    * doc re-emits, the same contract as every append projection twin).
    * Same integer-micro arithmetic and ((sum/n)/1e6) association as the
    * batch fold, so stream output == batch output row-for-row. */
  def lmScoreStream(docsStream: DataFrame, uni: DataFrame,
      pair: DataFrame): DataFrame = {
    import docsStream.sparkSession.implicits._
    graft.llm.LangModel.scoredBigrams(docsStream, uni, pair)
      .as[(Long, String, Long)]
      .groupByKey { case (docId, lang, _) => (docId, lang) }
      .flatMapGroupsWithState[Int, (Long, String, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, String), rows: Iterator[(Long, String, Long)],
            state: GroupState[Int]) =>
          var n = 0L
          var sum = 0L
          rows.foreach { case (_, _, sMicro) => n += 1; sum += sMicro }
          // state deliberately untouched: nothing outlives the batch
          Iterator.single((key._1, key._2, n,
            sum.toDouble / n.toDouble / 1000000.0))
      }
      .toDF("doc_id", "lang", "n_bigrams", "avg_surprisal")
  }

  /** Streaming twin of the media curation gate (q138): the batch kernel is
    * a single zero-shuffle mapPartitions (encode seam → decode both
    * modalities → flag verdict), so the streaming form IS the batch
    * function applied to the stream — per-partition codec amortization and
    * all. Zero state; gate the firehose as media arrives. */
  def mediaGateStream(docsStream: DataFrame): DataFrame =
    graft.ops.Multimodal.mediaQualityGate(docsStream)(
      docsStream.sparkSession)

  /** Streaming twin of q59's heavy hitters: per group key, a running
    * Misra–Gries sketch over the token stream with AT MOST `k` counters of
    * state per group — the bounded-state property is what makes a
    * heavy-hitters query runnable on an unbounded stream at all (a
    * groupBy(token).count() stream would grow state with token
    * cardinality). The update rule is LITERALLY the batch aggregate's
    * (graft.expr.MisraGriesTopK.updateToken — one shared implementation, so
    * the two tiers cannot drift), hence the guarantee carries over: any
    * token with true count > n/(k+1) is present in the sketch. Update
    * mode: each micro-batch emits the group's refreshed top `outK` as a
    * CSV'd "token:count" string (memory-sink-friendly). */
  def heavyHittersStream(tokens: Dataset[(String, String)],
      k: Int, outK: Int): DataFrame = {
    import tokens.sparkSession.implicits._
    tokens
      .groupByKey(_._1)
      .mapGroupsWithState[Map[String, Long], (String, String)](
        GroupStateTimeout.NoTimeout) {
        (group: String, rows: Iterator[(String, String)],
            state: GroupState[Map[String, Long]]) =>
          val buf = scala.collection.mutable.HashMap.empty[String, Long]
          state.getOption.foreach(m => buf ++= m)
          rows.foreach { case (_, tok) =>
            graft.expr.MisraGriesTopK.updateToken(buf, tok, k)
          }
          state.update(buf.toMap)
          val top = buf.toSeq.sortBy { case (t, c) => (-c, t) }.take(outK)
            .map { case (t, c) => s"$t:$c" }.mkString(",")
          (group, top)
      }
      .toDF("group", "top")
  }

  /** Streaming twin of q79's snapshot-delta dedup: arriving documents whose
    * normalized-content hash is absent from the standing corpus survive; a
    * re-crawl of standing content drops in-flight. The standing side is a
    * STATIC hash set (8 bytes/doc) the CALLER materializes once per corpus
    * snapshot (persist or write the [[standingHashes]] frame — deriving it
    * inline here would re-hash and re-broadcast the whole corpus every
    * micro-batch); the join is stream-static left_anti — stateless for the
    * stream, no watermark bookkeeping. At scale the hash set broadcasts,
    * or — when it outgrows broadcast limits — `broadcastHint = false`
    * switches to a shuffle join the micro-batch co-partitions into (pass a
    * bucketed standing table for an exchange-free static side). Within-
    * stream dups are the separate concern [[dedupStream]] owns
    * (watermarked state). */
  def snapshotDeltaStream(docsStream: DataFrame, standingHashes: DataFrame,
      broadcastHint: Boolean = true): DataFrame = {
    val hashes = standingHashes.select("h")
    docsStream
      .withColumn("h", graft.llm.TextOps.hash60(
        graft.llm.TextOps.normText(col("text"))))
      .join(if (broadcastHint) broadcast(hashes) else hashes,
        Seq("h"), "left_anti")
      .drop("h")
  }

  /** Streaming PII scrub: the batch expressions (Curation.piiScrub) applied
    * unchanged to a readStream frame — a pure narrow map, so batch and
    * streaming tiers share one implementation and cannot drift. */
  def piiScrubStream(docsStream: DataFrame): DataFrame =
    graft.llm.Curation.piiScrub(docsStream)

  /** Streaming twin of q97's sequential Poisson (PPS) sampler: per-source
    * state is the k smallest (xi, doc_id) seen so far. Min-k under a total
    * order is commutative and associative, so the final state equals the
    * batch sampler over the same rows for ANY arrival order or micro-batch
    * partitioning (the equivalence gate feeds two batches to prove the
    * cross-batch merge). xi comes from the same expression as the batch
    * tier ([[graft.llm.Selection.ppsXi]]) — one rule, two execution modes.
    *
    * State is O(k) doubles+longs per source — bounded regardless of stream
    * length, no watermark needed (a sample-so-far never expires). Each
    * update emits the group's full current sample plus n_seen, so a
    * downstream consumer (or the gate) keeps the row with the highest
    * n_seen per source. */
  def ppsSampleStream(docsStream: DataFrame, k: Int,
      salt: String = "sps"): DataFrame = {
    import docsStream.sparkSession.implicits._
    docsStream
      .select(col("source"), col("doc_id"), col("n_chars"),
        graft.llm.Selection.ppsXi(col("doc_id"), col("n_chars"), salt)
          .as("xi"))
      .as[(String, Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Vector[(Double, Long, Long)]),
          (String, Long, Seq[(Long, Long, Long)])](
        GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[(String, Long, Long, Double)],
            state: GroupState[(Long, Vector[(Double, Long, Long)])]) =>
          val (seen0, best0) = state.getOption.getOrElse((0L, Vector.empty))
          val incoming = rows.map { case (_, id, nc, xi) => (xi, id, nc) }
            .toVector
          val best = (best0 ++ incoming)
            .sortBy { case (xi, id, _) => (xi, id) }.take(k)
          val seen = seen0 + incoming.size
          state.update((seen, best))
          (source, seen, best.zipWithIndex.map { case ((_, id, nc), i) =>
            (i + 1L, id, nc)
          })
      }
      .toDF("source", "n_seen", "picks")
  }

  /** The per-snapshot hash set [[snapshotDeltaStream]] anti-joins against:
    * compute once when the standing corpus snapshot lands, persist or
    * store, and reuse across every micro-batch until the next snapshot. */
  def standingHashes(standing: DataFrame): DataFrame =
    standing
      .select(graft.llm.TextOps.hash60(
        graft.llm.TextOps.normText(col("text"))).as("h"))
      .distinct()

  /** The streaming→warehouse bridge: foreachBatch + the batch merge sink.
    * Each micro-batch merges into the stored table with
    * Sinks.mergeLatestWins (best row per natural key under a TOTAL order),
    * which makes the sink IDEMPOTENT — exactly the property foreachBatch
    * needs, because after a failure Spark re-delivers the last batch
    * (at-least-once per batch id); re-merging the same rows is a no-op, so
    * end-to-end the table is exactly-once. At 100 TB the merge shuffles
    * once on the key, co-partitioned with the table's bucketing; here the
    * store is a parquet path swapped whole (the small-dim form).
    * Returns the running query. */
  def mergeStream(events: DataFrame, tablePath: String, checkpoint: String,
      naturalKey: Seq[String], order: Seq[org.apache.spark.sql.Column]): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val existing =
          try spark.read.parquet(tablePath)
          catch { case _: org.apache.spark.sql.AnalysisException =>
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema)
          }
        val merged = graft.ops.Sinks
          .mergeLatestWins(existing, batch.toDF(), naturalKey, order)
          .localCheckpoint() // cut lineage BEFORE overwriting what we read
        merged.write.mode("overwrite").parquet(tablePath)
        ()
      }
      .start()

  /** Streaming maintenance of the BM25 index ([[graft.llm.TextAnalysis
    * .bm25TermStats]]/[[graft.llm.TextAnalysis.bm25CorpusStats]]): each
    * micro-batch's PARTIAL statistics land under `statsPath/batch_id=N`.
    * Additive merges are the foreachBatch hazard — a re-delivered batch
    * would double-count under the latest-wins recipe [[mergeStream]] uses —
    * so idempotence comes from the layout instead: re-processing batch N
    * overwrites ONLY its own partition (dynamic partition overwrite),
    * byte-identical. [[bm25IndexRead]] folds the partials.
    *
    * Two operational invariants the layout argument rests on:
    *   - The checkpoint and statsPath live and die TOGETHER. A restart with
    *     a fresh checkpoint against an old statsPath restarts batch ids at
    *     0 while stale higher-id partitions linger — additive folds would
    *     silently double-count, so batch 0 checks for leftovers and fails
    *     loudly instead (latest-wins sinks converge in that scenario;
    *     additive ones cannot).
    *   - Partition-count maintenance is an offline REBUILD: stop the
    *     stream, fold everything into a fresh stats root as the reserved
    *     base partition `batch_id=-1` (negative ids can never collide with
    *     stream batch ids, so the restarted stream's batch 0 cannot
    *     overwrite the folded history), swap paths atomically, restart
    *     with a fresh checkpoint AND a drained/advanced source. The fresh
    *     checkpoint makes a replayable source (file dir, Kafka from
    *     earliest) re-deliver ALL history — which the -1 base already
    *     contains — so the restarted stream must only see post-compaction
    *     data: archive the consumed source files (or start the new reader
    *     at latest). The batch-0 guard cannot detect this (the stats dir
    *     is legitimately just {-1}); it is a source-side contract.
    *     Compacting the live dir in place would break the batch_id layout
    *     the idempotence depends on. */
  def bm25IndexStream(docsStream: DataFrame, statsPath: String,
      checkpoint: String): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF()
        if (batchId == 0L) {
          // batch_id=0 leftovers are the legitimate re-delivery case (the
          // overwrite is idempotent); ANY other id — including the
          // reserved batch_id=-1 compaction base, which by construction
          // holds a PREVIOUS stream's already-folded batches — means a
          // fresh checkpoint was pointed at an already-fed stats root,
          // and the additive fold would double-count. (Contrast the
          // ingest streams' staleBatchPartitions, where a -1 base is the
          // legitimate birth shape: those layouts append doc-disjoint
          // rows to a pre-built base; these fold additive partials born
          // from empty.) Listed through the Hadoop FileSystem so the
          // guard holds on HDFS/S3/file: URIs, not just bare local paths.
          // Both subdirectories must pass: a root whose terms dir was
          // cleared but whose corpus dir retains foreign partitions
          // would double-count (n_docs, sum_dl) just as silently.
          val stale = Seq("terms", "corpus").exists { sub =>
            val hPath = new org.apache.hadoop.fs.Path(s"$statsPath/$sub")
            val fs = hPath.getFileSystem(
              b.sparkSession.sparkContext.hadoopConfiguration)
            fs.exists(hPath) && fs.listStatus(hPath)
              .exists { st =>
                val n = st.getPath.getName
                n.startsWith("batch_id=") &&
                  n.stripPrefix("batch_id=") != "0"
              }
          }
          require(!stale,
            s"statsPath $statsPath has partitions from a previous run " +
              "(appended batches or a compacted batch_id=-1 base) but " +
              "this stream is at batch 0 (new checkpoint): additive folds " +
              "would double-count. Clear the stats root or reuse the " +
              "original checkpoint.")
        }
        // Dynamic overwrite is scoped to THESE writers (DataFrameWriter
        // option overrides the session conf) — setting it on the shared
        // session would silently change overwrite semantics for every
        // other partitioned write on the session while the stream runs.
        graft.llm.TextAnalysis.bm25TermStats(b)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").partitionBy("batch_id")
          .option("partitionOverwriteMode", "dynamic")
          .parquet(s"$statsPath/terms")
        graft.llm.TextAnalysis.bm25CorpusStats(b)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").partitionBy("batch_id")
          .option("partitionOverwriteMode", "dynamic")
          .parquet(s"$statsPath/corpus")
        ()
      }
      .start()

  /** Streaming maintenance of the DSIR bucket statistics
    * ([[graft.llm.Selection.dsirBucketStats]]): each micro-batch's PARTIAL
    * (b, tc, rc) counts land under `statsPath/batch_id=N` — the same
    * layout-level exactly-once recipe as [[bm25IndexStream]] (additive
    * merges can't use latest-wins; idempotence comes from dynamic partition
    * overwrite scoping a re-delivered batch to its own byte-identical
    * partition). [[dsirStatsRead]] folds the partials; raw counts are
    * additive longs, so the fold equals the from-scratch build over the
    * same docs (spec-pinned), and [[graft.llm.Selection.dsirResampleWith]]
    * consumes the folded table in place of the in-plan build. The same two
    * operational invariants as the BM25 index apply: checkpoint and
    * statsPath live and die together (batch 0 fails loudly on leftover
    * partitions), and compaction is an offline rebuild into the reserved
    * `batch_id=-1` base partition. */
  def dsirStatsStream(docsStream: DataFrame, statsPath: String,
      checkpoint: String, targetSource: String = "src1",
      buckets: Int = 256): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF()
        if (batchId == 0L) requireFreshStatsRoot(b.sparkSession, statsPath)
        graft.llm.Selection.dsirBucketStats(
          graft.llm.Selection.dsirBucketCounts(b, buckets), targetSource)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").partitionBy("batch_id")
          .option("partitionOverwriteMode", "dynamic")
          .parquet(statsPath)
        ()
      }
      .start()

  /** Batch-0 freshness guard shared by the additive stats streams: any
    * `batch_id=` partition other than 0 (legitimate re-delivery of the
    * first batch) means the root holds a previous run's folds — appended
    * batches OR a compacted `batch_id=-1` base (already-folded data) —
    * and a fresh checkpoint re-folding onto it would double-count. */
  private def requireFreshStatsRoot(spark: SparkSession,
      statsPath: String): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(statsPath)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stale = fs.exists(hPath) && fs.listStatus(hPath).exists { st =>
      val n = st.getPath.getName
      n.startsWith("batch_id=") && n.stripPrefix("batch_id=") != "0"
    }
    require(!stale,
      s"statsPath $statsPath has partitions from a previous run " +
        "(appended batches or a compacted batch_id=-1 base) but " +
        "this stream is at batch 0 (new checkpoint): additive folds " +
        "would double-count. Clear the stats root or reuse the " +
        "original checkpoint.")
  }

  /** Fold the per-batch DSIR partials into the serving stats table. */
  def dsirStatsRead(spark: SparkSession, statsPath: String): DataFrame =
    spark.read.parquet(statsPath).groupBy("b")
      .agg(sum("tc").as("tc"), sum("rc").as("rc"))

  /** Streaming maintenance of the per-source corpus counts
    * ([[graft.llm.Sampling.sourceCounts]] — what the q116 temperature
    * mixture's α-scaling consumes): the same layout-level exactly-once
    * recipe as [[dsirStatsStream]] — per-batch (source, n) partials under
    * `batch_id=N` with dynamic partition overwrite, additive-long fold at
    * read, batch-0 stale-partition guard. */
  def sourceCountsStream(docsStream: DataFrame, statsPath: String,
      checkpoint: String): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF()
        if (batchId == 0L) requireFreshStatsRoot(b.sparkSession, statsPath)
        graft.llm.Sampling.sourceCounts(b)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").partitionBy("batch_id")
          .option("partitionOverwriteMode", "dynamic")
          .parquet(statsPath)
        ()
      }
      .start()

  /** Fold the per-batch source-count partials into the serving table. */
  def sourceCountsRead(spark: SparkSession, statsPath: String): DataFrame =
    spark.read.parquet(statsPath).groupBy("source").agg(sum("n").as("n"))

  /** Streaming maintenance of the q162 host-curation table: per micro-batch
    * the url-keyed MERGEABLE partials (q163's shard law —
    * [[graft.llm.UrlCuration.hostStatsShard]]) land under `batch_id=N`
    * with the same layout-level exactly-once recipe as [[dsirStatsStream]]
    * (dynamic partition overwrite = idempotent re-delivery; batch-0
    * freshness guard). [[hostStatsRead]] folds on the url key and
    * finalizes — equal to the batch [[graft.llm.UrlCuration.hostStats]]
    * over the same docs even when one canonical URL's copies arrive in
    * different micro-batches (spec-pinned), which is exactly the case a
    * scalar-additive fold would double-count. */
  def hostStatsStream(docsStream: DataFrame, statsPath: String,
      checkpoint: String): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF()
        if (batchId == 0L) requireFreshStatsRoot(b.sparkSession, statsPath)
        graft.llm.UrlCuration.hostStatsShard(graft.llm.UrlCuration.urlMart(b))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").partitionBy("batch_id")
          .option("partitionOverwriteMode", "dynamic")
          .parquet(statsPath)
        ()
      }
      .start()

  /** Fold the per-batch url-keyed partials and finalize the host table. */
  def hostStatsRead(spark: SparkSession, statsPath: String): DataFrame =
    graft.llm.UrlCuration.hostStatsFromShards(
      spark.read.parquet(statsPath)
        .groupBy("domain", "host", "canon_url")
        .agg(sum("n_docs").as("n_docs"), sum("sum_chars").as("sum_chars")))

  /** [[hostStatsStream]] in the HLL-REGISTER tier (the q168 shard format):
    * each micro-batch lands one 2^p-byte register vector per host
    * ([[graft.llm.UrlCuration.hostStatsShardHll]]) under its `batch_id`
    * partition — O(hosts this batch) rows instead of O(urls this batch) —
    * with the same dynamic-overwrite exactly-once recipe and batch-0
    * freshness guard. Registers are idempotent under max, so a
    * re-delivered batch's vector folds to the same serving answer even
    * byte-for-byte. */
  def hostStatsHllStream(docsStream: DataFrame, statsPath: String,
      checkpoint: String): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF()
        if (batchId == 0L) requireFreshStatsRoot(b.sparkSession, statsPath)
        graft.llm.UrlCuration.hostStatsShardHll(
            graft.llm.UrlCuration.urlMart(b))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").partitionBy("batch_id")
          .option("partitionOverwriteMode", "dynamic")
          .parquet(statsPath)
        ()
      }
      .start()

  /** Fold the per-batch register partials (sum longs, register-wise max)
    * and finalize the host table with the estimated n_urls — a URL seen in
    * several micro-batches sets the same registers each time, so the fold
    * counts it once (the spec gate pins fold == one-shot batch build,
    * byte-identical registers). */
  def hostStatsHllRead(spark: SparkSession, statsPath: String): DataFrame =
    graft.llm.UrlCuration.hostStatsFromShardsHll(
      graft.llm.UrlCuration.mergeHostStatsShardsHll(
        Seq(spark.read.parquet(statsPath).drop("batch_id"))))

  /** Streaming twin of the ANALYZE stats mart ([[graft.ops.Analyze]]):
    * each micro-batch lands ONE wide partial row (counts, native min/max,
    * HLL NDV registers — [[graft.ops.Analyze.statsShard]]) under its
    * `batch_id` partition with the dynamic-overwrite exactly-once recipe
    * and the batch-0 freshness guard. All three folds are commutative and
    * associative (sum / min / max / register-max), so
    * [[tableStatsRead]] == one-shot batch `columnStats` over the union of
    * the batches — the spec-pinned equivalence gate. */
  def tableStatsStream(docsStream: DataFrame, statsPath: String,
      checkpoint: String,
      cols: Seq[String] = graft.ops.Analyze.DocumentCols): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF()
        if (batchId == 0L) requireFreshStatsRoot(b.sparkSession, statsPath)
        graft.ops.Analyze.statsShard(b, cols)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").partitionBy("batch_id")
          .option("partitionOverwriteMode", "dynamic")
          .parquet(statsPath)
        ()
      }
      .start()

  /** Fold the per-batch wide partials and finalize the per-column stats
    * table (the serving read of [[tableStatsStream]]). */
  def tableStatsRead(spark: SparkSession, statsPath: String,
      cols: Seq[String] = graft.ops.Analyze.DocumentCols): DataFrame =
    graft.ops.Analyze.statsFromShards(
      spark.read.parquet(statsPath).drop("batch_id"), cols)

  /** Streaming maintenance of the corpus-gram Count-Min sketch — the
    * artifact q178's decontamination prefilter consumes
    * ([[graft.llm.Decontam.cmsContaminationReport]]'s `sketchOf` seam):
    * each micro-batch lands ONE serialized sketch row of its docs' gram
    * hashes ([[graft.llm.Decontam.gramSketchShard]]) under its `batch_id`
    * partition, with the dynamic-overwrite exactly-once recipe and the
    * batch-0 freshness guard. CMS counters are integer sums, so the
    * serving fold ([[corpusCmsRead]]) is BYTE-IDENTICAL to the one-shot
    * batch sketch of the union, and a re-DELIVERED batch overwrites its
    * own partition — nothing can double-count (the StreamBatch
    * equivalence gate pins both). */
  def corpusCmsStream(docsStream: DataFrame, sketchPath: String,
      checkpoint: String, k: Int = 3): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF()
        if (batchId == 0L) requireFreshStatsRoot(b.sparkSession, sketchPath)
        graft.llm.Decontam.gramSketchShard(b, k)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").partitionBy("batch_id")
          .option("partitionOverwriteMode", "dynamic")
          .parquet(sketchPath)
        ()
      }
      .start()

  /** Counter-additive fold of the per-batch sketch rows → the 1-row
    * sketch frame the decontamination prefilter reads. */
  def corpusCmsRead(spark: SparkSession, sketchPath: String): DataFrame =
    graft.llm.Decontam.gramSketchFromShards(
      spark.read.parquet(sketchPath).drop("batch_id"))

  /** Streaming maintenance of a fixed-domain length histogram — the
    * artifact the banded exact quantile reads its rank-holding bin from
    * ([[graft.ops.Quality.quantileFromHistogram]]): each micro-batch
    * lands its (b, c) histogram shard ([[graft.ops.Quality
    * .histogramShard]] — bins over a FIXED [lo, hi] ingest domain, so
    * every batch's bins align) under its `batch_id` partition with the
    * dynamic-overwrite exactly-once recipe and the batch-0 freshness
    * guard. Bin counts are integer sums: the serving fold
    * ([[histogramRead]]) equals the one-shot batch histogram EXACTLY,
    * so the quantile it locates is the exact rank answer, not an
    * estimate (the StreamBatch equivalence gate pins cutoff equality
    * against [[graft.ops.Quality.exactQuantileBanded]]). */
  def histogramStream(docsStream: DataFrame, vName: String, lo: Long,
      hi: Long, histPath: String, checkpoint: String): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF()
        if (batchId == 0L) requireFreshStatsRoot(b.sparkSession, histPath)
        graft.ops.Quality.histogramShard(b, col(vName), lo, hi)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").partitionBy("batch_id")
          .option("partitionOverwriteMode", "dynamic")
          .parquet(histPath)
        ()
      }
      .start()

  /** Integer-additive fold of the per-batch histogram shards → the
    * aligned (b, c) frame [[graft.ops.Quality.quantileFromHistogram]]
    * consumes. */
  def histogramRead(spark: SparkSession, histPath: String): DataFrame =
    spark.read.parquet(histPath)
      .groupBy("b").agg(sum("c").as("c"))

  /** Streaming constraint enforcement — the dead-letter pattern on the
    * ingest path ([[graft.ops.Quality.enforceConstraints]]'s twin): each
    * micro-batch splits ONCE over a shared scan and lands its good rows
    * under `goodPath/batch_id=` and its quarantined rows (with the
    * violated-constraint list) under `quarantinePath/batch_id=`, both
    * with the dynamic-overwrite exactly-once recipe — a re-delivered
    * batch overwrites BOTH of its partitions atomically per side, so the
    * conservation law (good + quarantined == input) holds per batch and
    * therefore over any fold of batches. Batch-0 freshness guards on both
    * roots. */
  def quarantineStream(docsStream: DataFrame,
      constraints: Seq[(String, org.apache.spark.sql.Column)],
      goodPath: String, quarantinePath: String,
      checkpoint: String): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF()
        if (batchId == 0L) {
          requireFreshStatsRoot(b.sparkSession, goodPath)
          requireFreshStatsRoot(b.sparkSession, quarantinePath)
        }
        val (good, bad) = graft.ops.Quality.enforceConstraints(b, constraints)
        def land(df: DataFrame, path: String): Unit =
          df.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite").partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(path)
        land(good, goodPath)
        land(bad, quarantinePath)
        ()
      }
      .start()

  /** Batch-0 restart guard shared by the serving-layout ingest streams:
    * true iff a `batch_id=` partition belonging to a LOGICAL batch other
    * than 0 (a legitimate batch-0 re-delivery) or the reserved base (-1)
    * exists `depth` directory levels under `path` — batch_id nests under
    * term_bucket= in the postings layout and under cell= in the codes
    * layout, so the guard must look one level down, not just at the
    * root. The id is resolved through [[graft.ops.Layout
    * .logicalBatchLocal]]: manifest-protocol appends land under
    * phys-strided ids (logical 0 → batch_id=1000000+gen), and whitelisting
    * only the literal "0" would refuse the documented crash-replay — a
    * sink that committed batch 0 but crashed before the streaming
    * checkpoint recorded it re-runs batchId 0 on restart with the SAME
    * checkpoint, and must be allowed to dynamic-overwrite its own
    * delivery (ownership against OTHER streams is the marker's job, not
    * this guard's). */
  private def staleBatchPartitions(spark: SparkSession, path: String,
      depth: Int): Boolean = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: org.apache.hadoop.fs.Path, d: Int): Boolean =
      if (!fs.exists(p)) false
      else if (d == 0)
        fs.listStatus(p).exists { st =>
          val n = st.getPath.getName
          n.startsWith("batch_id=") &&
            n.stripPrefix("batch_id=").toLongOption.forall { id =>
              // negative ids are the BASE and its takedown-rewrite chain
              // (batch_id=-2, -3, … — logically batch -1): a takedown'd
              // root must accept a fresh admission stream, not refuse on
              // behalf of content that was deliberately destroyed
              id >= 0L && graft.ops.Layout.logicalBatchLocal(id) != 0L
            }
        }
      else fs.listStatus(p).filter(_.isDirectory)
        .exists(st => walk(st.getPath, d - 1))
    walk(hPath, depth)
  }

  /** Batch-0 ownership check for the serving-layout ingest streams: the
    * stale-partition guard is blind to logical batch 0 and the base -1
    * (0 is a legitimate re-delivery), so a PREVIOUS stream's batch-0
    * data would silently survive a fresh-checkpoint restart and the new
    * stream's batch 0 would dynamic-overwrite only the partitions its own
    * docs hit — stale postings/codes linger and later re-deliveries
    * double-count. The marker closes the blind spot: the first stream to
    * feed a root records its checkpoint path in `_stream_marker`; a
    * stream arriving at batch 0 with a DIFFERENT checkpoint is refused. */
  private[streaming] def assertStreamOwnership(spark: SparkSession,
      basePath: String, checkpoint: String, attempt: Int = 0): Unit = {
    require(attempt < 8,
      s"stream-ownership claim on $basePath did not settle after $attempt " +
        "attempts (marker repeatedly appearing/vanishing — concurrent " +
        "manual cleanup?)")
    val marker = new org.apache.hadoop.fs.Path(s"$basePath/_stream_marker")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def assertSame(): Unit = {
      val in = fs.open(marker)
      val prev = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      if (prev.isEmpty) {
        // A claim now lands content-complete or not at all (link/rename
        // below), so an EMPTY marker is a crashed pre-atomic claim from an
        // older layout version, not an owner — clearing it and re-running
        // the claim race is the recovery path that used to not exist (the
        // empty string matched no checkpoint, refusing every legitimate
        // owner forever). Two streams may both observe the corpse and both
        // delete; the claim race below still elects exactly one winner.
        fs.delete(marker, false)
        claim()
      } else require(prev == checkpoint,
        s"index root $basePath was fed by a stream checkpointed at " +
          s"'$prev'; this stream's checkpoint is '$checkpoint'. A fresh " +
          "checkpoint over an already-fed root re-delivers batch ids that " +
          "overwrite the previous stream's partitions. Compact into a " +
          "fresh root or reuse the original checkpoint.")
    }
    def claim(): Unit = {
      // The claim must be ATOMIC and CONTENT-COMPLETE: of two streams
      // racing to claim a fresh root at batch 0, exactly one may win, and
      // no reader may ever observe a claimed-but-empty marker (a crash
      // between create and write used to leave one, permanently refusing
      // the legitimate owner). Content is written to a dot-prefixed temp
      // file first; the claim itself is then one atomic name operation
      // carrying the full content:
      //   - local fs: hard-link temp → marker. link(2) is O_EXCL-like
      //     (EEXIST if the marker exists) and atomic, so claim and content
      //     land together — the race-spec pins 16 concurrent claimers to
      //     one winner.
      //   - HDFS-likes: rename(temp, marker) — namenode-arbitrated, fails
      //     if the destination exists, content already durable in temp.
      // A loser deletes its temp and re-reads the winner's marker, failing
      // the same checkpoint comparison an up-front exists() would have.
      val claimed =
        try {
          if (fs.getScheme == "file") {
            val local = java.nio.file.Paths.get(marker.toUri.getPath)
            java.nio.file.Files.createDirectories(local.getParent)
            val tmp = local.resolveSibling(
              s"._stream_marker.${java.util.UUID.randomUUID()}.tmp")
            java.nio.file.Files.write(tmp, checkpoint.getBytes("UTF-8"))
            try { java.nio.file.Files.createLink(local, tmp); true }
            finally java.nio.file.Files.deleteIfExists(tmp)
          } else {
            val tmp = new org.apache.hadoop.fs.Path(
              s"$basePath/._stream_marker.${java.util.UUID.randomUUID()}.tmp")
            val out = fs.create(tmp, true)
            try out.write(checkpoint.getBytes("UTF-8")) finally out.close()
            val won = fs.rename(tmp, marker)
            if (!won) fs.delete(tmp, false)
            won
          }
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: java.io.IOException if fs.exists(marker) => false
        }
      if (!claimed) assertStreamOwnership(spark, basePath, checkpoint,
        attempt + 1)
    }
    if (fs.exists(marker)) assertSame() else claim()
  }

  /** Streaming ingest into the PERSISTED BM25 serving layout: each
    * micro-batch of documents appends through
    * [[graft.llm.Selection.appendToBm25Index]] under the sink's own
    * batchId — foreachBatch's replay contract and the layout's dynamic-
    * overwrite idempotence are the SAME mechanism, so a re-delivered
    * batch rewrites its own (bucket, batch) partitions byte-identically
    * and the served index never double-counts (spec-pinned: stream ==
    * one-shot build, search-identical).
    *
    * Operational contract, same family as [[bm25IndexStream]]'s: the base
    * layout exists before the stream starts ([[graft.llm.Selection
    * .writeBm25Index]] — appends bucket by its geometry sidecar); batches
    * are doc-disjoint (a file source of NEW docs; an updated doc is the
    * offline rebuild/compaction path); checkpoint and index root live and
    * die together — the batch-0 guard fails loudly on foreign batch
    * partitions, and a compaction swap-in requires a drained source.
    * Distinct from [[bm25IndexStream]], which maintains only the
    * STATISTICS tables for rank-at-query-time serving: this stream
    * maintains the full postings layout the /search endpoint reads. */
  def bm25IngestStream(docsStream: DataFrame, basePath: String,
      checkpoint: String): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF()
        if (batchId == 0L) {
          assertStreamOwnership(b.sparkSession, basePath, checkpoint)
          val stale =
            staleBatchPartitions(b.sparkSession, s"$basePath/postings", 1) ||
              Seq("term_stats", "corpus_stats").exists(sub =>
                staleBatchPartitions(b.sparkSession, s"$basePath/$sub", 0))
          require(!stale,
            s"index root $basePath has batch partitions from a previous " +
              "run but this stream is at batch 0 (new checkpoint): " +
              "additive stats folds would double-count. Compact into a " +
              "fresh root or reuse the original checkpoint.")
        }
        graft.llm.Selection.appendToBm25Index(b, basePath, batchId)
        ()
      }
      .start()

  /** Streaming ingest into the PERSISTED IVFADC index: each micro-batch
    * of embeddings appends through
    * [[graft.llm.Selection.appendToIvfadcIndex]] under the sink's own
    * batchId — same exactly-once argument as [[bm25IngestStream]].
    * Geometry stays FROZEN (assign + residual-encode against the written
    * centroids/codebook); a vec_id re-delivered across batches is the
    * search path's latest-wins case, physically dropped at compaction.
    * The base index exists before the stream starts
    * ([[graft.llm.Selection.writeIvfadcIndex]]); batch schema is the
    * embeddings table's (vec_id, embedding, label). */
  def ivfadcIngestStream(embStream: DataFrame, basePath: String,
      checkpoint: String): StreamingQuery =
    embStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF()
        if (batchId == 0L) {
          assertStreamOwnership(b.sparkSession, basePath, checkpoint)
          require(!staleBatchPartitions(b.sparkSession,
              s"$basePath/codes", 1),
            s"index root $basePath has code batches from a previous run " +
              "but this stream is at batch 0 (new checkpoint): compact " +
              "into a fresh root or reuse the original checkpoint.")
        }
        graft.llm.Selection.appendToIvfadcIndex(b, basePath, batchId)
        ()
      }
      .start()

  /** Streaming ingest into the PERSISTED aHash image near-dup index: each
    * micro-batch of documents encodes/decodes to hash-band rows and
    * appends through [[graft.ops.Multimodal.appendToAhashIndex]] under the
    * sink's own batchId — the media-modality member of the ingest-stream
    * family, sharing the whole contract: batchId == layout idempotence
    * key (replay rewrites its own partitions), `_stream_marker` ownership
    * at batch 0, stale-batch guard one level under the (band, vb)
    * directories, and the batch-commit window so a concurrent /imagedup
    * never reads half a batch. Base layout exists first
    * ([[graft.ops.Multimodal.writeAhashIndex]]); batch schema is the
    * documents table's. */
  def ahashIngestStream(docsStream: DataFrame, basePath: String,
      checkpoint: String): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF()
        if (batchId == 0L) {
          assertStreamOwnership(b.sparkSession, basePath, checkpoint)
          require(!staleBatchPartitions(b.sparkSession,
              s"$basePath/bands", 2),
            s"index root $basePath has band batches from a previous run " +
              "but this stream is at batch 0 (new checkpoint): compact " +
              "into a fresh root or reuse the original checkpoint.")
        }
        graft.ops.Multimodal.appendToAhashIndex(b, basePath, batchId)(
          b.sparkSession)
        ()
      }
      .start()

  /** Streaming ADMISSION into the persisted MinHash dedup index — q184 as
    * a stream: each micro-batch of documents is probed against the index
    * ([[graft.llm.Dedup.probeMinhashDupDeltaIds]], O(batch) — delta bands
    * broadcast, index streams map-side), near-dups of the ALREADY-ADMITTED
    * corpus are rejected, and the survivors append under the sink's own
    * batchId through the Layout manifest protocol — so a batch-2 doc that
    * duplicates a batch-1 survivor is caught exactly like one duplicating
    * the original corpus (dups caught ACROSS micro-batches, the
    * StreamBatchEquivalenceSpec gate).
    *
    * Exactly-once: the probe EXCLUDES the batch's own logical id, so a
    * re-driven micro-batch (crash after commit, checkpoint replay) sees
    * the pre-delivery snapshot instead of self-matching its first
    * delivery's survivors at jaccard 1.0 — the replayed admission decides
    * identically and the append dynamic-overwrites its own partitions
    * byte-identically. The flagged batch is materialized (eager
    * localCheckpoint) BEFORE the append so the index write never reads
    * the parquet dirs it is overwriting, and each batch's per-source
    * (n_admitted, n_rejected, n_skipped) row set publishes in the SAME manifest swap
    * as its index delta ([[graft.llm.Dedup.admitIntoMinhashIndex]]) —
    * queryable via [[graft.llm.Dedup.admissionLog]]. Base index exists
    * first ([[graft.llm.Dedup.writeMinhashIndex]]); batch schema is the
    * documents table's. */
  def minhashAdmissionStream(docsStream: DataFrame, basePath: String,
      checkpoint: String, threshold: Double = 0.8): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF()
        val sess = b.sparkSession
        if (batchId == 0L) {
          assertStreamOwnership(sess, basePath, checkpoint)
          require(!Seq("bands", "shingles", "members", "admissions")
              .exists(t => staleBatchPartitions(sess, s"$basePath/$t", 0)),
            s"index root $basePath has batch partitions from a previous " +
              "run but this stream is at batch 0 (new checkpoint): a " +
              "re-admitted doc would self-reject against its old copy. " +
              "Compact into a fresh root or reuse the original checkpoint.")
        }
        // probe + decide + append + per-source admission LOG, all under
        // one batch commit — the decision and its audit record publish in
        // the same manifest swap (Dedup.admitIntoMinhashIndex)
        graft.llm.Dedup.admitIntoMinhashIndex(sess, b, basePath, batchId,
          threshold)
        ()
      }
      .start()

  /** [[minhashAdmissionStream]] + the INGEST-TIME caption-farm flag
    * (q187's signal moved to where it is cheapest — the batch boundary,
    * where the text probe is already paid by admission): after each
    * micro-batch's admission transaction commits, the batch is
    * pair-probed against the PRE-DELIVERY snapshot (the probe excludes
    * the batch's own logical id — the admission replay seam, so a
    * crash-replayed batch flags identically) and pairs whose images
    * disagree land under `flagsPath/batch_id=<id>` via dynamic partition
    * overwrite — replay rewrites the partition byte-identically instead
    * of double-appending. `corpusFeats` is the indexed side's
    * fingerprint store (the decoded feature mart or the aHash index at
    * rest); the delta side decodes from the batch itself. The flag write
    * is downstream of the admission commit: a crash between them replays
    * the batch, the admission rewrite is idempotent, and the flag
    * recompute is snapshot-pinned — flags == the batch spelling
    * (StreamBatchEquivalenceSpec). */
  def captionFarmAdmissionStream(docsStream: DataFrame, basePath: String,
      checkpoint: String, corpusFeats: DataFrame, flagsPath: String,
      threshold: Double = 0.8, imgMaxHamming: Int = 8): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF()
        val sess = b.sparkSession
        if (batchId == 0L) {
          assertStreamOwnership(sess, basePath, checkpoint)
          require(!Seq("bands", "shingles", "members", "admissions")
              .exists(t => staleBatchPartitions(sess, s"$basePath/$t", 0)),
            s"index root $basePath has batch partitions from a previous " +
              "run but this stream is at batch 0 (new checkpoint): a " +
              "re-admitted doc would self-reject against its old copy. " +
              "Compact into a fresh root or reuse the original checkpoint.")
        }
        graft.llm.Dedup.admitIntoMinhashIndex(sess, b, basePath, batchId,
          threshold)
        graft.ops.Multimodal.captionFarmProbe(sess, b, basePath,
            corpusFeats, threshold, imgMaxHamming,
            excludeLogicalBatch = Some(batchId))
          .withColumn("batch_id", lit(batchId))
          .coalesce(1) // flag rows are pair-set-sized per micro-batch
          .write.mode("overwrite").partitionBy("batch_id")
          .option("partitionOverwriteMode", "dynamic")
          .parquet(flagsPath)
        ()
      }
      .start()

  /** Fold the per-batch partials into the serving index: the (term, df)
    * table and the corpus scalar — the frames [[graft.llm.TextAnalysis
    * .bm25RankWith]] consumes. All sums are exact longs, so the fold equals
    * a from-scratch rebuild over the same docs (spec-pinned). */
  def bm25IndexRead(spark: SparkSession, statsPath: String)
      : (DataFrame, DataFrame) =
    (spark.read.parquet(s"$statsPath/terms")
      .groupBy("term").agg(sum("df").as("df")),
      spark.read.parquet(s"$statsPath/corpus")
        .agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl")))

  // one definition of "index file count" across the batch and streaming
  // compactors — a divergent copy here would make their (in, out) reports
  // inconsistent
  private def nParquetFiles(spark: SparkSession, p: String): Long =
    graft.llm.Selection.countParquetFiles(spark, p)

  /** Materialize a folded stats frame as the reserved `batch_id=-1` base
    * partition of a FRESH root, sized to `targetBytes` files from the input
    * layout's on-disk size (the [[graft.ops.Layout.compact]] recipe). */
  private def writeFoldedBase(spark: SparkSession, folded: DataFrame,
      inPath: String, outPath: String, targetBytes: Long): Unit = {
    val hp = new org.apache.hadoop.fs.Path(inPath)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hp).getLength
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    folded.withColumn("batch_id", lit(-1L))
      .coalesce(nOut)
      .write.mode("overwrite").partitionBy("batch_id").parquet(outPath)
  }

  /** Offline compaction of the per-batch DSIR stats partials: fold
    * everything into the reserved `batch_id=-1` base partition of a FRESH
    * stats root — exactly the rebuild the streaming docstrings promise.
    * Counts are additive longs, so [[dsirStatsRead]] of the compacted root
    * equals the read of the fragmented one EXACTLY (spec-pinned); the
    * negative base id can never collide with a restarted stream's batch 0.
    * Swap-in is the caller's move: stop stream → swap paths → restart with
    * the ORIGINAL checkpoint (source offsets are the stream's identity;
    * batches continue above the folded ids and never trip the batch-0
    * guard). A FRESH checkpoint over the compacted base is refused at
    * batch 0 — the -1 base is already-folded history, and a replayable
    * source's batch 0 would re-fold it (spec-pinned refusal). Compacting
    * the live dir in place would break the batch_id idempotence layout.
    * Returns (in, out) parquet file counts. */
  def compactDsirStats(spark: SparkSession, statsPath: String,
      outPath: String, targetBytes: Long = 128L * 1024 * 1024): (Long, Long) = {
    writeFoldedBase(spark, dsirStatsRead(spark, statsPath),
      statsPath, outPath, targetBytes)
    (nParquetFiles(spark, statsPath), nParquetFiles(spark, outPath))
  }

  /** Offline compaction of the per-batch BM25 index partials (terms +
    * corpus scalars) into the `batch_id=-1` base of a fresh root — the same
    * contract as [[compactDsirStats]]: [[bm25IndexRead]] of the compacted
    * root is exactly equal, restart-collision-free, caller swaps paths. */
  def compactBm25Index(spark: SparkSession, statsPath: String,
      outPath: String, targetBytes: Long = 128L * 1024 * 1024): (Long, Long) = {
    val (terms, corpus) = bm25IndexRead(spark, statsPath)
    writeFoldedBase(spark, terms, s"$statsPath/terms",
      s"$outPath/terms", targetBytes)
    writeFoldedBase(spark, corpus, s"$statsPath/corpus",
      s"$outPath/corpus", targetBytes)
    (nParquetFiles(spark, statsPath), nParquetFiles(spark, outPath))
  }

  /** File-source form: tail a directory of event parquet (schema inferred
    * from the batch table) into the hourly aggregation, writing parquet +
    * checkpoint under `outDir`. Returns the running query. */
  def runFileStream(spark: SparkSession, srcDir: String, outDir: String): StreamingQuery = {
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    hourlyAggStream(stream)
      .writeStream
      .format("parquet")
      .option("path", s"$outDir/data")
      .option("checkpointLocation", s"$outDir/ckpt")
      .outputMode(OutputMode.Append)
      .start()
  }
}
