package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Structured Streaming: windowed agg emits per-window rows under watermark
  * advance; stateful sessionizer closes sessions on gap. MemoryStream +
  * processAllAvailable keeps it hermetic. */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("hourlyAggStream: windows close as the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.hourlyAggStream(mem.toDF())
      .writeStream.format("memory").queryName("hourly_test")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        StreamOps.Event(1, ts(5), 1, "click", 1.0),
        StreamOps.Event(2, ts(20), 1, "click", 2.0),
        StreamOps.Event(3, ts(70), 2, "view", 5.0))
      q.processAllAvailable()
      // watermark = max(ts) - 2h: hour-0 window not closed yet
      assert(spark.table("hourly_test").count() === 0)
      mem.addData(StreamOps.Event(4, ts(260), 1, "click", 1.0)) // advance watermark past hour 0+2h
      q.processAllAvailable()
      val rows = spark.table("hourly_test")
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(rows.contains((ts(0), "click", 2L, 3.0)))
      assert(rows.contains((ts(60), "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("runFileStream: tails a parquet directory into windowed output") {
    val base = java.nio.file.Files.createTempDirectory("graft_stream")
    val src = base.resolve("src").toString
    val out = base.resolve("out").toString
    // stage the driver's events table (micro-slice) as the source directory
    graft.Tables.events(spark, "/root/testdata/sf0.001").limit(500)
      .write.parquet(src)
    val q = StreamOps.runFileStream(spark, src, out)
    try {
      q.processAllAvailable()
      // append mode holds windows until the watermark passes; feed a late
      // batch far in the future to flush, then check the sink
      spark.read.parquet(src).limit(1)
        .withColumn("ts", org.apache.spark.sql.functions.expr("ts + INTERVAL 90 DAYS"))
        .write.mode("append").parquet(src)
      q.processAllAvailable()
      val result = spark.read.parquet(s"$out/data")
      assert(result.count() > 0)
      assert(result.columns.toSet ===
        Set("window_start", "event_type", "n_events", "sum_value"))
    } finally q.stop()
  }

  test("sessionizeStream: gap timeout closes a session per user") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.sessionizeStream(mem.toDS(), gapMillis = 10 * 60 * 1000)
      .writeStream.format("memory").queryName("sessions_test")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 5 min apart (one session), then silence
      mem.addData(
        StreamOps.Event(1, ts(0), 1, "click", 1.0),
        StreamOps.Event(2, ts(5), 1, "click", 2.0))
      q.processAllAvailable()
      // push event time (and watermark) far ahead so the session times out
      mem.addData(StreamOps.Event(3, ts(300), 2, "view", 1.0))
      q.processAllAvailable()
      mem.addData(StreamOps.Event(4, ts(400), 2, "view", 1.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions_test").as[StreamOps.Session].collect()
      val u1 = sessions.filter(_.user_id == 1L)
      assert(u1.length === 1)
      assert(u1.head.n_events === 2L)
      assert(u1.head.sum_value === Some(3.0))
      assert(u1.head.session_start === ts(0) && u1.head.session_end === ts(5))
    } finally q.stop()
  }

  test("dedupStream: re-delivered events emit once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.dedupStream(mem.toDS().toDF())
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        StreamOps.Event(1, ts(0), 1, "click", 1.0),
        StreamOps.Event(1, ts(0), 1, "click", 1.0)) // duplicate in-batch
      q.processAllAvailable()
      mem.addData(StreamOps.Event(1, ts(1), 1, "click", 1.0)) // re-delivery later
      q.processAllAvailable()
      mem.addData(StreamOps.Event(2, ts(2), 1, "view", 2.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select("event_id")
        .as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("enrichStream: every micro-batch row picks up its dimension attributes") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("click", 1), ("view", 2)).toDF("event_type", "priority")
    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.enrichStream(mem.toDF(), dim, Seq("event_type"))
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        StreamOps.Event(1, ts(0), 1, "click", 1.0),
        StreamOps.Event(2, ts(1), 1, "view", 2.0),
        StreamOps.Event(3, ts(2), 2, "scroll", 3.0)) // no dim row
      q.processAllAvailable()
      val got = spark.table("enrich_test")
        .select("event_id", "priority").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(got(1L) === Some(1) && got(2L) === Some(2))
      assert(got(3L) === None) // left join: unmatched event passes through
    } finally q.stop()
  }

  test("qualityFilterStream: the batch expressions run unchanged under readStream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String, Long)]
    val good = ("the quick brown fox jumps over a lazy dog and then " +
      "runs far away to find some other fun game to play all day") // 24 distinct-ish tokens
    val q = StreamOps.qualityFilterStream(
        mem.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"))
      .writeStream.format("memory").queryName("quality_stream_test")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, good, "en", "s", good.length.toLong),
        (2L, "tiny doc", "en", "s", 8L)) // fails min-token threshold
      q.processAllAvailable()
      val ids = spark.table("quality_stream_test").select("doc_id")
        .as[Long].collect().toSeq
      assert(ids === Seq(1L))
    } finally q.stop()
  }

  test("snapshotDeltaStream: re-crawled content drops in-flight, new docs pass") {
    implicit val sqlCtx = spark.sqlContext
    // the hash set is materialized ONCE per corpus snapshot (persist), so
    // micro-batches anti-join 8-byte hashes, never re-hashing the corpus
    val standing = StreamOps.standingHashes(
      Seq((100L, "known doc content", "en", "s", 17L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")).persist()
    val mem = MemoryStream[(Long, String, String, String, Long)]
    val q = StreamOps.snapshotDeltaStream(
        mem.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"), standing)
      .writeStream.format("memory").queryName("delta_stream_test")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        (1L, "brand new content", "en", "s", 17L),
        (2L, "  KNOWN   doc CONTENT ", "en", "s", 22L)) // re-crawl, renormalized
      q.processAllAvailable()
      val ids = spark.table("delta_stream_test").select("doc_id")
        .as[Long].collect().toSeq
      assert(ids === Seq(1L))
    } finally q.stop()
  }

  test("piiScrubStream: masking runs unchanged under readStream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.piiScrubStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("pii_stream_test")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, "mail bob@x.example.net or 555-1234 now"),
        (2L, "nothing to mask"))
      q.processAllAvailable()
      val got = spark.table("pii_stream_test").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
      assert(got(1L) === ((1L, 1L, "mail <EMAIL> or <PHONE> now")))
      assert(got(2L) === ((0L, 0L, "nothing to mask")))
    } finally q.stop()
  }

  test("heavyHittersStream: bounded state still surfaces the heavy token") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = StreamOps.heavyHittersStream(mem.toDS(), k = 4, outK = 2)
      .writeStream.format("memory").queryName("hh_stream_test")
      .outputMode(OutputMode.Update).start()
    try {
      // 60 tokens, 30 of them "hot" (> n/(k+1) = 12): MG must keep it even
      // though 10 distinct cold tokens churn through 4 counters
      val cold = (1 to 30).map(i => ("g1", s"cold${i % 10}"))
      val hot = (1 to 30).map(_ => ("g1", "hot"))
      mem.addData(cold.zip(hot).flatMap { case (c, h) => Seq(c, h) }: _*)
      q.processAllAvailable()
      val top = spark.table("hh_stream_test")
        .filter(col("group") === "g1").select("top")
        .as[String].collect().last
      assert(top.startsWith("hot:"), s"hot token missing from '$top'")
    } finally q.stop()
  }

  test("sessionizeStream survives events behind the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.sessionizeStream(mem.toDS(), gapMillis = 10 * 60 * 1000)
      .writeStream.format("memory").queryName("sessions_late_test")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(StreamOps.Event(1, ts(0), 1, "click", 1.0))
      q.processAllAvailable()
      // advance the watermark far past user 1's session (+1h watermark delay)
      mem.addData(StreamOps.Event(2, ts(600), 2, "view", 1.0))
      q.processAllAvailable()
      // a straggler far behind the watermark: must not kill the query
      // (pre-clamp, a timeout at/below the watermark throws and aborts)
      mem.addData(StreamOps.Event(3, ts(10), 1, "click", 9.0))
      q.processAllAvailable()
      mem.addData(StreamOps.Event(4, ts(900), 2, "view", 1.0))
      q.processAllAvailable()
      assert(q.exception.isEmpty) // alive through the late batch
      val u1 = spark.table("sessions_late_test")
        .as[StreamOps.Session].collect().filter(_.user_id == 1L)
      assert(u1.length === 1 && u1.head.n_events === 1L) // late row dropped
    } finally q.stop()
  }

  test("mergeStream: foreachBatch merge is latest-wins and re-delivery-proof") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_merge_stream")
    val table = base.resolve("table").toString
    val ckpt = base.resolve("ckpt").toString
    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.mergeStream(mem.toDF(), table, ckpt,
      naturalKey = Seq("event_id"),
      order = Seq(col("ts").desc, col("value").desc))
    try {
      mem.addData(
        StreamOps.Event(1, ts(0), 1, "click", 1.0),
        StreamOps.Event(2, ts(1), 1, "view", 2.0))
      q.processAllAvailable()
      // a later version of event 1 plus a re-delivered duplicate of event 2
      mem.addData(
        StreamOps.Event(1, ts(5), 1, "click", 9.0),
        StreamOps.Event(2, ts(1), 1, "view", 2.0))
      q.processAllAvailable()
      val got = spark.read.parquet(table)
        .select("event_id", "value").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got === Map(1L -> 9.0, 2L -> 2.0)) // latest wins, dup a no-op
      assert(q.exception.isEmpty)
    } finally q.stop()
  }

  test("correlateStreams: interval-bounded stream-stream join per user") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[StreamOps.Event]
    val buys = MemoryStream[StreamOps.Event]
    val q = StreamOps.correlateStreams(buys.toDF(), views.toDF(),
      lagMinutes = 30)
      .writeStream.format("memory").queryName("correlate_test")
      .outputMode(OutputMode.Append).start()
    try {
      views.addData(
        StreamOps.Event(101, ts(0), 1, "view", 0), // 40 min before: outside lag
        StreamOps.Event(102, ts(20), 1, "view", 0), // 20 min before: inside
        StreamOps.Event(103, ts(35), 1, "view", 0), // 5 min before: inside
        StreamOps.Event(104, ts(40), 1, "view", 0), // same minute as the buy
        StreamOps.Event(105, ts(30), 2, "view", 0)) // other user
      buys.addData(StreamOps.Event(201, ts(40), 1, "buy", 9.99))
      q.processAllAvailable()
      val got = spark.table("correlate_test")
        .select("left_id", "right_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // 104 has ts equal to the buy's — r.ts <= l.ts makes it a match too
      assert(got === Set((201L, 102L), (201L, 103L), (201L, 104L)))
      assert(q.exception.isEmpty)
    } finally q.stop()
  }
}
