package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

/** Batch event analytics: window boundaries, session gap splits, JSON
  * extraction. */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    (1L, ts("2024-01-01 10:05:00"), 1L, "click", 1.0, """{"k": 7}"""),
    (2L, ts("2024-01-01 10:59:59"), 1L, "click", 2.0, """{"k": 8}"""),
    (3L, ts("2024-01-01 11:00:00"), 1L, "view", 4.0, """{"k": 9}"""),
    (4L, ts("2024-01-03 10:00:00"), 1L, "click", 8.0, """{"k": 10}"""),
    (5L, ts("2024-01-01 10:30:00"), 2L, "view", 16.0, null)
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("hourlyAgg: hour boundary closes the window exactly") {
    val out = Events.hourlyAgg(events)
      .orderBy("window_start", "event_type").collect()
    val clicks10 = out.find(r => r.getString(1) == "click" &&
      r.getTimestamp(0) == ts("2024-01-01 10:00:00")).get
    assert(clicks10.getAs[Long]("n_events") === 2L)
    assert(clicks10.getAs[Double]("sum_value") === 3.0)
    val view11 = out.find(r => r.getString(1) == "view" &&
      r.getTimestamp(0) == ts("2024-01-01 11:00:00")).get
    assert(view11.getAs[Long]("n_events") === 1L)
  }

  test("sessionize: gap over threshold starts a new session") {
    val out = Events.sessionize(events, gapSeconds = 3600L)
      .orderBy("user_id", "session_id").collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.length === 2) // events 1-3 chained (gaps < 1h), event 4 alone
    assert(u1.head.getAs[Long]("n_events") === 3L)
    assert(u1.head.getAs[Timestamp]("session_start") === ts("2024-01-01 10:05:00"))
    assert(u1.head.getAs[Timestamp]("session_end") === ts("2024-01-01 11:00:00"))
    assert(u1.last.getAs[Long]("n_events") === 1L)
    assert(out.count(_.getLong(0) == 2L) === 1)
  }

  test("trailingFeatures: RANGE frame counts exactly the preceding hour, per user") {
    val out = Events.trailingFeatures(events).orderBy("event_id").collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_trailing_1h"),
        r.getAs[Double]("sum_trailing_1h")))).toMap
    assert(out(1L) === ((1L, 1.0)))   // nothing before
    assert(out(2L) === ((2L, 3.0)))   // 10:05 is inside [09:59:59.000001, 10:59:59]
    assert(out(3L) === ((3L, 7.0)))   // both prior events within the hour
    assert(out(4L) === ((1L, 8.0)))   // two days later: window empty again
    assert(out(5L) === ((1L, 16.0)))  // user 2 isolated from user 1
  }

  test("jsonProps: both extraction paths agree; null props -> null") {
    val out = Events.jsonProps(events).orderBy("event_id").collect()
    assert(out.take(4).forall(r => r.getInt(1) == r.getInt(2)))
    assert(out.head.getInt(1) === 7)
    assert(out.last.isNullAt(1) && out.last.isNullAt(2))
  }
}
