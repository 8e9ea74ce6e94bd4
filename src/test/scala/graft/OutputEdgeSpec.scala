package graft

import org.apache.spark.sql.types._

/** The comparator-safety gate (VERDICT r5 item 3): the driver reads Spark
  * results via pyarrow and its DuckDB oracle via pandas, so a physical
  * decimal/binary column at a query's OUTPUT edge hash-mismatches on
  * *representation* even when every value is identical — r5's q69 was the
  * suite's only decimal128 output and its only red row. Decimals belong to
  * internal arithmetic (order-insensitive sums); the registered output edge
  * must be double/long/int/string/date/bool. This spec enforces that type
  * discipline mechanically over EVERY registered query, so the bug class
  * cannot recur silently.
  *
  * Timestamps sit between: both engines materialize them as datetime64 and
  * every timestamp-emitting query has hash-matched since r2 (q29, q33, …),
  * so they are not banned — but they ARE pinned: adding a NEW
  * timestamp-edged query without consciously extending the allowlist fails
  * here, which forces the author to confirm the comparator story first.
  */
class OutputEdgeSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  /** Queries allowed to ship timestamp columns (all driver-green since they
    * landed). Extend deliberately, never incidentally. */
  private val timestampAllowlist = Set(
    "q29_events_hourly", "q33_sessionize")

  private def hazards(dt: DataType, path: String,
      timestampOk: Boolean): Seq[String] = dt match {
    case d: DecimalType => Seq(s"$path: $d")
    case BinaryType => Seq(s"$path: binary")
    case TimestampType | TimestampNTZType =>
      if (timestampOk) Nil else Seq(s"$path: timestamp (extend the allowlist?)")
    case s: StructType =>
      s.fields.toSeq.flatMap(f =>
        hazards(f.dataType, s"$path.${f.name}", timestampOk))
    case a: ArrayType => hazards(a.elementType, s"$path[]", timestampOk)
    case m: MapType =>
      hazards(m.keyType, s"$path<key>", timestampOk) ++
        hazards(m.valueType, s"$path<val>", timestampOk)
    case _ => Nil
  }

  test("no registered query ships decimal/binary (or unpinned timestamp) at its output edge") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        hazards(fn(spark, sfDir).schema, name, timestampAllowlist.contains(name))
    }
    assert(bad.isEmpty,
      s"repr-hash hazards at the comparator-facing edge:\n${bad.mkString("\n")}")
  }
}
