package graft

import java.nio.file.{Files, Path => JPath}
import java.time.LocalDateTime

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampType}

/** Matrix test for [[Tables.loadEvents]] over every physical `ts` encoding
  * the driver's testdata has shipped across generations: TIMESTAMP(NANOS)
  * (rejected outright by the vectorized reader without the legacy conf),
  * TIMESTAMP(MICROS) without timezone (surfaces as TIMESTAMP_NTZ), adjusted-
  * to-UTC micros (plain TimestampType), and DATE.
  *
  * Round 8's regression was exactly a silent drift here: the testdata moved
  * nanos → NTZ-micros, the loader threw, and the whole events query family
  * fell out of registration while everything else stayed green. This spec
  * makes the NEXT encoding drift fail loudly in `sbt test` instead: all
  * timestamp-bearing encodings must load to the same TimestampType
  * microsecond instants (nanos floor-truncated, exactly like DuckDB reads
  * the same file), and a DATE column must survive pass-through unchanged.
  */
class TablesLoaderMatrixSpec extends SparkSpec {

  private lazy val root: JPath = Files.createTempDirectory("events-matrix")

  // 2026-01-02 03:04:05.123456 — wall-clock; the test session runs UTC, so
  // NTZ and adjusted-UTC readings must land on the same instant.
  private val wallClock = "2026-01-02 03:04:05.123456"
  private val expectedMicros: Long =
    LocalDateTime.parse(wallClock.replace(" ", "T"))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L + 456L

  private def dirFor(variant: String): String = {
    val d = root.resolve(variant)
    Files.createDirectories(d)
    d.toString
  }

  private def loadedTs(dir: String): DataFrame = Tables.events(spark, dir)

  test("NTZ micros (current generation) loads as TimestampType, bit-exact") {
    val dir = dirFor("ntz")
    spark.range(1).select(
        col("id").as("event_id"),
        expr(s"timestamp_ntz'$wallClock'").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = loadedTs(dir)
    assert(got.schema("ts").dataType === TimestampType)
    assert(singleCol[Long](got.select(unix_micros(col("ts")))) ===
      Seq(expectedMicros))
  }

  test("adjusted-UTC micros loads as TimestampType, bit-exact") {
    val dir = dirFor("micros_utc")
    val saved = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try spark.range(1).select(
        col("id").as("event_id"),
        expr(s"timestamp'$wallClock'").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    finally saved.fold(spark.conf.unset("spark.sql.parquet.outputTimestampType"))(
      spark.conf.set("spark.sql.parquet.outputTimestampType", _))
    val got = loadedTs(dir)
    assert(got.schema("ts").dataType === TimestampType)
    assert(singleCol[Long](got.select(unix_micros(col("ts")))) ===
      Seq(expectedMicros))
  }

  test("TIMESTAMP(NANOS) loads as TimestampType, floor-truncated to micros") {
    val dir = dirFor("nanos")
    // Spark cannot WRITE nanos timestamps; build the file with the parquet
    // example writer exactly as the old testdata generation did (INT64,
    // logical TIMESTAMP(NANOS, isAdjustedToUTC=false)).
    val mt = new MessageType("events",
      Types.required(PrimitiveTypeName.INT64).named("event_id"),
      Types.required(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.NANOS))
        .named("ts"))
    val file = new HPath(s"$dir/events.parquet")
    val w = ExampleParquetWriter.builder(file).withType(mt).build()
    val f = new SimpleGroupFactory(mt)
    // +789 ns of sub-micro residue: the loader must FLOOR (integer `div`),
    // the same truncation DuckDB applies reading this file.
    w.write(f.newGroup()
      .append("event_id", 1L)
      .append("ts", expectedMicros * 1000L + 789L))
    w.close()
    val got = loadedTs(dir)
    assert(got.schema("ts").dataType === TimestampType)
    assert(singleCol[Long](got.select(unix_micros(col("ts")))) ===
      Seq(expectedMicros))
  }

  test("DATE passes through unchanged") {
    val dir = dirFor("date")
    spark.range(1).select(
        col("id").as("event_id"),
        expr("date'2026-01-02'").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = loadedTs(dir)
    assert(got.schema("ts").dataType === DateType)
    assert(singleCol[java.sql.Date](got.select(col("ts"))) ===
      Seq(java.sql.Date.valueOf("2026-01-02")))
  }
}
