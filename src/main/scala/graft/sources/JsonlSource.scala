package graft.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream, File, FileInputStream}
import java.nio.charset.StandardCharsets
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String

/** S1's landing format as a first-class DataSourceV2 connector: JSON-lines
  * company-ticker maps (the shape the reference fetches from the SEC ticker
  * endpoint, /root/reference/scripts/seed_companies.py:8-22, then loops over
  * in Python). `spark.read.format("graft-jsonl").load(path)` instead — the
  * parse fans out to executors, and the connector implements the three
  * levers a 100 TB scan lives on:
  *
  *   - SupportsPushDownRequiredColumns: the reader materializes ONLY the
  *     projected fields (a 2-column projection never builds title strings);
  *   - SupportsPushDownFilters: conjunctive string predicates (=, <, <=, >,
  *     >=, IN, IS NOT NULL, startswith) evaluate inside the reader during
  *     the parse — rows die before they reach the engine, and Spark elides
  *     its own re-filter for whatever we accept;
  *   - splittable byte-range partitions (Hadoop line-split contract: a
  *     record belongs to the split containing its first byte), so one big
  *     landing file parallelizes across executors instead of one task.
  *
  * All fields are string-typed (the landing contract; casts belong to the
  * normalize step, ops.Ingest.seedCompanies). '\n' is the record delimiter —
  * safe for any UTF-8 payload because multi-byte sequences never contain
  * 0x0A.
  */
class JsonlSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-jsonl"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JsonlSource.TickerSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    require(schema.fields.forall(_.dataType == StringType),
      s"graft-jsonl is a string-landing source; got $schema")
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "graft-jsonl requires a path")
    val split = Option(properties.get("partitionBytes")).map(_.toLong)
      .getOrElse(JsonlSource.DefaultPartitionBytes)
    require(split > 0, "partitionBytes must be positive")
    val mode = Option(properties.get("mode")).getOrElse("failfast")
      .toLowerCase(java.util.Locale.ROOT)
    require(JsonlSource.Modes.contains(mode),
      s"mode must be one of ${JsonlSource.Modes.mkString("/")}, got '$mode'")
    JsonlTable(schema, path, split, mode)
  }
}

object JsonlSource {
  /** company_tickers.json field names (reference seed_companies.py:15-18). */
  val TickerSchema: StructType = StructType(Seq(
    StructField("cik_str", StringType), StructField("ticker", StringType),
    StructField("title", StringType)))
  /** Default split size: 128 MiB, the parquet-row-group-ish sweet spot. */
  val DefaultPartitionBytes: Long = 128L * 1024 * 1024

  /** Malformed-record handling, mirroring Spark's JSON source contract:
    * failfast (default here — a landing file is OUR artifact, corruption
    * means the fetch is broken), dropmalformed (skip the record), or
    * permissive (emit it with every projected field null). */
  val Modes: Set[String] = Set("failfast", "dropmalformed", "permissive")

  /** Files under `path` (itself, or its *.jsonl children), stable order. */
  def listFiles(path: String): Seq[File] = {
    val f = new File(path)
    val files =
      if (f.isDirectory)
        f.listFiles().toSeq.filter(c => c.isFile && c.getName.endsWith(".jsonl"))
      else if (f.isFile) Seq(f)
      else throw new IllegalArgumentException(s"no such file or directory: $path")
    files.sortBy(_.getPath)
  }
}

case class JsonlTable(tableSchema: StructType, path: String, partitionBytes: Long,
    mode: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-jsonl `$path`"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JsonlScanBuilder(tableSchema, path, partitionBytes, mode)
}

class JsonlScanBuilder(full: StructType, path: String, partitionBytes: Long,
    mode: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty

  // Simple conjuncts over top-level string fields; anything else (Or, Not,
  // nested And) stays with Spark as a leftover re-filter.
  private def supported(f: Filter): Boolean = f match {
    case EqualTo(a, v) => top(a) && stringish(v)
    case In(a, vs) => top(a) && vs.forall(v => v == null || stringish(v))
    case GreaterThan(a, v) => top(a) && stringish(v)
    case GreaterThanOrEqual(a, v) => top(a) && stringish(v)
    case LessThan(a, v) => top(a) && stringish(v)
    case LessThanOrEqual(a, v) => top(a) && stringish(v)
    case StringStartsWith(a, v) => top(a) && v != null
    case IsNotNull(a) => top(a)
    case IsNull(a) => top(a)
    case _ => false
  }
  private def top(a: String): Boolean = full.fieldNames.contains(a)
  private def stringish(v: Any): Boolean = v.isInstanceOf[String]

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, leftover) = filters.partition(supported)
    pushed = sup
    leftover
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = JsonlScan(path, required, pushed, partitionBytes, mode)
}

case class JsonlScan(path: String, required: StructType,
    pushed: Array[Filter], partitionBytes: Long, mode: String)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-jsonl $path, ReadSchema: ${required.simpleString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] =
    JsonlSource.listFiles(path).flatMap { f =>
      val len = f.length()
      if (len == 0) Nil
      else (0L until len by partitionBytes).map(start =>
        JsonlPartition(f.getPath, start, math.min(start + partitionBytes, len)))
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    JsonlReaderFactory(required, pushed, mode)
}

case class JsonlPartition(file: String, start: Long, end: Long)
    extends InputPartition

case class JsonlReaderFactory(required: StructType, pushed: Array[Filter],
    mode: String)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[JsonlPartition]
    new JsonlPartitionReader(p, required, pushed, mode)
  }
  // Vectorized handoff: the engine consumes ColumnarBatches (BatchScanExec
  // inserts ColumnarToRow, which whole-stage-codegen fuses into a tight
  // per-batch loop) instead of one virtual next()/get() pair per record.
  override def supportColumnarReads(partition: InputPartition): Boolean = true
  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val p = partition.asInstanceOf[JsonlPartition]
    new JsonlColumnarReader(p, required, pushed, mode)
  }
}

/** The shared scan kernel: walks records whose first byte lies in
  * [start, end) — a record crossing `end` is finished here, and a split
  * with start > 0 discards the partial record it lands inside (its owner
  * is the previous split) — applying pushed filters during the parse and
  * materializing only the projected fields. `advance()` returns the next
  * surviving record's projected values (null slots for missing/null JSON
  * fields), or null at end-of-split. */
private class JsonlCursor(p: JsonlPartition, required: StructType,
    pushed: Array[Filter], mode: String) {
  private val in = new BufferedInputStream(new FileInputStream(p.file))
  // Hadoop line-split contract: seek to start-1 and discard one line, so a
  // record beginning exactly at `start` survives (the discarded "partial"
  // is then just the newline that precedes it).
  private var pos: Long = {
    val seekTo = if (p.start == 0) 0L else p.start - 1
    var skipped = 0L
    while (skipped < seekTo) {
      val n = in.skip(seekTo - skipped)
      require(n > 0, s"cannot seek to $seekTo in ${p.file}")
      skipped += n
    }
    seekTo
  }
  private val mapper = new ObjectMapper
  private val buf = new ByteArrayOutputStream(256)
  if (p.start > 0) readLine() // partial record: previous split owns it

  /** Bytes up to and including '\n' (or EOF); null at EOF. Advances pos. */
  private def readLine(): String = {
    buf.reset()
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') { buf.write(b); pos += 1; b = in.read() }
    if (b == '\n') pos += 1
    new String(buf.toByteArray, StandardCharsets.UTF_8)
  }

  private def fieldOf(node: com.fasterxml.jackson.databind.JsonNode,
      name: String): String = {
    val v = node.get(name)
    if (v == null || v.isNull) null else v.asText()
  }

  // Range filters are ACCEPTED pushdowns — Spark elides its own re-filter —
  // so they must reproduce Spark's StringType ordering exactly: binary
  // UTF-8 byte order, NOT Java String (UTF-16 code unit) order. The two
  // diverge for supplementary-plane characters vs U+E000..U+FFFF.
  private def cmp(x: String, v: Any): Int =
    org.apache.spark.unsafe.types.UTF8String.fromString(x)
      .compareTo(org.apache.spark.unsafe.types.UTF8String
        .fromString(v.asInstanceOf[String]))

  private def eval(f: Filter, get: String => String): Boolean = f match {
    case EqualTo(a, v) => val x = get(a); x != null && x == v
    case In(a, vs) => val x = get(a); x != null && vs.contains(x)
    case GreaterThan(a, v) => val x = get(a); x != null && cmp(x, v) > 0
    case GreaterThanOrEqual(a, v) => val x = get(a); x != null && cmp(x, v) >= 0
    case LessThan(a, v) => val x = get(a); x != null && cmp(x, v) < 0
    case LessThanOrEqual(a, v) => val x = get(a); x != null && cmp(x, v) <= 0
    case StringStartsWith(a, v) => val x = get(a); x != null && x.startsWith(v)
    case IsNotNull(a) => get(a) != null
    case IsNull(a) => get(a) == null
    case other => throw new IllegalStateException(s"unpushable filter $other")
  }

  /** Projected values of the next surviving record, or null at end. */
  def advance(): Array[String] = {
    while (true) {
      if (pos >= p.end) return null // next record starts in the next split
      val line = readLine()
      if (line == null) return null
      val trimmed = line.trim
      if (trimmed.nonEmpty) {
        // Malformed = unparseable OR not a JSON object (a bare scalar line
        // parses fine but is not a record).
        val parsed =
          try {
            val n = mapper.readTree(trimmed)
            if (n.isObject) n else null
          } catch {
            case _: com.fasterxml.jackson.core.JacksonException => null
          }
        val node = if (parsed != null) parsed else mode match {
          case "failfast" => throw new IllegalStateException(
            s"malformed JSONL record in ${p.file} " +
              s"(mode=failfast): ${trimmed.take(80)}")
          case "dropmalformed" => null
          case "permissive" => mapper.createObjectNode() // all-null row
        }
        if (node != null) {
          val get = (n: String) => fieldOf(node, n)
          if (pushed.forall(eval(_, get))) {
            val vals = new Array[String](required.size)
            var i = 0
            while (i < required.size) { // only projected fields materialize
              vals(i) = get(required.fields(i).name)
              i += 1
            }
            return vals
          }
        }
      }
    }
    null // unreachable
  }

  def close(): Unit = in.close()
}

/** Row-at-a-time reader over the cursor. */
class JsonlPartitionReader(p: JsonlPartition, required: StructType,
    pushed: Array[Filter], mode: String) extends PartitionReader[InternalRow] {
  private val cursor = new JsonlCursor(p, required, pushed, mode)
  private var row: InternalRow = _

  override def next(): Boolean = {
    val vals = cursor.advance()
    if (vals == null) { row = null; return false }
    val converted = new Array[Any](vals.length)
    var i = 0
    while (i < vals.length) {
      converted(i) = if (vals(i) == null) null else UTF8String.fromString(vals(i))
      i += 1
    }
    row = new GenericInternalRow(converted)
    true
  }
  override def get(): InternalRow = row
  override def close(): Unit = cursor.close()
}

/** Vectorized reader: fills OnHeapColumnVectors in `batchSize` strides and
  * hands the engine whole ColumnarBatches. */
class JsonlColumnarReader(p: JsonlPartition, required: StructType,
    pushed: Array[Filter], mode: String, batchSize: Int = 4096)
    extends PartitionReader[ColumnarBatch] {
  private val cursor = new JsonlCursor(p, required, pushed, mode)
  private val vectors = OnHeapColumnVector.allocateColumns(batchSize, required)
  private val batch = new ColumnarBatch(vectors.toArray[ColumnVector])

  override def next(): Boolean = {
    vectors.foreach(_.reset())
    var n = 0
    var vals = if (n < batchSize) cursor.advance() else null
    while (vals != null) {
      var i = 0
      while (i < vals.length) {
        if (vals(i) == null) vectors(i).putNull(n)
        else {
          val bytes = vals(i).getBytes(StandardCharsets.UTF_8)
          vectors(i).putByteArray(n, bytes, 0, bytes.length)
        }
        i += 1
      }
      n += 1
      vals = if (n < batchSize) cursor.advance() else null
    }
    batch.setNumRows(n)
    n > 0
  }
  override def get(): ColumnarBatch = batch
  override def close(): Unit = { batch.close(); cursor.close() }
}
