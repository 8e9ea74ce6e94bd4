package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** Parser extension (SparkSessionExtensions.injectParser): the maintenance
  * statements every large table system grows (Delta OPTIMIZE [ZORDER BY] /
  * ANALYZE / VACUUM / DESCRIBE HISTORY, Iceberg rewrite_data_files),
  * here driving graft's own layout jobs:
  *
  *   COMPACT PARQUET '<inPath>' INTO '<outPath>'
  *     [TARGET <bytes>] [ZORDER BY (<xCol>, <yCol>)]
  *   ANALYZE PARQUET '<inPath>' INTO '<outPath>' [COLUMNS (a, b, ...)]
  *   ANALYZE PARQUET '<inPath>' INTO '<outPath>'
  *     HISTOGRAM FOR <col> DOMAIN <lo> TO <hi>
  *   VACUUM LAYOUT '<base>' [KEEP <n> VERSIONS]
  *   DESCRIBE LAYOUT '<base>'
  *   DIFF LAYOUT '<base>' VERSIONS <v1> TO <v2>
  *   SNAPSHOT LAYOUT '<base>' TABLE '<table>' [AS OF <v>] AS VIEW <name>
  *   DELETE FROM LAYOUT '<base>' WHERE <id_col> IN (<id>, ...)
  *     [QUARANTINE NEAR COPIES]
  *
  * Without ZORDER BY the rewrite is the shuffle-free coalesce in
  * Layout.compact; with it, the same file-count sizing routes through
  * Zorder.writeZordered so file min/max envelopes prune BOTH named
  * dimensions (the q154 gate's layout) — one statement owns both
  * maintenance jobs. Everything else falls through to Spark's parser
  * verbatim — the extension is additive, never a reinterpretation. The
  * statement plans as a LeafRunnableCommand (runs eagerly on the driver
  * like all DDL, returns the (files_in, files_out) audit row).
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  private val Compact =
    ("""(?is)\s*COMPACT\s+PARQUET\s+'([^']+)'\s+INTO\s+'([^']+)'""" +
      """(?:\s+TARGET\s+(\d+))?""" +
      """(?:\s+ZORDER\s+BY\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*,""" +
      """\s*([A-Za-z_][A-Za-z0-9_]*)\s*\))?\s*;?\s*""").r

  // ANALYZE PARQUET '<in>' INTO '<out>' [COLUMNS (a, b, ...)] — persist the
  // one-pass per-column stats mart (ops.Analyze scale tier: HLL NDV, native
  // min/max, null counts). Mirrors ANALYZE TABLE ... COMPUTE STATISTICS FOR
  // COLUMNS, but path-addressed like the COMPACT statement above.
  private val Analyze =
    ("""(?is)\s*ANALYZE\s+PARQUET\s+'([^']+)'\s+INTO\s+'([^']+)'""" +
      """(?:\s+COLUMNS\s*\(\s*([A-Za-z0-9_]+(?:\s*,\s*[A-Za-z0-9_]+)*)\s*\))?""" +
      """\s*;?\s*""").r

  // ANALYZE PARQUET '<in>' INTO '<out>' HISTOGRAM FOR <col>
  // DOMAIN <lo> TO <hi> — persist the fixed-domain histogram mart
  // (ops.Quality.histogramShard): aligned integer bins, so later shards
  // (batch or streamed) merge by addition and the banded exact quantile
  // reads its rank-holding bin from the mart instead of re-scanning.
  private val AnalyzeHist =
    ("""(?is)\s*ANALYZE\s+PARQUET\s+'([^']+)'\s+INTO\s+'([^']+)'""" +
      """\s+HISTOGRAM\s+FOR\s+([A-Za-z_][A-Za-z0-9_]*)""" +
      """\s+DOMAIN\s+(-?\d+)\s+TO\s+(-?\d+)\s*;?\s*""").r

  // VACUUM LAYOUT '<base>' [KEEP <n> VERSIONS] — garbage-collect
  // superseded deliveries under a batch-committed serving layout
  // (ops.Layout.vacuumLayout), the retention half of the manifest-swap
  // protocol. KEEP makes retention a POLICY (the Delta RETAIN precedent):
  // the newest n manifest versions stay exactly reproducible via AS OF;
  // without it only the current snapshot's files survive. DESCRIBE LAYOUT
  // '<base>' lists the published manifest versions (the time-travel
  // catalog).
  private val Vacuum =
    ("""(?is)\s*VACUUM\s+LAYOUT\s+'([^']+)'""" +
      """(?:\s+KEEP\s+(\d+)\s+VERSIONS)?\s*;?\s*""").r
  private val Describe =
    """(?is)\s*DESCRIBE\s+LAYOUT\s+'([^']+)'\s*;?\s*""".r

  // DIFF LAYOUT '<base>' VERSIONS <v1> TO <v2> — what changed between two
  // published snapshots, answered from the MANIFESTS alone (no data scan,
  // the point at 100 TB): one row per logical batch that was added,
  // removed, or rewritten (same logical, different physical delivery)
  // between v1 and v2. The Delta DESCRIBE HISTORY / table-diff shape for
  // path-addressed layouts; unknown versions refuse.
  private val Diff =
    ("""(?is)\s*DIFF\s+LAYOUT\s+'([^']+)'""" +
      """\s+VERSIONS\s+(\d+)\s+TO\s+(\d+)\s*;?\s*""").r

  // SNAPSHOT LAYOUT '<base>' TABLE '<table>' [AS OF <v>] AS VIEW <name> —
  // the time-travel FRONT DOOR: registers a temp view over one table of a
  // batch-committed layout, visibility-filtered at the given manifest
  // version (current manifest when AS OF is omitted). The Delta
  // `VERSION AS OF` read re-expressed for path-addressed layouts; an
  // unpublished version refuses (committedBatchFilterAt's contract — an
  // audit read must not silently serve a different snapshot).
  private val Snapshot =
    ("""(?is)\s*SNAPSHOT\s+LAYOUT\s+'([^']+)'\s+TABLE\s+'([A-Za-z0-9_/]+)'""" +
      """(?:\s+AS\s+OF\s+(\d+))?\s+AS\s+VIEW\s+([A-Za-z_][A-Za-z0-9_]*)""" +
      """\s*;?\s*""").r

  // DELETE FROM LAYOUT '<base>' WHERE <id_col> IN (1, 2, ...) — row-level
  // takedown over a persisted layout (the GDPR/DMCA operation a
  // training-data warehouse cannot run as a query): rewrite only the
  // affected deliveries without the victims, swap them in as ONE manifest
  // version, then the MANDATORY vacuum destroys every pre-delete delivery
  // and manifest (pre-delete AS OF versions refuse — a legal delete that
  // stays time-travelable is not a delete). The layout KIND is sniffed
  // from the tables on disk (minhash: shingles+members; bm25: postings;
  // ivfadc: codes+cents; ahash: bands+bands_meta), so one statement
  // fronts all four index families (doc_id/vec_id is the id column
  // there); ANY OTHER batch-committed root (Layout.writeDataLayout — the
  // day-partitioned events root, a z-ordered table, the shredded landing)
  // takes the generic affected-delivery rewrite keyed on the statement's
  // OWN id column — a takedown legally starts at the source-of-truth
  // corpus, not at the serving indexes.
  // The optional QUARANTINE NEAR COPIES suffix escalates a minhash-root
  // takedown from the exact-key registry to the near-copy quarantine
  // (Dedup.deleteDocsFromMinhashIndex(nearCopyBlock = true)): paraphrases
  // of the deleted content are refused at the admission threshold, not
  // just byte-identical re-crawls. Only the text admission gate has a
  // quarantine — the suffix refuses on any other layout kind rather than
  // silently doing less than the statement promises.
  private val DeleteLayout =
    ("""(?is)\s*DELETE\s+FROM\s+LAYOUT\s+'([^']+)'""" +
      """\s+WHERE\s+([A-Za-z_][A-Za-z0-9_]*)\s+IN\s*""" +
      """\(\s*(-?\d+(?:\s*,\s*-?\d+)*)\s*\)""" +
      """(\s+QUARANTINE\s+NEAR\s+COPIES)?\s*;?\s*""").r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Compact(in, out, target, zx, zy) =>
      CompactCommand(in, out,
        Option(target).map(_.toLong).getOrElse(128L * 1024 * 1024),
        (Option(zx), Option(zy)) match {
          case (Some(x), Some(y)) => Some((x, y))
          case _ => None
        })
    case AnalyzeHist(in, out, c, lo, hi) =>
      AnalyzeHistogramCommand(in, out, c, lo.toLong, hi.toLong)
    case Analyze(in, out, cols) =>
      AnalyzeCommand(in, out,
        Option(cols).map(_.split(",").map(_.trim).toSeq))
    case DeleteLayout(base, idCol, ids, quarantine) =>
      DeleteFromLayoutCommand(base, idCol,
        ids.split(",").map(_.trim.toLong).toSeq,
        nearCopyBlock = quarantine != null)
    case Vacuum(base, keep) =>
      VacuumLayoutCommand(base, Option(keep).map(_.toInt).getOrElse(1))
    case Describe(base) => DescribeLayoutCommand(base)
    case Diff(base, v1, v2) => DiffLayoutCommand(base, v1.toLong, v2.toLong)
    case Snapshot(base, table, v, view) =>
      SnapshotLayoutCommand(base, table, Option(v).map(_.toLong), view)
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

/** Eager driver-side command node for COMPACT PARQUET [ZORDER BY]. */
case class CompactCommand(inPath: String, outPath: String, targetBytes: Long,
    zorderBy: Option[(String, String)] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_in", IntegerType, nullable = false)(),
    AttributeReference("files_out", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (in, out) = zorderBy match {
      case Some((x, y)) =>
        graft.ops.Zorder.compactZordered(spark, inPath, outPath, x, y,
          targetBytes)
      case None =>
        graft.ops.Layout.compact(spark, inPath, outPath, targetBytes)
    }
    Seq(Row(in, out))
  }
}

/** Eager driver-side command node for ANALYZE PARQUET: writes the
  * scale-tier stats mart and returns the (n_cols, n_rows) audit row. */
case class AnalyzeCommand(inPath: String, outPath: String,
    cols: Option[Seq[String]]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("n_cols", IntegerType, nullable = false)(),
    AttributeReference("n_rows",
      org.apache.spark.sql.types.LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (nCols, nRows) = graft.ops.Analyze.writeStats(spark, inPath, outPath, cols)
    Seq(Row(nCols, nRows))
  }
}

/** Eager driver-side command node for ANALYZE ... HISTOGRAM: writes the
  * fixed-domain histogram mart (≤ 2^ScaleBits (b, c) rows regardless of
  * input size — one tiny-key shuffle with map-side partials) and returns
  * the (n_bins, n_rows) audit row. DOMAIN bounds are part of the
  * statement because alignment is the merge contract: every shard of the
  * same mart must bin over the same [lo, hi]. */
case class AnalyzeHistogramCommand(inPath: String, outPath: String,
    colName: String, lo: Long, hi: Long) extends LeafRunnableCommand {
  require(lo < hi, s"empty histogram domain [$lo, $hi]")
  override val output: Seq[Attribute] = Seq(
    AttributeReference("n_bins", IntegerType, nullable = false)(),
    AttributeReference("n_rows",
      org.apache.spark.sql.types.LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    graft.ops.Quality.histogramShard(spark.read.parquet(inPath),
        org.apache.spark.sql.functions.col(colName), lo, hi)
      .coalesce(1).write.mode("overwrite").parquet(outPath)
    val audit = spark.read.parquet(outPath)
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).cast("int").as("n_bins"),
        org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.sum("c"),
          org.apache.spark.sql.functions.lit(0L)).as("n_rows"))
      .collect().head
    Seq(Row(audit.getInt(0), audit.getLong(1)))
  }
}

/** Eager driver-side command node for VACUUM LAYOUT: reclaims superseded
  * deliveries outside the KEEP horizon, returns how many partition
  * directories were removed. */
case class VacuumLayoutCommand(base: String, keepVersions: Int = 1)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("removed_dirs",
      org.apache.spark.sql.types.LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(graft.ops.Layout.vacuumLayout(spark, base, keepVersions)))
}

/** Eager driver-side command node for SNAPSHOT LAYOUT ... AS VIEW: resolve
  * the visibility predicate at the requested (or current) manifest
  * version, register the filtered table scan as a temp view, and return
  * the (view, version) audit row. The view is a LAZY plan — the
  * visibility filter is a partition-column predicate, so invisible
  * deliveries are pruned directories, not filtered rows. */
case class SnapshotLayoutCommand(base: String, table: String,
    version: Option[Long], view: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("view", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("version",
      org.apache.spark.sql.types.LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val vis = graft.ops.Layout.committedBatchFilterAt(spark, base, version)
    spark.read.parquet(s"$base/$table").filter(vis)
      .createOrReplaceTempView(view)
    val resolved = version.orElse(
      graft.ops.Layout.manifestVersions(spark, base).lastOption)
      .getOrElse(-1L) // pre-protocol layout: no versions published
    Seq(Row(view, resolved))
  }
}

/** Eager driver-side command node for DIFF LAYOUT ... VERSIONS v1 TO v2:
  * manifest set difference — one row per logical batch whose membership
  * or physical delivery changed between the two published snapshots,
  * sorted by logical batch. Answered entirely from the two manifest
  * files; no table data is opened. */
case class DiffLayoutCommand(base: String, v1: Long, v2: Long)
    extends LeafRunnableCommand {
  private val LongT = org.apache.spark.sql.types.LongType
  override val output: Seq[Attribute] = Seq(
    AttributeReference("logical_batch", LongT, nullable = false)(),
    AttributeReference("change",
      org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("physical_from", LongT, nullable = true)(),
    AttributeReference("physical_to", LongT, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] =
    graft.ops.Layout.diffManifests(spark, base, v1, v2).map {
      case (l, change, from, to) =>
        Row(l, change, from.map(java.lang.Long.valueOf).orNull,
          to.map(java.lang.Long.valueOf).orNull)
    }
}

/** Eager driver-side command node for DELETE FROM LAYOUT: sniff the
  * layout kind from its tables on disk, dispatch to that family's
  * takedown (Dedup / Selection / Multimodal delete functions — rewrite
  * affected deliveries, one-manifest swap, mandatory vacuum), and return
  * the audit row (kind, matched rows, rewritten deliveries, reclaimed
  * dirs). The sniff order puts the most-specific table sets first:
  * minhash (shingles+members) and ahash (bands+bands_meta) both carry a
  * `bands` table, so the sidecar disambiguates. */
case class DeleteFromLayoutCommand(base: String, idCol: String,
    ids: Seq[Long], nearCopyBlock: Boolean = false)
    extends LeafRunnableCommand {
  private val LongT = org.apache.spark.sql.types.LongType
  override val output: Seq[Attribute] = Seq(
    AttributeReference("kind",
      org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("matched_rows", LongT, nullable = false)(),
    AttributeReference("rewritten_deliveries", LongT, nullable = false)(),
    AttributeReference("reclaimed_dirs", LongT, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val conf = spark.sparkContext.hadoopConfiguration
    def has(t: String): Boolean = {
      val p = new org.apache.hadoop.fs.Path(s"$base/$t")
      p.getFileSystem(conf).exists(p)
    }
    def noQuarantine(kind: String): Unit = require(!nearCopyBlock,
      s"QUARANTINE NEAR COPIES is only supported on minhash dedup-index " +
        s"roots (the text admission gate) — $base is a $kind layout; " +
        "refusing rather than silently doing less than the statement " +
        "promises")
    val report =
      if (has("shingles") && has("members"))
        graft.llm.Dedup.deleteDocsFromMinhashIndex(spark, base, ids,
          nearCopyBlock)
      else if (has("postings")) {
        noQuarantine("bm25")
        graft.llm.Selection.deleteDocsFromBm25Index(spark, base, ids)
      } else if (has("codes") && has("cents")) {
        noQuarantine("ivfadc")
        graft.llm.Selection.deleteVecsFromIvfadcIndex(spark, base, ids)
      } else if (has("bands") && has("bands_meta")) {
        noQuarantine("ahash")
        graft.ops.Multimodal.deleteDocsFromAhashIndex(spark, base, ids)
      } else if (has("_commits")) {
        // any other batch-committed root is a GENERIC data layout: the
        // affected-delivery rewrite keyed on the statement's id column,
        // partition structure discovered from the directories
        noQuarantine("generic data")
        graft.ops.Layout.deleteFromDataLayoutAuto(spark, base, idCol, ids)
      } else throw new IllegalArgumentException(
        s"$base is not a recognized serving layout or batch-committed " +
          "data layout (expected a minhash, bm25, ivfadc, or ahash index " +
          "root, or a Layout.writeDataLayout root carrying _commits)")
    Seq(Row(report.kind, report.nMatchedRows, report.nRewrittenDeliveries,
      report.nReclaimedDirs))
  }
}

/** Eager driver-side command node for DESCRIBE LAYOUT: one row per
  * published manifest version, oldest first — the time-travel catalog a
  * reader passes to `committedBatchFilterAt`. */
case class DescribeLayoutCommand(base: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version",
      org.apache.spark.sql.types.LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    graft.ops.Layout.manifestVersions(spark, base).map(Row(_))
}
