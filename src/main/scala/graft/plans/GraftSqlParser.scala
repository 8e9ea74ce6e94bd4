package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** Parser extension (SparkSessionExtensions.injectParser): the maintenance
  * statement every large table system grows (Delta OPTIMIZE, Iceberg
  * rewrite_data_files), here driving graft's own compaction:
  *
  *   COMPACT PARQUET '<inPath>' INTO '<outPath>' [TARGET <bytes>]
  *
  * Everything else falls through to Spark's parser verbatim — the extension
  * is additive, never a reinterpretation. The statement plans as a
  * LeafRunnableCommand (runs eagerly on the driver like all DDL, returns
  * the (files_in, files_out) audit row), and the rewrite itself is the
  * distributed shuffle-free coalesce in Layout.compact.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  private val Compact =
    """(?is)\s*COMPACT\s+PARQUET\s+'([^']+)'\s+INTO\s+'([^']+)'(?:\s+TARGET\s+(\d+))?\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Compact(in, out, target) =>
      CompactCommand(in, out,
        Option(target).map(_.toLong).getOrElse(128L * 1024 * 1024))
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

/** Eager driver-side command node for COMPACT PARQUET. */
case class CompactCommand(inPath: String, outPath: String, targetBytes: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_in", IntegerType, nullable = false)(),
    AttributeReference("files_out", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (in, out) = graft.ops.Layout.compact(spark, inPath, outPath, targetBytes)
    Seq(Row(in, out))
  }
}
