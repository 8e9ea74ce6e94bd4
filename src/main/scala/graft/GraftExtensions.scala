package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expr.{DotProduct, Hash60, Simhash32, SortedIntersectCount}

/** SparkSessionExtensions entry point: exposes the native kernels as SQL
  * functions, so `spark.sql("SELECT graft_dot(a, b) ...")` works alongside
  * the Column API. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "java_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - strict left-fold dot product of two double arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_hash60"),
      info("graft_hash60", "graft_hash60(s) - portable 60-bit md5-prefix hash"),
      (args: Seq[Expression]) => Hash60(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_simhash32"),
      info("graft_simhash32", "graft_simhash32(hashes) - 32-bit simhash of a long array"),
      (args: Seq[Expression]) => Simhash32(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_sorted_isect"),
      info("graft_sorted_isect", "graft_sorted_isect(a, b) - |A intersect B| for sorted long arrays"),
      (args: Seq[Expression]) => SortedIntersectCount(args(0), args(1))))
  }
}
