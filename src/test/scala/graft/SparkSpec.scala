package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession across all suites (sessions are expensive;
  * scalatest runs suites in one forked JVM — build.sbt `Test / fork`). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same SQL surface as the Verify/Bench sessions (q58's Bloom path
      // calls the registered functions from SQL text)
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  import scala.jdk.CollectionConverters._

  def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  def singleCol[T](df: DataFrame): Seq[T] =
    df.collect().toSeq.map(_.getAs[T](0))
}
