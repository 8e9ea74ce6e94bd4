package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native dot-product kernel: bit-parity with the HOF formulation (the
  * oracle contract), null semantics, and both eval paths (codegen runs under
  * collect; interpreted via literal folding in edge cases). */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot = (a: String, b: String) =>
    aggregate(zip_with(col(a), col(b), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the aggregate(zip_with) left fold on random vectors") {
    val rng = new scala.util.Random(3)
    val data = Seq.fill(50)((
      Array.fill(64)(rng.nextFloat() - 0.5f),
      Array.fill(64)(rng.nextFloat() - 0.5f)))
    val df = data.toDF("a", "b")
    val out = df.select(
      DotProduct(col("a"), col("b")).as("native"),
      hofDot("a", "b").as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null semantics: length mismatch and null elements -> null") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),       // 11.0
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0))),            // length mismatch
      (Some(Seq(1.0, 2.0)), None),                      // null input
      (Some(Seq[Double]()), Some(Seq[Double]()))        // empty -> 0.0
    ).toDF("a", "b")
    val out = rows(df.select(DotProduct(col("a"), col("b"))))
    assert(out === Seq(Seq(11.0), Seq(null), Seq(null), Seq(0.0)))
  }

  test("null element -> null") {
    val df = Seq((Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0))))
      .toDF("a", "b")
    assert(rows(df.select(DotProduct(col("a"), col("b")))) === Seq(Seq(null)))
  }
}
