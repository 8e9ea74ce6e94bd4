package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The native bigram-hash kernel (r21) against the interpreted HOF
  * spelling it replaced — transform(sequence(0, size(t)-2), i ->
  * struct(hash60(t[i+1]), hash60(t[i+1] || ' ' || t[i+2]),
  * hash60(t[i+2]))) — on randomized token arrays including empty,
  * single-token, duplicate-token and multi-byte inputs; plus the
  * ShingleHashSeq(t, 2, p) == pmod(hash60(bigram), p) identity the DSIR
  * featurizer now leans on. */
class BigramKernelsSpec extends SparkSpec {
  import spark.implicits._

  private def hash60(c: Column): Column = Hash60(c)
  private def hofChain(t: Column): Column =
    transform(sequence(lit(0), size(t) - 2),
      i => struct(
        hash60(element_at(t, i + 1)).as("hp"),
        hash60(concat(element_at(t, i + 1), lit(" "),
          element_at(t, i + 2))).as("hb"),
        hash60(element_at(t, i + 2)).as("h2")))

  private val rng = new scala.util.Random(23)
  private val vocab = Vector("a", "bb", "the", "漢字", "x1", "ü", "a", "-")
  private def toksRow(): Seq[String] =
    Seq.fill(2 + rng.nextInt(10))(vocab(rng.nextInt(vocab.size)))

  private val data =
    (Seq.fill(100)(toksRow()) ++ Seq(Seq("only"), Seq("a", "a"), Seq.empty))
      .toDF("t")

  test("BigramHash3Seq == interpreted transform/struct spelling") {
    // the HOF path errors on size(t) < 2 (sequence(0, -1) descends), so
    // mirror the callers' guard on the reference side only; the kernel
    // returns the empty array there and explode drops it either way
    val guarded = data.filter(size(col("t")) >= 2)
    val got = guarded.select(
      BigramHash3Seq(col("t")).as("k"), hofChain(col("t")).as("h"))
      .filter(not(col("k") <=> col("h")))
    assert(got.count() === 0)
    val small = data.filter(size(col("t")) < 2)
      .select(BigramHash3Seq(col("t")).as("k"))
      .filter(size(col("k")) =!= 0)
    assert(small.count() === 0)
  }

  test("ShingleHashSeq(t, 2, p) == pmod(hash60(bigram), p)") {
    val p = 256L
    val guarded = data.filter(size(col("t")) >= 2)
    val hof = guarded.select(explode(transform(
      sequence(lit(0), size(col("t")) - 2),
      i => pmod(hash60(concat(element_at(col("t"), i + 1), lit(" "),
        element_at(col("t"), i + 2))), lit(p)))).as("b"))
      .groupBy("b").count()
    val ker = guarded.select(
      explode(ShingleHashSeq(col("t"), 2, p)).as("b"))
      .groupBy("b").count()
    assert(hof.exceptAll(ker).count() === 0 &&
      ker.exceptAll(hof).count() === 0)
  }
}
