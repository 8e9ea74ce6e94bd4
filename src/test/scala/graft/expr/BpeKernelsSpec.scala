package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The native BPE symbol-string kernels (r21) against the HOF spellings
  * they replaced — the per-char wrap chain, the strip+split symbol array,
  * the adjacent-pair transform, and the symbol count — on randomized
  * words (ASCII, multi-byte UTF-8, separator-adjacent controls) and on
  * merged seqs produced by the real replace chain. Bit-equality here is
  * the optimization's correctness claim: the kernels must be
  * indistinguishable from the old spellings at any input the pipeline
  * can produce. */
class BpeKernelsSpec extends SparkSpec {
  import spark.implicits._

  private val US = "\u001f"
  private def wrap(c: Column): Column = concat(lit(US), c, lit(US))
  private def wrapChain(word: Column): Column =
    concat_ws("", transform(
      filter(split(word, ""), c => c =!= ""),
      c => wrap(c)))
  private def symsChain(seq: Column): Column =
    split(regexp_replace(seq, s"^$US|$US$$", ""), US + US)
  private def pairsChain(s: Column): Column =
    transform(sequence(lit(0), size(s) - 2),
      i => concat(element_at(s, i + 1), lit(" "), element_at(s, i + 2)))

  private val rng = new scala.util.Random(17)
  private val alphabet =
    "abcdefghijklmnopqrstuvwxyz0123456789üß漢字🙂-".toCharArray
  private def word(): String = {
    val n = 2 + rng.nextInt(12)
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      val c = alphabet(rng.nextInt(alphabet.length))
      sb.append(c)
      i += 1
    }
    sb.toString
  }

  // 200 random words incl. multi-byte code points and surrogate pairs,
  // plus deliberate edge cases (the pipeline scrubs U+001F from input
  // words, so none contains the separator — matching the domain)
  private val words =
    (Seq.fill(200)(word()) ++ Seq("ab", "aa", "aaa", "ü漢", "🙂🙂", "x y"))
      .toDF("word")

  test("BpeWrap == concat_ws/transform/filter/split chain") {
    val got = words.select(col("word"),
      BpeWrap(col("word")).as("k"), wrapChain(col("word")).as("h"))
      .filter(col("k") =!= col("h"))
    assert(got.count() === 0)
  }

  // seqs after two real merges — the actual domain of the symbol kernels
  private def mergedSeqs = {
    val s0 = words.select(col("word"), wrapChain(col("word")).as("seq"))
    Seq(("a", "a"), ("aa", "a"), ("漢", "字")).foldLeft(s0) {
      case (df, (a, b)) =>
        df.select(col("word"), replace(col("seq"),
          concat(wrap(lit(a)), wrap(lit(b))),
          wrap(concat(lit(a), lit(b)))).as("seq"))
    }
  }

  test("BpeSymbols == strip+split chain on merged seqs") {
    val got = mergedSeqs.select(
      BpeSymbols(col("seq")).as("k"), symsChain(col("seq")).as("h"))
      .filter(not(col("k") <=> col("h")))
    assert(got.count() === 0)
  }

  test("BpeAdjacentPairs == filter(size>=2) + pair transform") {
    val hof = mergedSeqs.select(symsChain(col("seq")).as("s"))
      .select(when(size(col("s")) >= 2, pairsChain(col("s")))
        .otherwise(array().cast("array<string>")).as("h"),
        col("s"))
    val both = mergedSeqs.select(col("seq"),
      BpeAdjacentPairs(col("seq")).as("k"))
      .join(hof, symsChain(col("seq")) <=> col("s"))
    assert(both.filter(not(col("k") <=> col("h"))).count() === 0)
    // and the explode surfaces agree as multisets (the trainer's actual use)
    val ek = mergedSeqs.select(explode(BpeAdjacentPairs(col("seq"))).as("p"))
      .groupBy("p").count()
    val eh = mergedSeqs.select(symsChain(col("seq")).as("s"))
      .filter(size(col("s")) >= 2)
      .select(explode(pairsChain(col("s"))).as("p"))
      .groupBy("p").count()
    assert(ek.exceptAll(eh).count() === 0 && eh.exceptAll(ek).count() === 0)
  }

  test("BpeSymbolCount == size(strip+split chain)") {
    val got = mergedSeqs.select(
      BpeSymbolCount(col("seq")).as("k"),
      size(symsChain(col("seq"))).cast("long").as("h"))
      .filter(col("k") =!= col("h"))
    assert(got.count() === 0)
  }

  test("kernels null-propagate like the chains") {
    val df = Seq[Option[String]](None, Some("ab")).toDF("word")
    val r = df.select(
      BpeWrap(col("word")).isNull.as("w"),
      BpeSymbols(col("word")).isNull.as("s"),
      BpeAdjacentPairs(col("word")).isNull.as("p"),
      BpeSymbolCount(col("word")).isNull.as("c"))
      .filter(col("w") || col("s") || col("p") || col("c"))
    assert(r.count() === 1)
  }
}
