package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Text analysis: stat formulas, language argmax + tie-break, fingerprint
  * locality. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String) = (id, text, "en", "s", text.length.toLong)

  test("textStats: counts and ratios") {
    val df = Seq(doc(1, "the cat and the hat")).toDF(
      "doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.textStats(df).collect().head
    assert(r.getAs[Long]("n_tokens") === 5L)
    assert(r.getAs[Long]("n_chars_txt") === 19L)
    assert(r.getAs[Double]("distinct_ratio") === 0.8) // the,cat,and,hat
    assert(r.getAs[Double]("stopword_ratio") === 0.6) // the,and,the
    assert(r.getAs[Double]("punct_ratio") === 0.0)
    assert(r.getAs[Long]("n_bpe_tokens") === 5L) // all pieces <= 4 chars
  }

  test("tfidf: rare terms outrank common ones; scores are quantized micro-units") {
    val df = Seq(
      doc(1, "apple banana apple"),
      doc(2, "banana cherry"),
      doc(3, "cherry durian cherry")).toDF(
      "doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.tfidfTopTerms(df, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // doc 1: apple tf=2 df=1 -> 2*ln(3) = 2.19722457... -> 2197225 micro
    assert(got((1L, 1L)) === (("apple", 2L, 1L, 2197225L)))
    // banana appears in 2 of 3 docs: 1*ln(1.5) = 0.40546510... -> 405465
    assert(got((1L, 2L)) === (("banana", 1L, 2L, 405465L)))
    // doc 3: cherry tf=2 df=2 -> 2*ln(1.5) -> 810930; durian tf=1 df=1 -> ln(3)
    assert(got((3L, 1L))._1 === "durian") // 1098612 > 810930
    assert(got((3L, 2L)) === (("cherry", 2L, 2L, 810930L)))
  }

  test("langId: marker trigrams drive the argmax; tie -> first profile") {
    val df = Seq(
      doc(1, "the theory then"),      // 'the' x3 -> en
      doc(2, " de los de la "),       // ' de' x2, 'la ' -> es
      doc(3, "qqqq xxxx zzzz")        // no markers -> und
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.langId(df).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("pred_lang") === "en")
    assert(out(1).getAs[String]("pred_lang") === "es")
    assert(out(2).getAs[String]("pred_lang") === "und")
  }

  test("phraseOccurrences: adjacency + order; overlaps count; absent phrase drops") {
    val df = Seq(
      doc(1, "sort merge join sort merge"),   // 2 exact occurrences
      doc(2, "merge sort"),                    // reversed order: 0
      doc(3, "sort x merge"),                  // gap: 0
      doc(4, "a a a a"),                       // overlapping self-phrase
      doc(5, "nothing here")
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val sm = TextAnalysis.phraseOccurrences(df, Seq("sort", "merge"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sm.toSeq === Seq((1L, 2L)))
    // overlapping matches each count: "a a" starts at positions 0, 1, 2
    val aa = TextAnalysis.phraseOccurrences(df, Seq("a", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(aa.toSeq === Seq((4L, 3L)))
    // 3-term phrase: the shifted intersection chains
    val smj = TextAnalysis.phraseOccurrences(df, Seq("sort", "merge", "join"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(smj.toSeq === Seq((1L, 1L)))
  }

  test("proximityOccurrences: slop admits gaps, order still required, anchors counted once") {
    val df = Seq(
      doc(1, "sort x merge"),            // gap 2: needs slop >= 1
      doc(2, "sort x y merge"),          // gap 3: needs slop >= 2
      doc(3, "merge x sort"),            // reversed: never
      doc(4, "sort merge"),              // adjacent: any slop
      doc(5, "sort x merge merge")       // ONE anchor even with two ends
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    def occ(slop: Int) = TextAnalysis
      .proximityOccurrences(df, Seq("sort", "merge"), slop)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(occ(0) === Map(4L -> 1L))
    assert(occ(1) === Map(1L -> 1L, 4L -> 1L, 5L -> 1L))
    assert(occ(2) === Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 5L -> 1L))
    // 3-term chain: each adjacent gap bounded independently
    val df3 = Seq(doc(1, "a x b y c"), doc(2, "a x x b c"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def occ3(slop: Int) = TextAnalysis
      .proximityOccurrences(df3, Seq("a", "b", "c"), slop)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(occ3(1) === Map(1L -> 1L))       // gaps 2,2 pass; 3,1 fails
    assert(occ3(2) === Map(1L -> 1L, 2L -> 1L))
    // slop=0 degenerates to the exact-phrase count on the corpus fixture
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val exact = TextAnalysis.phraseOccurrences(docs, Seq("sort", "merge"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val prox0 = TextAnalysis
      .proximityOccurrences(docs, Seq("sort", "merge"), 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(prox0 === exact && exact.nonEmpty)
  }

  test("fingerprints: shared text regions share fingerprint hashes") {
    val common = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq(
      doc(1, common + " one two three"),
      doc(2, common + " four five six"),
      doc(3, "totally unrelated words forming another document body here")
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val fps = TextAnalysis.fingerprints(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](2).toSet).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty) // winnowing keeps shared mins
    assert((fps(1L) intersect fps(3L)).isEmpty)
    val nfp = TextAnalysis.fingerprints(df).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_fp")).toMap
    assert(nfp(1L) > 0 && nfp(1L) === fps(1L).size.toLong)
  }

  test("MembershipCount kernel equals the size(filter(isin)) spelling") {
    val df = Seq(
      Seq("the", "cat", "and", "the", "dog"),
      Seq("no", "matches", "here"),
      Seq.empty[String]
    ).toDF("t")
    val out = df.select(
      graft.expr.MembershipCount(col("t"), TextOps.stopwords).as("k"),
      size(filter(col("t"), x => x.isin(TextOps.stopwords: _*))).cast("long").as("h"))
      .collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    assert(out.map(_.getLong(0)).toSeq === Seq(3L, 0L, 0L))
  }

  test("charEntropy: zero for repeated char, ln(k) for uniform, counts exact") {
    val df = Seq(doc(1, "aaaaaaaa"), doc(2, "abcdefgh")).toDF(
      "doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.charEntropy(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getAs[Double]("entropy"))).toMap
    assert(out(1L)._1 === 8L && out(1L)._2 === 1L)
    assert(math.abs(out(1L)._3) < 1e-5)              // single symbol: H = 0
    assert(out(2L)._1 === 8L && out(2L)._2 === 8L)
    assert(math.abs(out(2L)._3 - math.log(8.0)) < 1e-3) // uniform: H = ln k
  }

  test("bpeTrainRounds: winners merge and re-segment with classic non-overlap rule") {
    // "abab" x3 + "abc" x2: round-1 pairs: (a,b) x8 [2/abab-word x3 + 1 x2],
    // (b,a) x3, (b,c) x2 → winner "a b" (8). After merging: abab → [ab, ab],
    // abc → [ab, c]. Round-2 pairs: (ab,ab) x3, (ab,c) x2 → winner
    // "ab ab" (3). After merging: abab → [abab]; abc unchanged. Round-3
    // pairs: (ab,c) x2 → winner "ab c" (2).
    val docs = Seq(doc(1, "abab abab abab abc abc"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.bpeTrainRounds(docs, rounds = 3).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[String]("pair"),
        r.getAs[Long]("cnt")))
    assert(out.toSeq === Seq((1L, "a b", 8L), (2L, "ab ab", 3L),
      (3L, "ab c", 2L)))
  }

  test("bpeTrainRounds: overlapping runs merge left-to-right non-overlapping") {
    // "aaaa": round-1 pairs (a,a) x3 → winner; merge left-to-right gives
    // [aa, aa] (NOT [aa, a, a] or overlap double-count). Round 2: (aa,aa) x1.
    val docs = Seq(doc(1, "aaaa aaa"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.bpeTrainRounds(docs, rounds = 2).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[String]("pair"),
        r.getAs[Long]("cnt")))
    // round 1: (a,a) appears 3x in aaaa + 2x in aaa = 5
    // after merge: aaaa -> [aa, aa], aaa -> [aa, a]
    // round 2: (aa,aa) x1, (aa,a) x1 -> tie broken by pair asc: "aa a"
    assert(out.toSeq === Seq((1L, "a a", 5L), (2L, "aa a", 1L)))
  }
}
