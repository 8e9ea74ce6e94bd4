package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expr.{CharGramHashSeq, DotProduct, Hash60, HllSketch, MisraGriesTopK, ShingleHashSeq, Simhash32, SortedIntersectCount, ThresholdedIntersectCount}

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
    ext.injectFunction((FunctionIdentifier("graft_thresholded_isect"),
      info("graft_thresholded_isect",
        "graft_thresholded_isect(a, b, min_count) - |A intersect B| if >= min_count, early-exits below"),
      (args: Seq[Expression]) => ThresholdedIntersectCount(args(0), args(1), args(2))))
    // k / n / p parameters must be integer literals (they shape the kernel,
    // not the per-row data).
    ext.injectFunction((FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes",
        "graft_shingle_hashes(tokens, k[, p]) - positional word k-gram hash60s, mod p if given"),
      (args: Seq[Expression]) => ShingleHashSeq(args(0),
        litInt(args, 1, "k"),
        if (args.length > 2) {
          val p = litLong(args, 2, "p")
          require(p >= 1, s"argument 'p' must be a positive modulus, got $p")
          p
        } else -1L)))
    ext.injectFunction((FunctionIdentifier("graft_chargram_hashes"),
      info("graft_chargram_hashes",
        "graft_chargram_hashes(text, n) - positional character n-gram hash60s"),
      (args: Seq[Expression]) => CharGramHashSeq(args(0), litInt(args, 1, "n"))))
    ext.injectFunction((FunctionIdentifier("graft_mg_topk"),
      info("graft_mg_topk",
        "graft_mg_topk(value, k, out_k) - Misra-Gries heavy-hitters: top out_k strings by frequency with <= k counters of state"),
      (args: Seq[Expression]) =>
        new MisraGriesTopK(args(0), litInt(args, 1, "k"), litInt(args, 2, "out_k"))))
    ext.injectFunction((FunctionIdentifier("graft_hll"),
      info("graft_hll",
        "graft_hll(value[, p]) - HyperLogLog distinct estimate over the " +
          "md5-portable hash; 2^p bytes of register state (default p=12, " +
          "sigma ~1.6%), register-wise-max mergeable"),
      (args: Seq[Expression]) => {
        val child = org.apache.spark.sql.catalyst.expressions.Cast(
          args(0), org.apache.spark.sql.types.StringType)
        if (args.length > 1) new HllSketch(child, litInt(args, 1, "p"))
        else new HllSketch(child, 12)
      }))
    // The register-vector face of graft_hll: sketch emits the 2^p-byte
    // registers (the shard-mergeable partial), merge folds vectors
    // register-wise-max, estimate finalizes — the SQL spelling of the
    // UrlCuration HLL shard tier.
    ext.injectFunction((FunctionIdentifier("graft_hll_sketch"),
      info("graft_hll_sketch",
        "graft_hll_sketch(value[, p]) - HyperLogLog register vector " +
          "(binary, 2^p bytes; default p=12) — the mergeable partial"),
      (args: Seq[Expression]) => {
        val child = org.apache.spark.sql.catalyst.expressions.Cast(
          args(0), org.apache.spark.sql.types.StringType)
        if (args.length > 1)
          graft.expr.HllRegisters(child, litInt(args, 1, "p"))
        else graft.expr.HllRegisters(child, 12)
      }))
    ext.injectFunction((FunctionIdentifier("graft_hll_merge"),
      info("graft_hll_merge",
        "graft_hll_merge(registers[, p]) - register-wise-max fold of " +
          "graft_hll_sketch vectors"),
      (args: Seq[Expression]) =>
        if (args.length > 1)
          graft.expr.HllMergeRegisters(args(0), litInt(args, 1, "p"))
        else graft.expr.HllMergeRegisters(args(0), 12)))
    ext.injectFunction((FunctionIdentifier("graft_hll_estimate"),
      info("graft_hll_estimate",
        "graft_hll_estimate(registers[, p]) - distinct estimate from a " +
          "graft_hll_sketch register vector"),
      (args: Seq[Expression]) =>
        if (args.length > 1)
          graft.expr.HllEstimate(args(0), litInt(args, 1, "p"))
        else graft.expr.HllEstimate(args(0), 12)))
    // Count-Min: the FREQUENCY member of the sketch family (HLL distinct,
    // Misra-Gries top-k) — point-frequency estimates for any key without a
    // vocabulary-sized shuffle; counter-wise-additive shard merge.
    ext.injectFunction((FunctionIdentifier("graft_cms_sketch"),
      info("graft_cms_sketch",
        "graft_cms_sketch(value[, depth, width]) - Count-Min sketch " +
          "(binary) over the md5-portable hash; counters sum on merge"),
      (args: Seq[Expression]) => {
        val child = org.apache.spark.sql.catalyst.expressions.Cast(
          args(0), org.apache.spark.sql.types.StringType)
        if (args.length > 2)
          graft.expr.CmsSketchAgg(child, litInt(args, 1, "depth"),
            litInt(args, 2, "width"))
        else graft.expr.CmsSketchAgg(child, graft.expr.Cms.DefaultDepth,
          graft.expr.Cms.DefaultWidth)
      }))
    ext.injectFunction((FunctionIdentifier("graft_cms_merge"),
      info("graft_cms_merge",
        "graft_cms_merge(sketch) - counter-wise-sum fold of " +
          "graft_cms_sketch payloads"),
      (args: Seq[Expression]) => graft.expr.CmsMergeAgg(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_cms_estimate"),
      info("graft_cms_estimate",
        "graft_cms_estimate(sketch, key) - point-frequency estimate " +
          "(always >= the true count)"),
      (args: Seq[Expression]) => graft.expr.CmsEstimate(args(0),
        org.apache.spark.sql.catalyst.expressions.Cast(
          args(1), org.apache.spark.sql.types.StringType))))
    // Spark ships a distributed Bloom-filter aggregate + probe (the pair its
    // InjectRuntimeFilter optimization builds runtime row filters from) but
    // registers neither for end users; exposing them gives the decontamination
    // pipeline its no-broadcast scale path (Decontam.bloomContaminationReport)
    // without reimplementing the sketch. The probe's filter side must be a
    // scalar subquery or constant (its own type check) — see the SQL shape in
    // Decontam.
    ext.injectFunction((FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg",
        "graft_bloom_agg(xxhash64_value[, est_items]) - Bloom-filter sketch (binary) over long values"),
      (args: Seq[Expression]) =>
        if (args.length > 1)
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
            args(0), litLong(args, 1, "est_items"))
        else
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_might_contain"),
      info("graft_might_contain",
        "graft_might_contain(bloom, xxhash64_value) - sketch membership probe (false positives possible, no false negatives)"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(args(0), args(1))))
    // Whole-operator extension (tier c): the as-of merge join's planner
    // strategy — the logical node (graft.plans.AsofMergeJoinPlan) reaches
    // the physical AsofMergeJoinExec through it.
    ext.injectPlannerStrategy(_ => graft.plans.AsofMergeJoinStrategy)
    // Optimizer extension: left-side predicate pushdown through the as-of
    // node (Catalyst's PushDownPredicates can't see through unknown nodes).
    ext.injectOptimizerRule(_ => graft.plans.PushLeftFilterThroughAsof)
    // Parser extension: the COMPACT PARQUET maintenance statement; all
    // other SQL falls through to Spark's parser untouched.
    ext.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))
  }

  private def litInt(args: Seq[Expression], i: Int, name: String): Int = {
    val v = litLong(args, i, name)
    require(v >= 1 && v <= Int.MaxValue,
      s"argument '$name' must be a positive integer literal, got $v")
    v.toInt
  }

  // Integral literal only: a fractional or non-numeric constant must be an
  // analysis error, not a silent truncation into a different kernel shape.
  private def litLong(args: Seq[Expression], i: Int, name: String): Long = {
    val e = args(i)
    require(e.foldable, s"argument '$name' must be an integer literal")
    e.eval() match {
      case n: java.lang.Byte => n.longValue()
      case n: java.lang.Short => n.longValue()
      case n: java.lang.Integer => n.longValue()
      case n: java.lang.Long => n.longValue()
      case other => throw new IllegalArgumentException(
        s"argument '$name' must be an integer literal, got $other")
    }
  }
}
