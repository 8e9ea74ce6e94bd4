package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Q, Tables}
import graft.sec.{SecDerive, SecSql}

/** Data-quality profiling — the reference lists "add data quality checks" as
  * future work (README.md:166); at pipeline scale this is the nightly audit
  * pass. One aggregation over the table computes every column's null count
  * plus numeric/date ranges: a single shuffle to ONE row, partials do all
  * the work, so it costs one scan regardless of table size.
  */
object Quality {

  private val dec = DecimalType(38, 6)

  /** Per-column null counts + row count + selected min/max ranges. */
  def profileFacts(facts: DataFrame): DataFrame = {
    val nullCounts = facts.columns.toSeq.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    val aggs: Seq[Column] = nullCounts ++ Seq(
      countDistinct(col("cik")).as("n_ciks"),
      min(col("period_end")).as("min_period_end"),
      max(col("period_end")).as("max_period_end"),
      sum(col("value").cast(dec)).cast("double").as("sum_value"))
    facts.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Exact interpolated percentiles of a numeric column per group — the
    * correctness tier (full sort per group); approx_percentile is the
    * sketch path at scale, same shape. */
  def percentiles(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.groupBy(groupCol)
      .agg(
        percentile(col(valueCol), lit(0.5)).as("p50"),
        percentile(col(valueCol), lit(0.9)).as("p90"),
        percentile(col(valueCol), lit(0.99)).as("p99"),
        min(col(valueCol)).as("vmin"),
        max(col(valueCol)).as("vmax"))

  /** Exact rank-based quantile WITHOUT a global sort — the third tier of
    * the quantile family: q44 is exact-by-sort (buffers whole groups),
    * q87 is the mergeable approximate sketch, this is exact at the
    * sketch's cost shape. Two narrow passes: (1) a 1024-bin histogram of
    * the column (one tiny-key shuffle, map-side partials — the bin
    * arithmetic is [[Zorder.scaled]], monotonic in the value, so bin
    * order IS value order), whose cumulative counts locate the bin
    * holding rank ceil(q·n) EXACTLY (bin counts are exact integers);
    * then (2) a top-k pass over just that bin's rows (expected n/1024 of
    * the data; TakeOrdered, no global exchange). The histogram readback
    * is a bounded ≤1024-row catalog read — the probed-cell pattern.
    * Returns the smallest value with rank ≥ ceil(q·n) (the multiset
    * k-th smallest; tie-order-free, so both engines agree bit-exactly).
    * Assumes the in-bin rank fits an Int (expected band ≈ n/1024; a
    * heavier-tailed column wants more ScaleBits, not a new algorithm). */
  def exactQuantileBanded(df: DataFrame, v: Column, q: Double): Long = {
    require(q > 0.0 && q <= 1.0, s"quantile $q out of (0, 1]")
    val vals = df.select(v.cast("long").as("v")).where(col("v").isNotNull)
    val b = vals.agg(min("v").as("mn"), max("v").as("mx"),
      count(lit(1)).as("n")).collect().head // 3 scalars: bounded
    val n = b.getAs[Long]("n")
    require(n > 0, "quantile of an empty column")
    val (mn, mx) = (b.getAs[Long]("mn"), b.getAs[Long]("mx"))
    val r = math.ceil(q * n).toLong
    val binned = vals.withColumn("b",
      Zorder.scaled(col("v"), lit(mn), lit(mx)))
    val hist = binned.groupBy("b").agg(count(lit(1)).as("c"))
      .collect().map(x => (x.getAs[Long]("b"), x.getAs[Long]("c")))
      .sortBy(_._1) // ≤ 2^ScaleBits rows: bounded
    var cum = 0L
    var i = 0
    while (cum + hist(i)._2 < r) { cum += hist(i)._2; i += 1 }
    val tBin = hist(i)._1
    val k = (r - cum).toInt
    binned.where(col("b") === tBin)
      .orderBy("v").limit(k)
      .agg(max("v")).collect().head.getLong(0)
  }

  /** Per-GROUP banded exact quantile, entirely in-plan (no driver
    * readbacks — the grouped generalization of [[exactQuantileBanded]]):
    * per-group (min, max, rank) in one agg, bins via [[Zorder.scaled]],
    * a per-group cumulative window over the (groups × ≤1024)-row
    * histogram finds each group's rank-holding bin exactly, and one
    * row_number window over just the band rows (expected n/1024 per
    * group) reads off the in-bin k-th smallest. Group stats and bin
    * targets broadcast (groups-sized); the only data-sized exchanges are
    * the histogram's tiny-key shuffle and the band window. Returns one
    * (group, cutoff) row per group — the smallest value with rank ≥
    * ceil(q·n_g), tie-order-free. */
  def groupedQuantileBanded(df: DataFrame, groupCol: String, v: Column,
      q: Double): DataFrame = {
    require(q > 0.0 && q <= 1.0, s"quantile $q out of (0, 1]")
    val vals = df.select(col(groupCol).as("g"), v.cast("long").as("v"))
      .where(col("v").isNotNull)
    val stats = vals.groupBy("g").agg(min("v").as("mn"), max("v").as("mx"),
      ceil(lit(q) * count(lit(1))).cast("long").as("r"))
    val binned = vals.join(broadcast(stats), "g")
      .withColumn("b", Zorder.scaled(col("v"), col("mn"), col("mx")))
      .select("g", "v", "b", "r")
    val wcum = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("b")
    val tgt = binned.groupBy("g", "b").agg(count(lit(1)).as("c"),
        first("r").as("r"))
      .withColumn("cum", sum("c").over(wcum))
      .where(col("cum") >= col("r"))
      .withColumn("rn", row_number().over(wcum))
      .where(col("rn") === 1)
      .select(col("g"), col("b"), (col("r") - (col("cum") - col("c"))).as("k"))
    val wband = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("v")
    binned.join(broadcast(tgt), Seq("g", "b"))
      .withColumn("vrn", row_number().over(wband))
      .where(col("vrn") === col("k"))
      .select(col("g").as(groupCol), col("v").as("cutoff"))
  }

  /** Per-GROUP fixed-domain histogram — the grouped maintenance unit:
    * (g, b, c) rows, ≤ groups × 2^ScaleBits, shard partials merging by
    * integer addition exactly like [[histogramShard]]'s (bins stay
    * aligned because the domain is fixed, not data-derived). */
  def groupedHistogramShard(df: DataFrame, groupCol: String, v: Column,
      lo: Long, hi: Long): DataFrame =
    df.select(col(groupCol).as("g"), v.cast("long").as("v"))
      // NULL group values are excluded, matching [[groupedQuantileBanded]]
      // (whose group-stats equi-join silently drops them): keeping them
      // here would seed a bins entry whose band rows no equi-join can
      // ever match (NULL != NULL), making the read-off throw a false
      // stale-histogram error on perfectly fresh bins
      .where(col("v").isNotNull && col("g").isNotNull)
      .withColumn("b", Zorder.scaled(
        greatest(least(col("v"), lit(hi)), lit(lo)), lit(lo), lit(hi)))
      .groupBy("g", "b").agg(count(lit(1)).as("c"))

  /** Grouped twin of [[quantileFromBins]]: exact per-group rank cutoffs
    * from MAINTAINED per-group bins ([[groupedHistogramShard]] provenance
    * — a serving layer caches them driver-side, groups × ≤1024 rows) plus
    * ONE band data pass for ALL groups: the per-group bin walk resolves
    * (group, band bin, in-bin rank) on the driver, the targets broadcast,
    * and a row_number window over just the band rows (expected n_g/1024
    * per group) reads off each group's k-th smallest — the
    * [[groupedQuantileBanded]] plan shape with histogram provenance
    * swapped, and the same answer: BOTH are the ceil(q·n_g)-th smallest
    * per group (spec-pinned equal). Returns (groupCol, cutoff, n) rows.
    * Stale bins fail loudly ([[quantileFromBins]]'s law, grouped): a
    * group whose band holds fewer than k rows drops out of the window
    * output, and the caller-visible contract is the thrown
    * IllegalStateException, not a silently wrong cutoff. */
  def groupedQuantileFromBins(bins: Seq[(String, Long, Long)],
      corpus: DataFrame, groupCol: String, v: Column, q: Double,
      lo: Long, hi: Long): DataFrame = {
    require(bins.nonEmpty, "quantile of an empty grouped histogram")
    // defensive twin of the shard-side null-group exclusion: a null group
    // can never equi-join its band rows back, so a target for it would
    // always read as a (false) stale histogram
    val targets = bins.filter(_._1 != null).groupBy(_._1).toSeq
      .map { case (g, rows) =>
        val (tBin, k) = rankBin(rows.map(r => (r._2, r._3)), q)
        (g, tBin, k, rows.map(_._3).sum)
      }
    require(targets.nonEmpty, "quantile of an all-null-group histogram")
    val spark = corpus.sparkSession
    import spark.implicits._
    val tgt = broadcast(targets.toDF("g", "b", "k", "n"))
    val binned = corpus
      .select(col(groupCol).as("g"), v.cast("long").as("v"))
      .where(col("v").isNotNull)
      .withColumn("b", Zorder.scaled(
        greatest(least(col("v"), lit(hi)), lit(lo)), lit(lo), lit(hi)))
    val wband = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("v")
    val out = binned.join(tgt, Seq("g", "b"))
      .withColumn("vrn", row_number().over(wband))
      .where(col("vrn") === col("k"))
      .select(col("g").as(groupCol), col("v").as("cutoff"), col("n"))
      .collect() // groups-sized: bounded
    if (out.length != targets.length) {
      val missing = targets.map(_._1).toSet --
        out.map(_.getString(0)).toSet
      throw new IllegalStateException(
        s"stale grouped histogram: groups ${missing.mkString(", ")} hold " +
          "fewer band rows than their bins claim — the bins no longer " +
          "describe this corpus; recompute the histogram and retry")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toIndexedSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(groupCol,
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("cutoff",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** One shard's histogram partial over a FIXED [lo, hi] domain — (b, c)
    * rows. Fixed bounds (an ingest-contract domain, not data-derived)
    * keep every shard's bins ALIGNED, so shard partials merge by integer
    * addition, exactly — the streaming maintenance unit
    * ([[graft.streaming.StreamOps]] lands one per micro-batch). Values
    * outside the domain are clamped into the edge bins (still monotonic,
    * so the band algebra below stays sound). */
  def histogramShard(df: DataFrame, v: Column, lo: Long, hi: Long)
      : DataFrame =
    df.select(v.cast("long").as("v")).where(col("v").isNotNull)
      .withColumn("b", Zorder.scaled(
        greatest(least(col("v"), lit(hi)), lit(lo)), lit(lo), lit(hi)))
      .groupBy("b").agg(count(lit(1)).as("c"))

  /** Bin-wise SUBTRACTIVE takedown for a fixed-domain histogram mart —
    * the shard law run backwards: bins are aligned integer counts
    * (shards of one mart share [lo, hi] by the ANALYZE ... HISTOGRAM
    * DOMAIN contract, which is exactly what makes the removed rows'
    * shard subtract bin-for-bin), so subtract == rebuild over the
    * surviving rows (q196 pins it) at the cost of one pass over the
    * REMOVED rows. A bin driven NEGATIVE refuses loudly (the removed
    * frame was not part of the maintained histogram — the
    * CmsSubtract/subtractLmStats discipline); bins reaching zero drop
    * (absent bins read as zero in every fold and quantile walk). */
  def subtractHistogramShard(hist: DataFrame,
      removed: DataFrame): DataFrame = {
    val r = removed.select(col("b"), col("c").as("__rm"))
    hist.join(r, Seq("b"), "left")
      .select(col("b"),
        when(col("c") - coalesce(col("__rm"), lit(0L)) < 0L,
          raise_error(lit("histogram subtract underflow: the removed " +
            "rows were not part of the maintained histogram (or were " +
            "binned over a different domain) — rebuild instead of " +
            "subtracting")).cast("long"))
          .otherwise(col("c") - coalesce(col("__rm"), lit(0L))).as("c"))
      .filter(col("c") > 0L)
  }

  /** Exact rank-based quantile from a maintained histogram + one band
    * pass over the at-rest corpus: the histogram (streamed or batch —
    * the fold is exact, so it doesn't matter which) locates the
    * rank-holding bin from its integer cumulative counts; the corpus
    * pass touches only that bin's rows. Returns the same value as
    * [[exactQuantileBanded]] — both are THE ceil(q·n)-th smallest, just
    * computed against different histogram provenance. */
  def quantileFromHistogram(hist: DataFrame, corpus: DataFrame, v: Column,
      q: Double, lo: Long, hi: Long): Long =
    quantileFromBins(hist.collect() // ≤ 2^ScaleBits rows: bounded
        .map(r => (r.getAs[Long]("b"), r.getAs[Long]("c"))).toSeq,
      corpus, v, q, lo, hi)

  /** [[quantileFromHistogram]] over already-resolved (b, c) bins — the
    * face a serving layer with a driver-cached histogram calls. */
  def quantileFromBins(bins: Seq[(Long, Long)], corpus: DataFrame,
      v: Column, q: Double, lo: Long, hi: Long): Long = {
    val (tBin, k) = rankBin(bins, q)
    val band = corpus.select(v.cast("long").as("v")).where(col("v").isNotNull)
      .where(Zorder.scaled(
        greatest(least(col("v"), lit(hi)), lit(lo)), lit(lo), lit(hi))
        === tBin)
      .orderBy("v").limit(k)
      .agg(max("v").as("cutoff"), count(lit(1)).as("n_band"))
      .collect().head
    // Stale-histogram guard: the bins and `corpus` must describe the same
    // data. If the histogram drifted (a streamed maintenance gap, a table
    // rewrite under a driver-cached snapshot), the target band can hold
    // fewer than k rows — max over zero rows is a NULL that NPEd here, and
    // a short-but-nonempty band is a silently WRONG cutoff. Fail loudly
    // with the refresh instruction instead.
    if (band.isNullAt(0) || band.getLong(1) < k)
      throw new IllegalStateException(
        s"stale histogram: rank bin $tBin holds ${band.getLong(1)} rows, " +
          s"need $k — the bins no longer describe this corpus; recompute " +
          "the histogram (ANALYZE ... HISTOGRAM) and retry")
    band.getLong(0)
  }

  /** The bin walk: which aligned bin holds rank ceil(q·n), and the rank's
    * offset within it — exact, from integer cumulative counts. */
  def rankBin(bins: Seq[(Long, Long)], q: Double): (Long, Int) = {
    require(q > 0.0 && q <= 1.0, s"quantile $q out of (0, 1]")
    val sorted = bins.sortBy(_._1)
    val n = sorted.map(_._2).sum
    require(n > 0, "quantile of an empty histogram")
    val r = math.ceil(q * n).toLong
    var cum = 0L
    var i = 0
    while (cum + sorted(i)._2 < r) { cum += sorted(i)._2; i += 1 }
    // the in-bin rank feeds limit(k): a single bin holding > 2^31 rows at
    // the target rank would overflow to a negative k and silently
    // misbehave — fail loudly (the documented assumption, now checked);
    // the remedy is more bins (raise ScaleBits) over such a skewed column
    require(r - cum <= Int.MaxValue,
      s"in-bin rank ${r - cum} overflows Int in bin ${sorted(i)._1} — " +
        "the histogram is too coarse for this skew; raise ScaleBits")
    (sorted(i)._1, (r - cum).toInt)
  }

  /** Constraint-enforcing split — the dead-letter pattern every 100 TB
    * ingest needs: rows violating any named constraint route to a
    * QUARANTINE frame carrying the violated-constraint list; rows passing
    * all constraints route to the good frame. Nothing silently drops —
    * good + quarantine == input row-for-row (the conservation law,
    * property-pinned). SQL CHECK semantics (Delta constraints likewise):
    * a constraint is violated iff it evaluates FALSE — a NULL (unknown)
    * passes, so null checks are written explicitly (`isNotNull`). The
    * split is two filters over one shared scan: no shuffle, no join;
    * at scale each side writes in a single pass. */
  def enforceConstraints(df: DataFrame,
      constraints: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    require(constraints.nonEmpty, "no constraints given")
    val labeled = df.withColumn("violations", array_compact(array(
      constraints.map { case (name, c) =>
        when(c === false, lit(name)) }: _*)))
    (labeled.filter(size(col("violations")) === 0).drop("violations"),
      labeled.filter(size(col("violations")) > 0))
  }

  val queries: Seq[Q] = Seq(
    // Bin-wise SUBTRACTIVE takedown of a maintained histogram mart (the
    // delete tier for aligned-bin shards): subtract the victim rows' own
    // shard from the maintained histogram over the SAME domain, refuse
    // underflow. Oracle = the histogram REBUILT over the surviving rows —
    // the binning arithmetic (clamp + min/max scale) is generated from
    // the same Scala as the layout key (Zorder.scaledSql), so the two
    // spellings cannot drift.
    Q("q196_histogram_subtract",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val maintained = histogramShard(docs, col("n_chars"), 0L, 2000L)
        val removed = histogramShard(
          docs.filter(pmod(col("doc_id"), lit(23)) === 7),
          col("n_chars"), 0L, 2000L)
        subtractHistogramShard(maintained, removed).orderBy("b")
      },
      Some {
        val bin = Zorder.scaledSql(
          "greatest(least(CAST(n_chars AS BIGINT), 2000), 0)", "0", "2000")
        s"""SELECT $bin AS b, CAST(count(*) AS BIGINT) AS c
FROM documents WHERE doc_id % 23 <> 7
GROUP BY 1 ORDER BY b"""
      }),

    // The banded exact quantile, applied: the exact P90 n_chars cutoff
    // (length thresholds are a standard curation signal) computed WITHOUT
    // a global sort, then the per-source keep counts at/above it. The
    // oracle computes the same rank-based cutoff by brute row_number —
    // one ground truth, two cost shapes; any banding error (wrong bin,
    // wrong in-bin rank, a tie mishandled) flips the cutoff and every
    // count with it.
    Q("q180_quantile_banded_cutoff",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val cut = exactQuantileBanded(docs, col("n_chars"), 0.9)
        docs.where(col("n_chars") >= cut)
          .groupBy("source")
          .agg(count(lit(1)).as("n_kept"))
          .select(col("source"), lit(cut).as("cutoff"), col("n_kept"))
          .orderBy("source")
      },
      Some("""
WITH ranked AS (
  SELECT CAST(n_chars AS BIGINT) AS v,
         row_number() OVER (ORDER BY n_chars) AS rn,
         count(*) OVER () AS n
  FROM documents),
c AS (SELECT v AS cutoff FROM ranked
      WHERE rn = CAST(ceil(0.9 * n) AS BIGINT))
SELECT source, cutoff, count(*) AS n_kept
FROM documents, c
WHERE n_chars >= cutoff
GROUP BY source, cutoff
ORDER BY source""")),

    // The quarantine report: per-constraint violation counts (zero rows
    // kept via the seeded left join — a silent disappearance must read as
    // 0, not absence) plus the conservation audit every row carries. The
    // 'n_chars_matches' constraint holds on this corpus by construction —
    // its 0 row proves seeding; the other two genuinely split the table.
    Q("q183_constraint_quarantine",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.documents(s, dir)
        val constraints = Seq(
          ("lang_latin", col("lang").isin("en", "fr", "es", "de")),
          ("n_chars_matches", col("n_chars") === length(col("text"))),
          ("text_min_100", length(col("text")) >= 100))
        val (good, bad) = enforceConstraints(docs, constraints)
        val summary = good.agg(count(lit(1)).as("n_good"))
          .crossJoin(bad.agg(count(lit(1)).as("n_quarantined")))
          .crossJoin(docs.agg(count(lit(1)).as("__n")))
          .select(col("n_good"), col("n_quarantined"),
            (col("n_good") + col("n_quarantined") === col("__n"))
              .as("conserved"))
        val violCounts = bad
          .select(explode(col("violations")).as("constraint_name"))
          .groupBy("constraint_name").agg(count(lit(1)).as("n_violations"))
        constraints.map(_._1).toDF("constraint_name")
          .join(violCounts, Seq("constraint_name"), "left")
          .na.fill(0L, Seq("n_violations"))
          .crossJoin(broadcast(summary))
          .orderBy("constraint_name")
      },
      Some("""
WITH f AS (SELECT
    CASE WHEN (lang IN ('en','fr','es','de')) = false THEN 1 ELSE 0 END AS v1,
    CASE WHEN (n_chars = length(text)) = false THEN 1 ELSE 0 END AS v2,
    CASE WHEN (length(text) >= 100) = false THEN 1 ELSE 0 END AS v3
  FROM documents),
s AS (SELECT CAST(sum(CASE WHEN v1 + v2 + v3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
             CAST(sum(CASE WHEN v1 + v2 + v3 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
             CAST(count(*) AS BIGINT) AS n FROM f),
c(constraint_name, n_violations) AS (
  SELECT 'lang_latin', CAST(sum(v1) AS BIGINT) FROM f
  UNION ALL SELECT 'n_chars_matches', CAST(sum(v2) AS BIGINT) FROM f
  UNION ALL SELECT 'text_min_100', CAST(sum(v3) AS BIGINT) FROM f)
SELECT constraint_name, n_violations, n_good, n_quarantined,
  (n_good + n_quarantined = n) AS conserved
FROM c, s ORDER BY constraint_name""")),

    // The grouped tier applied: exact per-language median document length,
    // no global (or even per-group) sort — the cutoff table a per-lang
    // length filter consumes. Oracle: brute per-group row_number rank.
    Q("q181_quantile_banded_by_group",
      (s, dir) => groupedQuantileBanded(
          Tables.documents(s, dir), "lang", col("n_chars"), 0.5)
        .orderBy("lang"),
      Some("""
WITH ranked AS (
  SELECT lang, CAST(n_chars AS BIGINT) AS v,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents)
SELECT lang, v AS cutoff FROM ranked
WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)
ORDER BY lang""")),

    Q("q45_dq_profile",
      (s, dir) => profileFacts(SecDerive.facts(s, dir)),
      Some(s"""${SecSql.basePrelude}
SELECT count(*) AS n_rows,
  ${Seq("fact_id", "cik", "taxonomy", "tag", "unit", "period_start",
          "period_end", "value", "filing_accession_no", "form", "filed", "frame")
        .map(c => s"CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_$c")
        .mkString(",\n  ")},
  count(DISTINCT cik) AS n_ciks,
  min(period_end) AS min_period_end,
  max(period_end) AS max_period_end,
  CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
FROM facts""")),

    Q("q44_percentiles",
      (s, dir) => percentiles(Tables.events(s, dir), "event_type", "value")
        .orderBy("event_type"),
      Some("""
SELECT event_type,
  quantile_cont(value, 0.5) AS p50,
  quantile_cont(value, 0.9) AS p90,
  quantile_cont(value, 0.99) AS p99,
  min(value) AS vmin,
  max(value) AS vmax
FROM events GROUP BY event_type ORDER BY event_type""")),

    // Mergeable-sketch quantiles with a self-auditing gate (the q37
    // exact+tolerance pattern): the deterministic KLL sketch estimates
    // per-flag price quartiles, then the query checks each estimate's TRUE
    // rank window against the 5% bound and emits only the booleans — the
    // oracle is the all-true constant, so any bound violation (or any
    // nondeterminism in the sketch) reds the gate. The sketch is the
    // 100 TB path: exact percentile (q44) buffers whole groups; this ships
    // O(k log n) doubles per group map-side.
    Q("q87_sketch_quantiles",
      (s, dir) => {
        val eps = 0.05
        val ps = Seq(0.25, 0.5, 0.75)
        val li = Tables.lineitem(s, dir)
          .select(col("l_returnflag").as("flag"),
            col("l_extendedprice").cast("double").as("x"))
        val est = li.groupBy("flag")
          .agg(graft.expr.QuantileSketch(col("x"), ps, 512).as("ests"))
          .select(col("flag"), posexplode(col("ests")).as(Seq("pi", "est")))
          .withColumn("p", element_at(array(ps.map(lit): _*), col("pi") + 1))
        li.join(broadcast(est), Seq("flag"))
          .groupBy("flag", "p", "est")
          .agg(count(lit(1)).as("n"),
            sum(when(col("x") < col("est"), 1L).otherwise(0L)).as("lt"),
            sum(when(col("x") <= col("est"), 1L).otherwise(0L)).as("le"))
          .select(col("flag"), col("p"),
            ((col("lt").cast("double") / col("n").cast("double") - lit(eps) <= col("p")) &&
              (col("p") <= col("le").cast("double") / col("n").cast("double") + lit(eps)))
              .as("within_bound"))
          .orderBy("flag", "p")
      },
      Some("""
WITH flags AS (SELECT DISTINCT l_returnflag AS flag FROM lineitem)
SELECT flag, g.p AS p, TRUE AS within_bound
FROM flags, unnest([0.25::DOUBLE, 0.5::DOUBLE, 0.75::DOUBLE]) g(p)
ORDER BY flag, p""")),

    // The rank-function family (ntile / percent_rank / cume_dist) as a
    // score-calibration pass: decile + distributional position of every doc
    // by size. The order (n_chars, doc_id) is TOTAL, so all three functions
    // are deterministic; one shuffle on lang, one sort serves all three.
    Q("q62_rank_family",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy(col("n_chars").asc, col("doc_id").asc)
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("n_chars"),
            ntile(10).over(w).cast("long").as("decile"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume"))
          .orderBy("doc_id")
      },
      Some("""
SELECT doc_id, lang, n_chars,
  CAST(ntile(10) OVER w AS BIGINT) AS decile,
  percent_rank() OVER w AS pct_rank,
  cume_dist() OVER w AS cume
FROM documents
WINDOW w AS (PARTITION BY lang ORDER BY n_chars ASC, doc_id ASC)
ORDER BY doc_id""")),

    // Set operators INTERSECT / EXCEPT (distinct set semantics on both
    // engines): quality-passing docs that are ALSO near-dup cluster members
    // (intersect), and quality-passing docs that are NOT (except) — the
    // set-algebra spelling of corpus slicing. Both plan as aggregations
    // over one shuffle; at scale they co-partition with any doc_id layout.
    Q("q63_set_ops",
      (s, dir) => {
        val quality = graft.llm.TextAnalysis
          .qualityFilter(Tables.documents(s, dir)).select("doc_id")
        // cluster membership from the stored label mart (q48 is the honest
        // timed build; q90's convention) — this query's subject is the set
        // algebra, and re-running minhash+CC live cost it ~15 jobs (r20)
        val clustered = graft.llm.LlmQueries.nearDupClusterMembers(s, dir)
        quality.intersect(clustered).withColumn("in_cluster", lit(true))
          .unionByName(
            quality.except(clustered).withColumn("in_cluster", lit(false)))
          .orderBy("doc_id")
      },
      Some(s"""
WITH RECURSIVE ${graft.llm.LlmQueries.minhashCtesShared},
pairs AS (SELECT doc_id_a, doc_id_b FROM j WHERE jaccard >= 0.8),
edges AS (SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
          UNION SELECT doc_id_b, doc_id_a FROM pairs),
clustered AS (SELECT DISTINCT src AS doc_id FROM edges),
${graft.llm.LlmQueries.qualityCtesShared},
quality AS (SELECT doc_id FROM st WHERE ${graft.llm.LlmQueries.qualityPredShared})
SELECT doc_id, TRUE AS in_cluster FROM
  (SELECT doc_id FROM quality INTERSECT SELECT doc_id FROM clustered)
UNION ALL
SELECT doc_id, FALSE AS in_cluster FROM
  (SELECT doc_id FROM quality EXCEPT SELECT doc_id FROM clustered)
ORDER BY doc_id""")),

    // Per-company outlier flags: z-score of each year's ROE against the
    // company's own history — the anomaly screen an analyst runs over the
    // mart ("which year is out of line for THIS company"). Exact integer
    // moments over an unbounded per-cik window (the q71 recipe at window
    // shape): micro-quantized roe, long sums, one float block at the end in
    // a pinned association order. sqrt is IEEE-correctly-rounded (unlike
    // ln), so no quantization is needed on the output. Degenerate histories
    // (n < 3 or zero variance) are excluded rather than emitting inf/NaN.
    Q("q76_outlier_flags",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("cik")
        val nD = col("n").cast("double")
        val sD = col("s").cast("double")
        val ssD = col("ss").cast("double")
        val qD = col("q").cast("double")
        val varNum = ssD - sD * sD / nD
        val z = (qD - sD / nD) / sqrt(varNum / (nD - lit(1.0)))
        SecDerive.ratiosV3(s, dir)
          .filter(col("roe").isNotNull)
          .select(col("cik"), col("fiscal_year"),
            floor(col("roe") * 1000000 + 0.5).cast("long").as("q"))
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("s", sum(col("q")).over(w))
          // q² through DECIMAL(38,0): long·long wraps/throws past int64
          // (|roe| ≳ 30 over a 10⁴-row history ≈ 1e19 > Long.Max) — cast
          // BEFORE the multiply so the product itself can't overflow
          .withColumn("ss",
            sum(col("q").cast(org.apache.spark.sql.types.DecimalType(38, 0))
              * col("q")).over(w))
          .filter(col("n") >= 3 && varNum > 0)
          .select(col("cik"), col("fiscal_year"), z.as("z"),
            (abs(z) > 2.0).cast("int").as("is_outlier"))
          .orderBy("cik", "fiscal_year")
      },
      Some(s"""${SecSql.fullPrelude},
r AS (SELECT cik, fiscal_year,
        CAST(floor(roe*1000000 + 0.5) AS BIGINT) AS q
      FROM ratios WHERE roe IS NOT NULL),
m AS (SELECT cik, fiscal_year, q,
        CAST(count(*) OVER w AS BIGINT) AS n,
        CAST(sum(q) OVER w AS BIGINT) AS s,
        sum(CAST(q AS HUGEINT)*q) OVER w AS ss
      FROM r WINDOW w AS (PARTITION BY cik)),
z AS (SELECT cik, fiscal_year,
        (CAST(q AS DOUBLE) - CAST(s AS DOUBLE)/CAST(n AS DOUBLE))
          / sqrt((CAST(ss AS DOUBLE)
                    - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1.0)) AS z
      FROM m
      WHERE n >= 3
        AND (CAST(ss AS DOUBLE)
               - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/CAST(n AS DOUBLE)) > 0)
SELECT cik, fiscal_year, z, CAST(abs(z) > 2.0 AS INT) AS is_outlier
FROM z ORDER BY cik, fiscal_year""")),

    // Typed Aggregator surface (expr.VarMoments): per-group sample variance
    // from exact integer moments through the Dataset API
    // (groupByKey().agg(toColumn)) — merge-order-insensitive by
    // construction; the oracle mirrors the finish formula literally.
    Q("q71_typed_variance",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .select(col("l_returnflag"),
            floor(col("l_quantity") * 1000 + 0.5).cast("long").as("q"))
          .as[(String, Long)]
          .groupByKey(_._1)
          .mapValues(_._2)
          .agg(graft.expr.VarMoments.toColumn)
          .map { case (k, (n, mean, v)) => (k, n, mean, v) }
          .toDF("l_returnflag", "n_rows", "mean_qty", "var_qty")
          .orderBy("l_returnflag")
      },
      Some("""
WITH q AS (SELECT l_returnflag,
                  CAST(floor(l_quantity*1000 + 0.5) AS BIGINT) AS q
           FROM lineitem),
m AS (SELECT l_returnflag, count(*) AS n,
             CAST(sum(q) AS BIGINT) AS sq,
             CAST(sum(q*q) AS BIGINT) AS sqq
      FROM q GROUP BY l_returnflag)
SELECT l_returnflag, n AS n_rows,
       CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) / 1000.0 AS mean_qty,
       (CAST(sqq AS DOUBLE)
          - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(n AS DOUBLE))
         / (CAST(n AS DOUBLE) - 1.0) / 1000000.0 AS var_qty
FROM m ORDER BY l_returnflag""")))
}
