package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes a larger scale factor from a driver-generated base dir, for
  * scaling-evidence bench runs (`SPARK_GRAFT_SF_DIR=<outDir>`): 10× sf0.1 ≈
  * sf1 without touching the read-only testdata.
  *
  * Per-table design (what a REAL 10× of this corpus would look like, within
  * the base schema's key-space constraints):
  *
  *   - `documents` / `embeddings` / `events`: true 10× — key stride 1e7 per
  *     copy, and copies are DECORRELATED so cross-copy rows are not
  *     near-duplicates (a naive replicate would hand every doc 9 planted
  *     twins and quadratically distort the dedup operators):
  *     documents get a per-copy source id (bucket cardinality grows with the
  *     corpus, bucket SIZE stays — the bucket-growth axis is measured
  *     separately in SCALE.md) plus a ~25% hash-keyed token perturbation
  *     (cross-copy trigram Jaccard ≈ 0.5 < every dedup threshold —
  *     statistically: a doc whose distinct tokens all dodge the 1-in-4
  *     perturbation stays a cross-copy dup with probability 0.75^distinct,
  *     a sub-1% low-entropy residual ScaleGenSpec bounds);
  *     embeddings get a per-(dim, copy) hash sign flip (norm-preserving,
  *     expected cross-copy cosine ≈ 0); events offset event/user ids into
  *     the same time window (10× traffic, constant window count).
  *   - `lineitem`: 10× by in-place replication. The SEC fact_id encoding
  *     ((orderkey*10+linenumber)*1e12 + …) leaves no Long headroom for key
  *     strides, and cik = orderkey % 37 pins company cardinality by design —
  *     so copies are exact duplicate rows: scans/aggs/windows/joins see a
  *     true 10× input with the realistic fixed-dimension shape (same groups,
  *     10× rows per group); latest-wins dedup outputs collapse to base size
  *     (documented with the scaling table).
  *   - `orders` + dimensions (`region nation customer part supplier`): 1× —
  *     filings derive from orders, and replicating both sides of the
  *     facts⋈filings equi-join would fabricate a 100× join output where a
  *     real 10× corpus produces 10×.
  */
object ScaleGen {
  val Stride = 10000000L

  def main(args: Array[String]): Unit = {
    val Array(baseDir, outDir, copiesStr) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, baseDir, outDir, copiesStr.toInt)
    spark.stop()
  }

  def run(spark: SparkSession, baseDir: String, outDir: String,
      copies: Int): Unit = {
    // events carries TIMESTAMP(NANOS) parquet: read the nanos as a plain
    // long and write that long back, so Tables.events' legacy-conf read +
    // div-1000 truncation works identically on the generated dir. The conf
    // is restored on exit — run() may execute on a caller-owned (shared)
    // session, and leaving the legacy flag set would make OTHER raw
    // nanos-parquet reads silently surface longs instead of failing loudly
    // (the exact corruption mode Tables.scala guards against).
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    val nanosPrev = spark.conf.getOption(nanosKey)
    spark.conf.set(nanosKey, "true")
    try runInner(spark, baseDir, outDir, copies)
    finally nanosPrev match {
      case Some(v) => spark.conf.set(nanosKey, v)
      case None => spark.conf.unset(nanosKey)
    }
  }

  private def runInner(spark: SparkSession, baseDir: String, outDir: String,
      copies: Int): Unit = {
    import spark.implicits._

    def base(t: String): DataFrame = spark.read.parquet(s"$baseDir/$t.parquet")
    def write(t: String, df: DataFrame, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    val copyDf = spark.range(copies).select(col("id").cast("int").as("copy"))
    def fanned(t: String): DataFrame = base(t).crossJoin(copyDf)
    val off: Column = col("copy").cast("long") * Stride

    // 1x: dims + orders (see scaladoc).
    for (t <- Seq("region", "nation", "customer", "part", "supplier", "orders"))
      write(t, base(t), 4)

    // 10x in-place replication.
    write("lineitem", fanned("lineitem").drop("copy"), 32)

    // events: 10x traffic in the same time window.
    write("events", fanned("events")
      .withColumn("event_id", col("event_id") + off)
      .withColumn("user_id", col("user_id") + off)
      .drop("copy"), 16)

    // documents: per-copy sources, hash-keyed token substitution. Keyed on
    // TOKEN IDENTITY (not position): near-dup cluster members inside a copy
    // share tokens, so they receive the same substitutions and stay
    // near-dups (pair output scales with the corpus); across copies the
    // substitution sets differ, dropping cross-copy Jaccard to ~0.4 — below
    // every dedup threshold.
    val perturbedText = array_join(
      transform(split(col("text"), " "),
        t => when(col("copy") > 0 &&
            pmod(hash(t, col("copy")), lit(4)) === 0,
          concat(t, lit("~"), col("copy").cast("string"))).otherwise(t)),
      " ")
    write("documents", fanned("documents")
      .withColumn("doc_id", col("doc_id") + off)
      .withColumn("source", when(col("copy") > 0,
        concat(col("source"), lit("-"), col("copy").cast("string")))
        .otherwise(col("source")))
      .withColumn("text", perturbedText)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("copy"), 16)

    // embeddings: norm-preserving per-(dim, copy) sign decorrelation.
    val flipped = zip_with(
      col("embedding"),
      sequence(lit(0), lit(graft.llm.Similarity.Dim - 1)),
      (x, d) => when(col("copy") > 0 && pmod(hash(d, col("copy")), lit(2)) === 0,
        -x).otherwise(x))
    write("embeddings", fanned("embeddings")
      .withColumn("vec_id", col("vec_id") + off)
      .withColumn("embedding", flipped.cast("array<float>"))
      .drop("copy"), 8)

    println(s"[scalegen] wrote ${copies}x of $baseDir to $outDir")
  }
}
