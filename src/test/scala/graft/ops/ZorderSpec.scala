package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout: bit-exact interleave kernel, scaling endpoints, and the
  * end-to-end layout gate (content preserved; both dimensions prunable
  * under z-order while the single-dim baseline is blind off its key). */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue matches the local bit-twiddling reference") {
    val rng = new scala.util.Random(7)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1023L, 1023L),
      ((1L << 21) - 1, (1L << 21) - 1)) ++
      Seq.fill(50)((rng.nextLong(1L << 21), rng.nextLong(1L << 21)))
    val got = cases.toDF("x", "y")
      .select(Zorder.zvalue(col("x"), col("y")).as("z"))
      .as[Long].collect()
    assert(got.toSeq === cases.map { case (x, y) => Zorder.zvalueLocal(x, y) })
    // bit 0 of x lands at position 0, bit 0 of y at position 1
    assert(Zorder.zvalueLocal(1L, 0L) === 1L)
    assert(Zorder.zvalueLocal(0L, 1L) === 2L)
    assert(Zorder.zvalueLocal(3L, 3L) === 15L)
  }

  test("scaling maps the value range onto [0, 2^ScaleBits) inclusively") {
    val cells = 1L << Zorder.ScaleBits
    val got = Seq((5L, 5L, 905L), (905L, 5L, 905L), (455L, 5L, 905L))
      .toDF("v", "mn", "mx")
      .select(Zorder.scaled(col("v"), col("mn"), col("mx")).as("s"))
      .as[Long].collect()
    assert(got(0) === 0L)                      // min → first cell
    assert(got(1) === 900L * cells / 901L)     // max → top occupied cell...
    assert(got(1) < cells)                     // ...and never overflows
    assert(got(2) === (455L - 5L) * cells / 901L)
  }

  test("envelope-pruned read == full-scan filter; scan opens only " +
      "envelope-intersecting files") {
    val tmp = java.nio.file.Files.createTempDirectory("zorder_prune_").toString
    val df = (0 until 2000)
      .map(i => (i.toLong, (i * 37 % 1000).toLong, (i * 91 % 800).toLong))
      .toDF("id", "x", "y")
    Zorder.writeZordered(df, s"$tmp/z", col("x"), col("y"), nFiles = 16)
    Zorder.writeFileEnvelopes(spark, s"$tmp/z", s"$tmp/env", col("x"), col("y"))
    val (rows, scanned, total) = Zorder.envelopePrunedRead(spark, s"$tmp/z",
      s"$tmp/env", col("x"), col("y"), 450L, 550L, 360L, 440L)
    // exactness: pruned read is row-for-row the full filter
    val full = df.where(col("x").between(450, 550) && col("y").between(360, 440))
    assert(rows.select("id").as[Long].collect().sorted.toSeq ===
      full.select("id").as[Long].collect().sorted.toSeq)
    // the central box must prune (q154 pins ≤ 0.5 for the 10% box) and the
    // scan may touch ONLY files the envelope mart admitted
    assert(scanned < total, s"no pruning: $scanned/$total files")
    assert(total === 16)
    val opened = rows.select(input_file_name()).distinct().as[String].collect()
    assert(opened.length <= scanned)
    // empty-intersection box short-circuits to zero rows, zero files
    val (none, s0, _) = Zorder.envelopePrunedRead(spark, s"$tmp/z",
      s"$tmp/env", col("x"), col("y"), 5000L, 6000L, 0L, 10000L)
    assert(s0 === 0 && none.count() === 0L)
    // a file whose dimension is ENTIRELY null has a null envelope — it is
    // soundly prunable (null never matches a between), not an NPE
    val withNulls = df.select(col("id"),
        when(col("id") < 1000, col("x")).as("x"), col("y"))
    withNulls.where(col("id") >= 1000).coalesce(1)
      .write.parquet(s"$tmp/z2") // one all-null-x file
    withNulls.where(col("id") < 1000).coalesce(1)
      .write.mode("append").parquet(s"$tmp/z2")
    Zorder.writeFileEnvelopes(spark, s"$tmp/z2", s"$tmp/env2",
      col("x"), col("y"))
    val (rows2, s2, t2) = Zorder.envelopePrunedRead(spark, s"$tmp/z2",
      s"$tmp/env2", col("x"), col("y"), 0L, 1000L, 0L, 1000L)
    assert(t2 === 2 && s2 === 1)
    assert(rows2.select("id").as[Long].collect().sorted.toSeq ===
      withNulls.where(col("x").between(0, 1000) && col("y").between(0, 1000))
        .select("id").as[Long].collect().sorted.toSeq)
  }

  test("distributed envelope prune == driver tier: same files, same rows, " +
      "nulls and empty boxes included") {
    // many-file layout: 64 files so the mart prune has real work, and an
    // all-null-x file so the Column-semantics null handling is exercised
    val tmp = java.nio.file.Files.createTempDirectory("zorder_dist_").toString
    val df = (0 until 4000)
      .map(i => (i.toLong, (i * 37 % 1000).toLong, (i * 91 % 800).toLong))
      .toDF("id", "x", "y")
    Zorder.writeZordered(df, s"$tmp/z", col("x"), col("y"), nFiles = 63)
    (0 until 30).map(i => (100000L + i, null.asInstanceOf[java.lang.Long],
        (i % 800).toLong))
      .toDF("id", "x", "y")
      .coalesce(1).write.mode("append").parquet(s"$tmp/z") // 64th: null-x
    Zorder.writeFileEnvelopes(spark, s"$tmp/z", s"$tmp/env",
      col("x"), col("y"))
    def run(f: (org.apache.spark.sql.SparkSession, String, String,
        org.apache.spark.sql.Column, org.apache.spark.sql.Column,
        Long, Long, Long, Long) => (org.apache.spark.sql.DataFrame, Int, Int),
        box: (Long, Long, Long, Long)): (Seq[Long], Int, Int) = {
      val (rows, s, t) = f(spark, s"$tmp/z", s"$tmp/env",
        col("x"), col("y"), box._1, box._2, box._3, box._4)
      (rows.select("id").as[Long].collect().sorted.toSeq, s, t)
    }
    for (box <- Seq((450L, 550L, 360L, 440L), // central box
                    (5000L, 6000L, 0L, 10000L), // empty intersection
                    (0L, 1000L, 0L, 800L))) { // everything non-null
      val driver = run(Zorder.envelopePrunedRead, box)
      val dist = run(Zorder.envelopePrunedReadDist, box)
      assert(dist === driver, s"tiers diverged on box $box")
    }
    // and the central box actually pruned on this 64-file layout
    val (_, scanned, total) = Zorder.envelopePrunedReadDist(spark, s"$tmp/z",
      s"$tmp/env", col("x"), col("y"), 450L, 550L, 360L, 440L)
    assert(total === 64 && scanned < total,
      s"no pruning on the many-file layout: $scanned/$total")
  }

  test("the layout gate holds end-to-end: content preserved, both dims prunable") {
    val row = graft.SparkEntry.queries("q154_zorder_layout_gate")(
      spark, "/root/testdata/sf0.001").collect().head
    assert(row.getBoolean(0), "content not preserved by the rewrite")
    assert(row.getBoolean(1), "z-order failed to prune the 2-D box")
    assert(row.getBoolean(2), "z-order not better than range layout on the y-band")
    assert(row.getBoolean(3), "x-range baseline unexpectedly pruned the y-band")
  }
}
