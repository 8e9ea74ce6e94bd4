package graft.ops

import java.nio.file.Files

import graft.SparkSpec

/** Layout.compact: many small files in, near-target files out, data
  * identical. */
class CompactSpec extends SparkSpec {
  import spark.implicits._

  test("compaction reduces file count and preserves every row") {
    val in = Files.createTempDirectory("graft_compact_in_").toString
    val out = Files.createTempDirectory("graft_compact_out_").toString
    val data = (1 to 1000).map(i => (i.toLong, s"doc_$i")).toDF("id", "text")
    data.repartition(50).write.mode("overwrite").parquet(in)

    val (nIn, nOut) = Layout.compact(spark, in, out, targetBytes = 1L << 20)
    assert(nIn === 50)
    assert(nOut === 1) // 50 tiny files ≪ 1 MiB target
    val roundTrip = spark.read.parquet(out)
    assert(roundTrip.count() === 1000)
    assert(roundTrip.exceptAll(data).isEmpty && data.exceptAll(roundTrip).isEmpty)
  }

  test("target bytes bounds the output file count from below") {
    val in = Files.createTempDirectory("graft_compact_in2_").toString
    val out = Files.createTempDirectory("graft_compact_out2_").toString
    (1 to 5000).map(i => (i.toLong, "x" * 100)).toDF("id", "text")
      .repartition(20).write.mode("overwrite").parquet(in)
    val bytes = Layout.compact(spark, in, out, targetBytes = 8 * 1024)
    assert(bytes._2 > 1) // small target → several output files
    assert(spark.read.parquet(out).count() === 5000)
  }
}
