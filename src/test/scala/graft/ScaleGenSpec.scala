package graft

import org.apache.spark.sql.functions._

/** ScaleGen's generator invariants at 2x over sf0.001: fan-out honesty
  * (which tables scale, which stay), key disjointness, and — the part that
  * keeps the scaled bench meaningful — cross-copy DECORRELATION: replicas
  * must not read as near-duplicates to the dedup operators. */
class ScaleGenSpec extends SparkSpec {

  private lazy val out: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_sfgen").toString
    ScaleGen.run(spark, "/root/testdata/sf0.001", dir, 2)
    dir
  }

  test("fan-out: documents/embeddings/events 2x with disjoint key bands; orders/dims 1x") {
    val base = "/root/testdata/sf0.001"
    def n(t: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Long = t(spark, dir).count()
    assert(n(Tables.documents, out) === 2 * n(Tables.documents, base))
    assert(n(Tables.embeddings, out) === 2 * n(Tables.embeddings, base))
    assert(n(Tables.events, out) === 2 * n(Tables.events, base))
    assert(n(Tables.lineitem, out) === 2 * n(Tables.lineitem, base))
    assert(n(Tables.orders, out) === n(Tables.orders, base))
    assert(n(Tables.customer, out) === n(Tables.customer, base))
    val bands = Tables.documents(spark, out)
      .select((col("doc_id") / ScaleGen.Stride).cast("long").as("band"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(bands === Set(0L, 1L))
  }

  test("copies are decorrelated: cross-copy near-dups are a tiny residual, structure survives") {
    val docs = Tables.documents(spark, out)
    val pairs = graft.llm.Dedup.minhashNearDupPairs(docs, 0.8)
    val cross = pairs.filter((col("doc_id_a") < ScaleGen.Stride) =!=
      (col("doc_id_b") < ScaleGen.Stride)).count()
    // Decorrelation is statistical (P(no token perturbed) = 0.75^distinct),
    // so low-entropy docs leave a small residual — bound it, don't deny it.
    assert(cross <= docs.count() / 100,
      s"cross-copy near-dup residual too large: $cross")
    // within-copy planted near-dup structure SURVIVES in the replica band
    assert(pairs.filter(col("doc_id_a") >= ScaleGen.Stride).count() > 0L)
    // replica embeddings decorrelate: same base vector, sign-flipped copy
    val emb = Tables.embeddings(spark, out)
    val pair = emb.filter(col("vec_id").isin(5L, ScaleGen.Stride + 5L))
      .select(col("vec_id"), col("embedding"))
    val cos = pair.as("a").join(pair.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(graft.llm.Similarity.cosine(
        col("a.embedding"), col("b.embedding")).as("c"))
      .head.getDouble(0)
    assert(math.abs(cos) < 0.4, s"cross-copy cosine $cos not decorrelated")
  }
}
