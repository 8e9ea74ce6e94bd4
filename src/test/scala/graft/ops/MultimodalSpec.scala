package graft.ops

import graft.SparkSpec

/** Multimodal plumbing: metadata derivation without touching payloads, and
  * the per-partition decode stub (schema + batching contract). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world", "en", "s1", 11L),
    (2L, "spark", "en", "s2", 5L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("asMedia: payload bytes + typed metadata columns") {
    val m = Multimodal.asMedia(docs).collect().sortBy(_.getLong(0))
    val r = m.head
    assert(r.getAs[Array[Byte]]("payload") === "hello world".getBytes("UTF-8"))
    assert(r.getAs[Int]("width") === (11 % 640 + 64))
    assert(r.getAs[Int]("height") === (1 % 480 + 48))
    assert(r.getAs[Int]("channels") === 3)
  }

  test("decodeStub: mapPartitions emits one typed feature row per input") {
    implicit val s = spark
    val feats = Multimodal.decodeStub(Multimodal.asMedia(docs))
      .collect().sortBy(_.doc_id)
    assert(feats.length === 2)
    assert(feats.head.payload_len === 11)
    assert(feats.head.features.length === 4)
    // deterministic: same input -> same features
    val again = Multimodal.decodeStub(Multimodal.asMedia(docs))
      .collect().sortBy(_.doc_id)
    assert(feats.head.features.toSeq === again.head.features.toSeq)
  }
}
