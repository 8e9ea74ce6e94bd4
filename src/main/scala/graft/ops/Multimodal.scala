package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Multimodal-column plumbing: media payloads as opaque `binary` columns with
  * typed metadata, plus a decode/feature-extract seam.
  *
  * The real pipeline shape at 100 TB: payloads live in parquet binary
  * columns (or pointers to object storage), metadata is columnar and
  * filterable WITHOUT touching bytes, and the decode step is a per-partition
  * batch operation so codec state amortizes across rows. The image/audio
  * codecs are not in this container, so [[decodeStub]] substitutes a
  * deterministic fake — the Spark-side contract (schema, typed Dataset,
  * mapPartitions batching) is real and unit-tested.
  */
object Multimodal {

  /** A media row after "decode": payload retained, features extracted. */
  final case class MediaFeatures(
      doc_id: Long, payload_len: Int, width: Int, height: Int,
      features: Array[Double])

  /** Wrap documents as media rows: payload = utf-8 bytes standing in for
    * encoded media; metadata derived deterministically. Pure column ops —
    * metadata predicates push down without reading payloads. */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("n_chars") % 640 + 64).cast("int").as("width"),
      (col("doc_id") % 480 + 48).cast("int").as("height"),
      lit(3).as("channels"))

  /** Per-partition decode + feature extraction over the typed rows. In
    * production the `???`-shaped body would call the codec (decode bytes,
    * resize, frame-sample); here it derives a deterministic 4-dim feature
    * from the payload so tests can assert the plumbing. One iterator pass
    * per partition — codec init happens once per partition, not per row. */
  def decodeStub(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "payload", "width", "height")
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        // codec-init-per-partition seam (real decoder would be created here)
        rows.map { case (id, payload, w, h) =>
          val s = payload.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) & 0xffffffL)
          MediaFeatures(id, payload.length, w, h,
            Array(s % 997 / 997.0, w / 640.0, h / 480.0, payload.length / 4096.0))
        }
      }
  }

  // ---------------------------------------------------------------------------

  // Oracle-checkable slice of the plumbing: payload length, metadata, a
  // content checksum, and hash-derived features — all computable by DuckDB
  // on the same bytes. (The mapPartitions decode seam is covered by
  // MultimodalSpec instead; its features are engine-local by design.)
  val queries: Seq[Q] = Seq(
    Q("q30_multimodal_meta",
      (s, dir) => {
        def feat(i: Int) =
          ((conv(substring(md5(concat(col("text"), lit(s"|$i"))), 1, 15), 16, 10)
            .cast("long") % 1000).cast("double") / lit(1000.0)).as(s"f$i")
        Tables.documents(s, dir).select(
          col("doc_id"),
          length(encode(col("text"), "UTF-8")).cast("long").as("payload_len"),
          (col("n_chars") % 640 + 64).cast("int").as("width"),
          (col("doc_id") % 480 + 48).cast("int").as("height"),
          lit(3).as("channels"),
          md5(col("text")).as("checksum"),
          // frame-sampling plan for "video" payloads: every 12th frame of a
          // synthetic frame count — pure arithmetic, so the sample schedule
          // is columnar metadata, computable without decoding bytes.
          // CSV-joined: the driver's pandas comparator cannot hash array
          // cells (CORRECTNESS_r02); values are identical either way.
          array_join(
            sequence(lit(0L), (col("n_chars") % 240 + 23).cast("long"), lit(12L))
              .cast("array<string>"), ",")
            .as("frame_sample"),
          // resize plan: fit into a 224-box preserving aspect ratio — the
          // target geometry is metadata; the pixel work happens in the
          // per-partition decode seam.
          floor((col("n_chars") % 640 + 64).cast("double") * lit(224.0) /
            greatest((col("n_chars") % 640 + 64).cast("double"),
              (col("doc_id") % 480 + 48).cast("double"))).cast("int").as("resized_w"),
          floor((col("doc_id") % 480 + 48).cast("double") * lit(224.0) /
            greatest((col("n_chars") % 640 + 64).cast("double"),
              (col("doc_id") % 480 + 48).cast("double"))).cast("int").as("resized_h"),
          feat(0), feat(1), feat(2), feat(3))
          .orderBy("doc_id")
      },
      Some(s"""
SELECT doc_id,
  octet_length(encode(text))::BIGINT AS payload_len,
  CAST(n_chars % 640 + 64 AS INTEGER) AS width,
  CAST(doc_id % 480 + 48 AS INTEGER) AS height,
  3 AS channels,
  md5(text) AS checksum,
  array_to_string([i for i in range(0, CAST(n_chars % 240 + 24 AS INTEGER), 12)], ',') AS frame_sample,
  CAST(floor((n_chars % 640 + 64)::DOUBLE * 224.0
       / greatest((n_chars % 640 + 64)::DOUBLE, (doc_id % 480 + 48)::DOUBLE)) AS INTEGER) AS resized_w,
  CAST(floor((doc_id % 480 + 48)::DOUBLE * 224.0
       / greatest((n_chars % 640 + 64)::DOUBLE, (doc_id % 480 + 48)::DOUBLE)) AS INTEGER) AS resized_h,
  ${(0 until 4).map(i =>
        s"((('0x' || substr(md5(text || '|$i'), 1, 15))::BIGINT % 1000)::DOUBLE / 1000.0) AS f$i")
        .mkString(",\n  ")}
FROM documents ORDER BY doc_id""")))
}
