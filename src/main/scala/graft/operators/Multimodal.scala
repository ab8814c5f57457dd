package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.QueryDefs.Q
import graft.sources.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, processed by per-partition batch "decoders".
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB ([[FakeDecoder.decode]]); everything
  * Spark-side is real and load-bearing: the binary column, the typed
  * `Dataset` schema, the `mapPartitions` batch shape (one decoder
  * instance per partition, streaming iterator — exactly how a JNI/FFI
  * codec would be mounted), and the partitioning story (decode is
  * embarrassingly parallel; partition count = codec parallelism).
  */
object Multimodal {

  /** Typed row for decoded media metadata. */
  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
      frames: Int, feature: Array[Float])

  /** STUB decoder: stands in for an image/audio/video codec (none ships
    * in this container). Deterministic from the bytes so tests are
    * stable. A real deployment swaps only this object. */
  object FakeDecoder {
    def decode(docId: Long, bytes: Array[Byte]): MediaMeta = {
      val b0 = if (bytes.nonEmpty) bytes(0) & 0xFF else 0
      val b1 = if (bytes.length > 1) bytes(1) & 0xFF else 0
      MediaMeta(
        doc_id = docId,
        n_bytes = bytes.length,
        width = 64 + b0 % 192,
        height = 64 + b1 % 192,
        frames = 1 + bytes.length % 30,
        feature = Array.tabulate(8)(i =>
          (if (bytes.length > i) (bytes(i) & 0xFF) / 255.0f else 0.0f)))
    }
  }

  val defs: Map[String, Q] = Map(

    // Metadata over the binary column with built-in (codegen'd)
    // functions only — length and content digest. Oracle-checked:
    // sha256 of the same UTF-8 bytes agrees across engines.
    "q_multimodal_meta" -> ((s, d) => {
      Tables.documents(s, d).select(
        col("doc_id"),
        octet_length(col("text").cast("binary")).as("n_bytes"),
        sha2(col("text").cast("binary"), 256).as("digest"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"))
        .orderBy(col("doc_id"))
    }),

    // Batch decode via mapPartitions over a typed Dataset: the real
    // plumbing for a codec UDF (schema, encoder, per-partition batch
    // iteration). Decoder itself is the stub above → rows-only check.
    "q_multimodal_decode" -> ((s, d) => {
      import s.implicits._
      val blobs = Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("blob"))
        .as[(Long, Array[Byte])]
      blobs.mapPartitions { it =>
        // one decoder per partition; iterator stays lazy (no buffering)
        it.map { case (id, bytes) => FakeDecoder.decode(id, bytes) }
      }.toDF()
        .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
          col("frames"), element_at(col("feature"), 1).as("f0"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS n_bytes,
        |  SHA256(text) AS digest,
        |  ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)]
        |    AS modality
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
