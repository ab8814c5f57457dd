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

    // Raw-media ingest via the binaryFile source — the step BEFORE every
    // other multimodal query: media sitting as loose files becomes a
    // (path, length, content) DataFrame, ids recovered from filenames,
    // content digested in the scan stage. The landing zone is
    // materialized driver-side from 50 fixture docs (bounded, setup-only
    // — at scale the raw files already exist and the operator under
    // test is the DISTRIBUTED binaryFile scan, which plans one task per
    // file exactly like the reference's per-file fan-out).
    "q_source_binaryfile" -> ((s, d) => {
      val dir = new java.io.File(
        s"${sys.props("java.io.tmpdir")}/graft_blobs_${d.replaceAll("[^0-9a-zA-Z]", "_")}")
      // recreate the landing zone from scratch: stale blob_*.bin from an
      // older run (or an older fixture generation with different doc_ids)
      // would match the glob below and silently corrupt the result
      if (dir.exists()) dir.listFiles().foreach(_.delete())
      dir.mkdirs()
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .where(col("doc_id") < 50)
        .collect() // 50 rows: fixture landing-zone setup, not a query path
        .foreach { r =>
          java.nio.file.Files.write(
            dir.toPath.resolve(s"blob_${r.getLong(0)}.bin"),
            r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      // directory load + pathGlobFilter, not a glob IN the path: glob
      // paths take Spark's globPath resolution, which logs a spurious
      // FileNotFoundException stack through the lazy-analysis machinery
      // on every run (the query still succeeds — pure stderr noise)
      s.read.format("binaryFile").option("pathGlobFilter", "*.bin")
        .load(dir.toString)
        .select(
          regexp_extract(col("path"), "blob_(\\d+)\\.bin", 1)
            .cast("long").as("doc_id"),
          col("length").as("n_bytes"),
          sha2(col("content"), 256).as("digest"))
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
    }),

    // Full media pipeline: decode (mapPartitions stub) → frame-sample
    // (sequence+explode: at most 4 frames per doc, stride ⌈frames/4⌉) →
    // per-frame feature extract (a byte probe into the source blob) →
    // per-doc aggregate. The shape is the point: decode runs once per
    // blob, the generator fans out ONLY the sampled frame ids (never the
    // media bytes), and the per-frame probe joins the blob back by id —
    // at 100 TB the frames table is thousands of times smaller than the
    // media column it indexes. The stub arithmetic is deterministic from
    // the bytes, so a recursive-CTE oracle reproduces it exactly.
    "q_multimodal_frames" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val decoded = docs
        .select(col("doc_id"), col("text").cast("binary").as("blob"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, b) => FakeDecoder.decode(id, b) })
        .toDF()
      val frames = decoded
        .select(col("doc_id"), col("frames"),
          greatest(lit(1), floor(col("frames") / 4).cast("int")).as("stride"))
        .select(col("doc_id"), col("frames"),
          explode(sequence(lit(0), col("frames") - 1, col("stride")))
            .as("idx"))
      frames.join(docs, "doc_id")
        .select(col("doc_id"), col("frames"),
          ascii(col("text").substr(
            (col("idx") % length(col("text"))).cast("int") + 1, lit(1)))
            .as("v"))
        .groupBy(col("doc_id"), col("frames"))
        .agg(count(lit(1)).as("n_sampled"), sum(col("v")).as("frame_val_sum"))
        .orderBy(col("doc_id"))
    }),

    // Media-store dedup BEFORE decode: group blobs by content digest,
    // keep the smallest doc_id per distinct blob. The media pipeline's
    // first and cheapest win — a duplicate blob costs decode + feature
    // extraction every time it slips through. Scale shape: the digest is
    // computed in the scan stage (codegen'd sha2 over the binary column),
    // and only (digest, doc_id, n_bytes) triples shuffle — media bytes
    // NEVER leave their scan partition.
    "q_multimodal_dedup" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("blob"))
        .select(col("doc_id"), sha2(col("blob"), 256).as("digest"),
          octet_length(col("blob")).as("n_bytes"))
        .groupBy(col("digest"))
        .agg(min(col("doc_id")).as("keep_id"),
          count(lit(1)).as("n_copies"),
          sum(col("n_bytes").cast("long")).as("bytes_total"))
        .select(col("keep_id"), col("n_copies"), col("bytes_total"),
          col("digest"))
        .orderBy(col("keep_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    // Replays the FakeDecoder arithmetic (all derived from the UTF-8
    // bytes; fixture text is ASCII so ORD(SUBSTRING) = byte value, the
    // same equivalence the green q_multimodal_frames oracle relies on).
    // f0 is genuine float32: DuckDB FLOAT/FLOAT division is IEEE single,
    // bit-identical to the stub's `(b0 & 0xFF) / 255.0f` (verified).
    "q_multimodal_decode" ->
      """WITH m AS (
        |  SELECT doc_id, text, OCTET_LENGTH(ENCODE(text)) AS nb,
        |    CASE WHEN OCTET_LENGTH(ENCODE(text)) > 0
        |         THEN ORD(SUBSTRING(text, 1, 1)) ELSE 0 END AS b0,
        |    CASE WHEN OCTET_LENGTH(ENCODE(text)) > 1
        |         THEN ORD(SUBSTRING(text, 2, 1)) ELSE 0 END AS b1
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(nb AS INT) AS n_bytes,
        |  CAST(64 + b0 % 192 AS INT) AS width,
        |  CAST(64 + b1 % 192 AS INT) AS height,
        |  CAST(1 + nb % 30 AS INT) AS frames,
        |  CAST(b0 AS FLOAT) / CAST(255 AS FLOAT) AS f0
        |FROM m ORDER BY doc_id""".stripMargin,

    "q_multimodal_dedup" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies,
        |  CAST(SUM(OCTET_LENGTH(ENCODE(text))) AS BIGINT) AS bytes_total,
        |  SHA256(text) AS digest
        |FROM documents
        |GROUP BY SHA256(text) ORDER BY keep_id""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS n_bytes,
        |  SHA256(text) AS digest,
        |  ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)]
        |    AS modality
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_source_binaryfile" ->
      """SELECT doc_id,
        |  CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
        |  SHA256(text) AS digest
        |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin,

    // Reproduces the stub decode arithmetic (frames = 1 + n_bytes % 30)
    // and the stride-sampling loop as a recursive CTE — DuckDB 1.x can't
    // take per-row bounds in generate_series, recursion can.
    "q_multimodal_frames" ->
      """WITH m AS (
        |  SELECT doc_id, text, OCTET_LENGTH(ENCODE(text)) AS nb,
        |         1 + OCTET_LENGTH(ENCODE(text)) % 30 AS frames
        |  FROM documents),
        |s0 AS (SELECT doc_id, frames,
        |         GREATEST(1, CAST(frames // 4 AS INT)) AS stride
        |       FROM m),
        |fr AS (
        |  WITH RECURSIVE r(doc_id, frames, stride, idx) AS (
        |    SELECT doc_id, frames, stride, 0 FROM s0
        |    UNION ALL
        |    SELECT doc_id, frames, stride, idx + stride FROM r
        |    WHERE idx + stride <= frames - 1)
        |  SELECT doc_id, frames, idx FROM r),
        |v AS (
        |  SELECT f.doc_id, f.frames,
        |    ORD(SUBSTRING(m.text, CAST(f.idx % m.nb AS INT) + 1, 1)) AS val
        |  FROM fr f JOIN m USING (doc_id))
        |SELECT doc_id, frames, COUNT(*) AS n_sampled,
        |       CAST(SUM(val) AS BIGINT) AS frame_val_sum
        |FROM v GROUP BY doc_id, frames ORDER BY doc_id""".stripMargin
  )
}
