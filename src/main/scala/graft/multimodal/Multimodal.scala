package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted via a typed `mapPartitions` pass.
  *
  * No image/audio libraries exist in this environment, so `decodeStub`
  * below is a clearly-marked deterministic stand-in for the real decoder —
  * but everything around it is the real 100 TB-shape pipeline:
  *  - payloads travel as `BinaryType` columns (never strings — no charset
  *    corruption, no 4x base64 blowup);
  *  - metadata rides a typed struct next to the payload;
  *  - decode runs once per row inside `mapPartitions`, so a real decoder
  *    (JNI image lib, ffmpeg pipe, ...) amortizes its per-batch init cost
  *    and the work is embarrassingly parallel across executors;
  *  - downstream of decode, features are plain columns again — Catalyst
  *    optimizes the rest of the plan normally.
  *
  * The fixture payload is the document text encoded as UTF-8 bytes, so the
  * DuckDB oracle can recompute the stub features from the text (fixture
  * text is pure ASCII: byte values == char codes) — making even this
  * binary path hash-checked.
  */
object Multimodal {

  /** Input row: payload + metadata (what a real image/audio table looks
    * like: (id, bytes, meta...)). */
  final case class BinDoc(doc_id: Long, payload: Array[Byte], lang: String)

  /** Extracted features. */
  final case class BinFeatures(
      doc_id: Long, n_bytes: Long, byte_sum: Long, payload_md5: String, lang: String)

  /** Frame-sample features: every `stride`-th byte treated as a "frame"
    * (the video-pipeline shape: decode container -> sample frames ->
    * per-frame features, stubbed to byte arithmetic). */
  final case class FrameFeatures(
      doc_id: Long, n_frames: Long, frame_checksum: Long, first_frame: Int)

  /** STUB FRAME SAMPLER — stands in for container demux + frame decode.
    * Strided access over the payload mirrors how a real sampler seeks
    * keyframes without decoding everything between them. */
  def frameSampleStub(stride: Int)(rows: Iterator[BinDoc]): Iterator[FrameFeatures] =
    rows.map { r =>
      var sum = 0L; var n = 0L; var i = 0
      var first = -1
      while (i < r.payload.length) {
        val b = r.payload(i) & 0xff
        if (first < 0) first = b
        sum += b; n += 1; i += stride
      }
      FrameFeatures(r.doc_id, n, sum, first)
    }

  /** STUB DECODER — stands in for a real media decode (e.g. JPEG ->
    * pixels -> embedding). Deterministic pure function of the bytes so the
    * pipeline is testable; swap the body for a real codec in production.
    * Signature and batch shape (Iterator -> Iterator, per-partition) are
    * the real contract. */
  def decodeStub(rows: Iterator[BinDoc]): Iterator[BinFeatures] = {
    // per-partition init (real decoders allocate contexts/buffers here)
    val md = MessageDigest.getInstance("MD5")
    rows.map { r =>
      var sum = 0L
      var i = 0
      while (i < r.payload.length) { sum += r.payload(i) & 0xff; i += 1 }
      md.reset()
      val hex = md.digest(r.payload).map("%02x".format(_)).mkString
      BinFeatures(r.doc_id, r.payload.length.toLong, sum, hex, r.lang)
    }
  }

  val defs: Seq[QueryDef] = Seq(

    // --------------------------------------------------------------- q80:
    // binary payload -> mapPartitions decode -> per-language feature agg.
    QueryDef(
      "q80_binary_features",
      (s, d) => {
        implicit val inEnc = Encoders.product[BinDoc]
        implicit val outEnc = Encoders.product[BinFeatures]
        val bin = Tables(s, d, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"), col("lang"))
          .as[BinDoc](inEnc)
        bin.mapPartitions(decodeStub _)(outEnc).toDF()
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_bytes")).as("total_bytes"),
            sum(col("byte_sum")).as("total_byte_sum"),
            countDistinct(col("payload_md5")).as("n_distinct_payloads"))
          .orderBy("lang")
      },
      Some("""
        WITH f AS (SELECT doc_id, lang,
                          CAST(length(text) AS BIGINT) n_bytes,
                          CAST(list_reduce(list_transform(split(text, ''), c -> CAST(ord(c) AS BIGINT)),
                               (a2, b2) -> a2 + b2) AS BIGINT) byte_sum,
                          md5(text) payload_md5
                   FROM documents)
        SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
               CAST(SUM(byte_sum) AS BIGINT) AS total_byte_sum,
               COUNT(DISTINCT payload_md5) AS n_distinct_payloads
        FROM f GROUP BY lang
        ORDER BY lang""")),

    // --------------------------------------------------------------- q81:
    // frame sampling over binary payloads: stride-32 byte "frames" per
    // document (stub for keyframe extraction), per-doc features. The
    // oracle recomputes from the ASCII text (byte == char code).
    QueryDef(
      "q81_frame_sample",
      (s, d) => {
        implicit val inEnc = Encoders.product[BinDoc]
        implicit val outEnc = Encoders.product[FrameFeatures]
        Tables(s, d, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"), col("lang"))
          .as[BinDoc](inEnc)
          .mapPartitions(frameSampleStub(32) _)(outEnc).toDF()
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(len(generate_series(1, length(text), 32)) AS BIGINT) AS n_frames,
               CAST(list_sum(list_transform(generate_series(1, length(text), 32),
                    i -> ord(substr(text, i, 1)))) AS BIGINT) AS frame_checksum,
               CAST(ord(substr(text, 1, 1)) AS INTEGER) AS first_frame
        FROM documents
        ORDER BY doc_id"""))
  )
}
