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

  /** Resize-stub output: fixed-size "thumbnail" from a variable-size
    * payload. */
  final case class Thumb(doc_id: Long, thumb: Array[Int], thumb_sum: Long)

  /** STUB RESIZER — nearest-neighbor downsample of the payload to a fixed
    * `target` length, the byte-level analog of image resize-to-WxH (and
    * exactly what a cheap thumbnailer does per axis). Swap the body for a
    * real scaler in production; the fixed-output-shape contract is what
    * downstream feature columns rely on. */
  def resizeStub(target: Int)(rows: Iterator[BinDoc]): Iterator[Thumb] =
    rows.map { r =>
      val n = r.payload.length
      val t = Array.tabulate(target) { i =>
        if (n == 0) 0 else r.payload((i.toLong * n / target).toInt) & 0xff
      }
      Thumb(r.doc_id, t, t.map(_.toLong).sum)
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
                          CASE WHEN length(text) = 0 THEN 0
                               ELSE CAST(list_reduce(list_transform(split(text, ''), c -> CAST(ord(c) AS BIGINT)),
                                    (a2, b2) -> a2 + b2) AS BIGINT) END byte_sum,
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
               CASE WHEN length(text) = 0 THEN 0
                    ELSE CAST(list_sum(list_transform(generate_series(1, length(text), 32),
                         i -> ord(substr(text, i, 1)))) AS BIGINT) END AS frame_checksum,
               CASE WHEN length(text) = 0 THEN -1
                    ELSE CAST(ord(substr(text, 1, 1)) AS INTEGER) END AS first_frame
        FROM documents
        ORDER BY doc_id""")),

    // --------------------------------------------------------------- q82:
    // resize: variable-size payload -> fixed 16-"pixel" nearest-neighbor
    // thumbnail (image-resize analog), per-partition typed pass. The
    // array stays in-plan; the output projects it to scalars + a joined
    // string so the oracle can recompute from the ASCII text.
    QueryDef(
      "q82_resize_stub",
      (s, d) => {
        implicit val inEnc = Encoders.product[BinDoc]
        implicit val outEnc = Encoders.product[Thumb]
        Tables(s, d, "documents")
          .filter(length(col("text")) >= 16)
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"), col("lang"))
          .as[BinDoc](inEnc)
          .mapPartitions(resizeStub(16) _)(outEnc).toDF()
          .select(col("doc_id"),
            array_join(col("thumb"), ",").as("thumb_str"),
            col("thumb_sum"),
            element_at(col("thumb"), 1).as("first_px"),
            element_at(col("thumb"), 16).as("last_px"))
          .orderBy("doc_id")
      },
      Some("""
        WITH t AS (SELECT doc_id,
                          list_transform(generate_series(0, 15),
                            i -> ord(substr(text, CAST((i * length(text)) // 16 AS INTEGER) + 1, 1))) AS thumb
                   FROM documents WHERE length(text) >= 16)
        SELECT doc_id,
               array_to_string(thumb, ',') AS thumb_str,
               CAST(list_sum(thumb) AS BIGINT) AS thumb_sum,
               CAST(thumb[1] AS INTEGER) AS first_px,
               CAST(thumb[16] AS INTEGER) AS last_px
        FROM t
        ORDER BY doc_id""")),

    // --------------------------------------------------------------- q83:
    // real `binaryFile` ingest: payloads arrive as FILES (the way image/
    // audio corpora actually land), read via format("binaryFile"), id
    // parsed from the file name, metadata joined from the catalog table,
    // then the same typed per-partition decode as q80. The file
    // materialization is fixture synthesis (idempotent, guarded) — in
    // production the objects already exist on shared storage and only the
    // read path below runs.
    QueryDef(
      "q83_binaryfile_ingest",
      (s, d) => {
        val root = s"/tmp/graft_binfiles/${Integer.toHexString(d.hashCode)}"
        val marker = new java.io.File(s"$root/_SUCCESS")
        if (!marker.exists) {
          new java.io.File(root).mkdirs()
          Tables(s, d, "documents").filter(col("doc_id") < 200)
            .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
            .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
              rows.foreach { r =>
                java.nio.file.Files.write(
                  java.nio.file.Paths.get(root, f"${r.getLong(0)}%06d.bin"),
                  r.getAs[Array[Byte]](1))
              }
            }
          marker.createNewFile(): Unit
        }
        implicit val inEnc = Encoders.product[BinDoc]
        implicit val outEnc = Encoders.product[BinFeatures]
        val bin = graft.Tables.binaryFiles(s, root, "*.bin")
          .select(
            regexp_extract(col("path"), "(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
            col("content").as("payload"))
        val langs = Tables(s, d, "documents").select(col("doc_id"), col("lang"))
        bin.join(langs, "doc_id")
          .select(col("doc_id"), col("payload"), col("lang")).as[BinDoc](inEnc)
          .mapPartitions(decodeStub _)(outEnc).toDF()
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
                          CASE WHEN length(text) = 0 THEN 0
                               ELSE CAST(list_reduce(list_transform(split(text, ''), c -> CAST(ord(c) AS BIGINT)),
                                    (a2, b2) -> a2 + b2) AS BIGINT) END byte_sum,
                          md5(text) payload_md5
                   FROM documents WHERE doc_id < 200)
        SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
               CAST(SUM(byte_sum) AS BIGINT) AS total_byte_sum,
               COUNT(DISTINCT payload_md5) AS n_distinct_payloads
        FROM f GROUP BY lang
        ORDER BY lang"""))
  )
}
