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

  // ------------------------------------------------------------------ PNG
  // Real image path (NOT a stub): the JDK ships a PNG codec
  // (javax.imageio), so the image family's decode step is genuine —
  // deterministic grayscale PNGs are synthesized per doc_id (fixture
  // synthesis, lossless format), then DECODED with ImageIO, resized
  // nearest-neighbor, and reduced to pixel stats. Because PNG is
  // lossless and the pixel function is pure doc_id arithmetic, the
  // DuckDB oracle recomputes the exact same sums WITHOUT a decoder —
  // the decode path is hash-checked end-to-end.

  final case class PngDoc(doc_id: Long, payload: Array[Byte])
  final case class PngFeatures(
      doc_id: Long, width: Int, height: Int, pixel_sum: Long,
      thumb_str: String, thumb_sum: Long)

  /** Deterministic image geometry/content, shared with the oracle. */
  def pngWidth(id: Long): Int = 8 + (id % 5).toInt
  def pngHeight(id: Long): Int = 6 + (id % 4).toInt
  def pngPixel(id: Long, x: Int, y: Int): Int =
    ((id * 31 + x * 7 + y * 13) % 251).toInt

  /** Fixture synthesis: deterministic 8-bit grayscale PNG per doc_id
    * (variable WxH so the resize below has real work to do). */
  def makePng(rows: Iterator[Long]): Iterator[PngDoc] = rows.map { id =>
    val w = pngWidth(id); val h = pngHeight(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pngPixel(id, x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    PngDoc(id, bos.toByteArray)
  }

  /** REAL DECODER: ImageIO PNG decode -> nearest-neighbor 4x4 resize ->
    * pixel statistics. Iterator->Iterator per-partition shape so a
    * heavier codec (JNI, ffmpeg pipe) slots in with its init amortized;
    * the work is embarrassingly parallel across executors. */
  def decodePng(rows: Iterator[PngDoc]): Iterator[PngFeatures] = rows.map { r =>
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.payload))
    val raster = img.getRaster
    val w = img.getWidth; val h = img.getHeight
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    // nearest-neighbor 4x4 thumbnail (the resize-to-fixed-shape contract
    // downstream feature columns rely on)
    val thumb = Array.tabulate(16) { i =>
      raster.getSample((i % 4) * w / 4, (i / 4) * h / 4, 0)
    }
    PngFeatures(r.doc_id, w, h, sum, thumb.mkString(","),
      thumb.map(_.toLong).sum)
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
    // REAL image decode: deterministic grayscale PNGs (synthesized per
    // doc_id — lossless, so content is known arithmetic) are decoded with
    // the JDK's javax.imageio PNG codec, resized nearest-neighbor to a
    // fixed 4x4 thumbnail, and reduced to pixel stats. The oracle
    // recomputes the exact pixel sums from the doc_id arithmetic — no
    // decoder needed on the DuckDB side, full hash check on this one.
    QueryDef(
      "q82_png_decode",
      (s, d) => {
        implicit val idEnc = Encoders.scalaLong
        implicit val pngEnc = Encoders.product[PngDoc]
        implicit val featEnc = Encoders.product[PngFeatures]
        Tables(s, d, "documents")
          .select(col("doc_id")).as[Long](idEnc)
          .mapPartitions(makePng _)(pngEnc)
          .mapPartitions(decodePng _)(featEnc).toDF()
          .orderBy("doc_id")
      },
      Some("""
        WITH t AS (SELECT doc_id,
                          CAST(8 + doc_id % 5 AS INTEGER) AS width,
                          CAST(6 + doc_id % 4 AS INTEGER) AS height
                   FROM documents),
        p AS (SELECT doc_id, width, height,
                     CAST(list_sum(flatten(list_transform(generate_series(0, height - 1),
                       y -> list_transform(generate_series(0, width - 1),
                         x -> (doc_id * 31 + x * 7 + y * 13) % 251)))) AS BIGINT) AS pixel_sum,
                     list_transform(generate_series(0, 15),
                       i -> (doc_id * 31 + ((i % 4) * width // 4) * 7
                             + ((i // 4) * height // 4) * 13) % 251) AS thumb
              FROM t)
        SELECT doc_id, width, height, pixel_sum,
               array_to_string(thumb, ',') AS thumb_str,
               CAST(list_sum(thumb) AS BIGINT) AS thumb_sum
        FROM p
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
