package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted via a typed `mapPartitions` pass.
  *
  * The image (q82, PNG) and video-shaped (q81, animated GIF) paths run
  * REAL `javax.imageio` codecs end-to-end. No other media libraries
  * exist in this environment, so the generic-byte `decodeStub` below
  * (q80/q83) is a clearly-marked deterministic stand-in for heavier
  * codecs — but everything around it is the real 100 TB-shape pipeline:
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

  // ImageIO's default stream cache backs EVERY read/write with a temp
  // FILE (create + write + delete per image) — pure syscall churn for
  // the small in-memory payloads here, and the dominant variance source
  // under 32 concurrent decoders (round-18, guide §1: q82 swung
  // 1.4–5.5 s across back-to-back samples with proc-CPU tracking the
  // swing). Memory-backed streams; one JVM-wide switch, applied when
  // any executor first touches this object.
  javax.imageio.ImageIO.setUseCache(false)

  /** Input row: payload + metadata (what a real image/audio table looks
    * like: (id, bytes, meta...)). */
  final case class BinDoc(doc_id: Long, payload: Array[Byte], lang: String)

  /** Extracted features. */
  final case class BinFeatures(
      doc_id: Long, n_bytes: Long, byte_sum: Long, payload_md5: String, lang: String)

  // ------------------------------------------------------------------ GIF
  // Real video-shaped path (NOT a stub): the JDK's javax.imageio GIF
  // codec reads AND writes multi-frame (animated) images, so container
  // demux -> keyframe sampling -> per-frame features runs on genuine
  // bytes. Deterministic animated grayscale GIFs are synthesized per
  // doc_id (GIF is lossless for <=256 colors; the 251-value gray ramp
  // round-trips exactly — verified), frames are STRIDE-sampled without
  // decoding the skipped ones, and the DuckDB oracle recomputes the
  // pixel arithmetic with no decoder in the loop.

  final case class GifDoc(doc_id: Long, payload: Array[Byte])

  /** Frame-sample features over the decoded container: total frame count
    * from container metadata, every-stride-th frame decoded and reduced. */
  final case class FrameFeatures(
      doc_id: Long, n_frames: Int, n_sampled: Long, sampled_sum: Long,
      first_pixel: Int)

  /** Deterministic animation geometry/content, shared with the oracle. */
  def gifWidth(id: Long): Int = 8 + (id % 5).toInt
  def gifHeight(id: Long): Int = 6 + (id % 4).toInt
  def gifFrames(id: Long): Int = 3 + (id % 4).toInt
  def gifPixel(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 31 + f * 17 + x * 7 + y * 13) % 251).toInt

  /** Fixture synthesis: deterministic animated 8-bit grayscale GIF per
    * doc_id via ImageIO's sequence writer. */
  def makeGif(rows: Iterator[Long]): Iterator[GifDoc] = {
    // per-partition writer init (the amortized-context contract)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    rows.map { id =>
      val w = gifWidth(id); val h = gifHeight(id); val nf = gifFrames(id)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nf) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, gifPixel(id, f, x, y)); x += 1 }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null),
          writer.getDefaultWriteParam)
        f += 1
      }
      writer.endWriteSequence()
      ios.close()
      GifDoc(id, bos.toByteArray)
    }
  }

  /** REAL FRAME SAMPLER: GIF container open -> frame count from metadata
    * -> decode ONLY every `stride`-th frame (how a real sampler seeks
    * keyframes without decoding everything between them) -> pixel stats.
    * Per-partition reader init; grayscale palette means the red channel
    * IS the gray value. */
  def frameSampleGif(stride: Int)(rows: Iterator[GifDoc]): Iterator[FrameFeatures] = {
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    rows.map { r =>
      reader.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(r.payload)))
      val nf = reader.getNumImages(true)
      var sum = 0L; var nSampled = 0L; var first = -1
      var f = 0
      while (f < nf) {
        val img = reader.read(f)
        val w = img.getWidth; val h = img.getHeight
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = (img.getRGB(x, y) >> 16) & 0xff
            if (first < 0) first = v
            sum += v
            x += 1
          }
          y += 1
        }
        nSampled += 1
        f += stride
      }
      FrameFeatures(r.doc_id, nf, nSampled, sum, first)
    }
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

  // ------------------------------------------------------------------ WAV
  // Real audio path (NOT a stub): PCM WAV is a plain RIFF container the
  // JVM needs no codec library for — the header is 44 bytes of
  // little-endian fields, the payload interleaved 16-bit samples. Audio
  // is synthesized per doc_id from modular arithmetic (the q81/q82
  // recipe: lossless by construction, so the oracle recomputes every
  // feature from the formula with no decoder in the loop), and the
  // decoder genuinely PARSES: it walks the RIFF chunk list, reads the
  // format fields from the bytes (never from the generator), and
  // decodes the PCM frames.

  final case class WavDoc(doc_id: Long, payload: Array[Byte])

  /** Decoded audio features: format fields from the parsed header,
    * duration from frames/rate, amplitude stats from the PCM samples. */
  final case class WavFeatures(
      doc_id: Long, sample_rate: Int, n_channels: Int, n_frames: Long,
      duration_ms: Long, sum_abs: Long, max_abs: Int, first_sample: Int)

  /** Deterministic audio geometry/content, shared with the oracle. */
  def wavRate(id: Long): Int = 8000 + (id % 4).toInt * 4000
  def wavChannels(id: Long): Int = 1 + (id % 2).toInt
  def wavFrames(id: Long): Int = 256 + (id % 7).toInt * 32
  def wavSample(id: Long, c: Int, n: Int): Int =
    (((id * 31 + n * 7 + c * 13) % 4001) - 2000).toInt

  /** Synthesize one canonical 44-byte-header PCM16LE WAV — the single
    * RIFF-writing body behind [[makeWav]] (per-id fixture rates) and
    * [[makeWavAt]] (pinned rate), so container fixes land once. */
  private def synthWav(id: Long, rate: Int): WavDoc = {
    val (ch, nf) = (wavChannels(id), wavFrames(id))
    val dataBytes = nf * ch * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(ch.toShort).putInt(rate)
      .putInt(rate * ch * 2) // byte rate
      .putShort((ch * 2).toShort) // block align
      .putShort(16) // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var n = 0
    while (n < nf) {
      var c = 0
      while (c < ch) { bb.putShort(wavSample(id, c, n).toShort); c += 1 }
      n += 1
    }
    WavDoc(id, bb.array())
  }

  /** Canonical PCM16LE WAVs at the per-id fixture rates. */
  def makeWav(rows: Iterator[Long]): Iterator[WavDoc] =
    rows.map(id => synthWav(id, wavRate(id)))

  /** Parsed PCM audio: format fields from the header bytes, samples
    * interleaved channel-major per frame (the wire order). */
  final case class PcmAudio(rate: Int, channels: Int, samples: Array[Short]) {
    def nFrames: Int = samples.length / channels
  }

  /** REAL RIFF/PCM parse: chunk-walk to `fmt ` and `data`, read every
    * format field from the BYTES, decode the interleaved PCM16LE
    * frames. Throws on anything that is not canonical PCM WAV — a
    * corrupt payload must fail loudly, not feature-extract garbage. */
  def parseWav(docId: Long, payload: Array[Byte]): PcmAudio = {
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", s"doc $docId: not a RIFF file")
    bb.getInt // riff size
    require(fourcc() == "WAVE", s"doc $docId: not a WAVE form")
    var rate, ch = -1
    var audio: PcmAudio = null
    while (audio == null) {
      val id = fourcc()
      val size = bb.getInt
      id match {
        case "fmt " =>
          require(bb.getShort == 1, s"doc $docId: not PCM")
          ch = bb.getShort.toInt
          rate = bb.getInt
          bb.getInt // byte rate
          bb.getShort // block align
          require(bb.getShort.toInt == 16, s"doc $docId: not 16-bit")
          // RIFF chunks are word-aligned: odd-sized chunks carry one
          // pad byte not counted in `size`
          bb.position(bb.position() + (size - 16) + (size & 1))
        case "data" =>
          require(rate > 0, s"doc $docId: data chunk before fmt")
          val samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) { samples(i) = bb.getShort; i += 1 }
          audio = PcmAudio(rate, ch, samples)
        case _ => // skip unknown chunk incl. its word-alignment pad byte
          bb.position(bb.position() + size + (size & 1))
      }
    }
    audio
  }

  /** Amplitude-stat features over the parsed audio. */
  def decodeWav(rows: Iterator[WavDoc]): Iterator[WavFeatures] = rows.map { r =>
    val a = parseWav(r.doc_id, r.payload)
    var sumAbs = 0L
    var maxAbs = 0
    var i = 0
    while (i < a.samples.length) {
      val v = math.abs(a.samples(i).toInt)
      sumAbs += v
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    val first = if (a.samples.nonEmpty) a.samples(0).toInt else Int.MinValue
    WavFeatures(r.doc_id, a.rate, a.channels, a.nFrames,
      a.nFrames * 1000L / a.rate, sumAbs, maxAbs, first)
  }

  /** Resampled-channel features (q193). */
  final case class ResampleFeatures(
      doc_id: Long, src_rate: Int, stride: Int, n_out: Long,
      out_sum_abs: Long, out_first: Int, out_last: Int)

  /** Sample-rate normalization by integer DECIMATION: keep channel 0 at
    * every `src_rate / targetRate`-th frame. The fixture rates (8/12/
    * 16/20 kHz) are exact multiples of the 4 kHz target, so decimation
    * is lossless sample selection — integer-exact, hence oracle-able —
    * where a fractional ratio would need interpolation (a float design
    * the oracle gate would reject; real pipelines low-pass first, which
    * is a convolution this op deliberately stays below). */
  def resampleWav(targetRate: Int)(rows: Iterator[WavDoc]): Iterator[ResampleFeatures] =
    rows.map { r =>
      val a = parseWav(r.doc_id, r.payload)
      require(a.rate % targetRate == 0,
        s"doc ${r.doc_id}: rate ${a.rate} not an integer multiple of $targetRate")
      val stride = a.rate / targetRate
      var sumAbs = 0L
      var nOut = 0L
      var first = Int.MinValue
      var last = Int.MinValue
      var f = 0
      while (f < a.nFrames) {
        val v = a.samples(f * a.channels).toInt // channel 0 of frame f
        if (nOut == 0) first = v
        last = v
        sumAbs += math.abs(v)
        nOut += 1
        f += stride
      }
      ResampleFeatures(r.doc_id, a.rate, stride, nOut, sumAbs, first, last)
    }

  /** Pinned-rate fixture variant: same deterministic content/geometry
    * as [[makeWav]], with the sample rate forced (q199 uses 44 100 Hz —
    * NOT an integer multiple of the 4 kHz target, the case q193's
    * decimation refuses; VERDICT r9 item 6). */
  def makeWavAt(rate: Int)(rows: Iterator[Long]): Iterator[WavDoc] =
    rows.map(id => synthWav(id, rate))

  /** Linear-interpolation resample features (q199). Values carry the
    * denominator SCALE so everything stays integer-exact. */
  final case class ResampleInterpFeatures(
      doc_id: Long, src_rate: Int, n_out: Long, scale: Int,
      out_sum_abs: Long, out_first: Int, out_last: Int)

  /** Fractional-ratio resampling by LINEAR INTERPOLATION — the general
    * case decimation (q193) can't express: output sample j sits at
    * source position j * src/target = j * up / dn (the ratio reduced by
    * gcd, e.g. 44100/4000 = 441/40), between source frames i0 and
    * i0 + 1 with fractional weight frac/dn. Instead of evaluating the
    * blend in floating point (which the oracle gate would reject), the
    * emitted value is SCALED by dn:
    *   out_scaled = s[i0] * (dn - frac) + s[i0 + 1] * frac
    * — pure int64 arithmetic, bit-replayable in SQL. A real pipeline
    * divides by dn (and low-passes first); the engine op deliberately
    * stops at the exact numerator, the same honesty contract as q193.
    * Outputs stop at the last j whose i0 + 1 still exists — no
    * zero-padded tail sample. */
  def resampleWavInterp(targetRate: Int)(rows: Iterator[WavDoc]): Iterator[ResampleInterpFeatures] =
    rows.map { r =>
      val a = parseWav(r.doc_id, r.payload)
      val g = java.math.BigInteger.valueOf(a.rate)
        .gcd(java.math.BigInteger.valueOf(targetRate)).intValueExact()
      val up = a.rate / g
      val dn = targetRate / g
      var j = 0L
      var sumAbs = 0L
      var first = Int.MinValue
      var last = Int.MinValue
      var n = 0L
      while (((j * up) / dn + 1) <= a.nFrames - 1) {
        val i0 = ((j * up) / dn).toInt
        val frac = ((j * up) % dn).toInt
        val s0 = a.samples(i0 * a.channels).toInt // channel 0
        val s1 = a.samples((i0 + 1) * a.channels).toInt
        val v = s0 * (dn - frac) + s1 * frac
        if (n == 0) first = v
        last = v
        sumAbs += math.abs(v)
        n += 1
        j += 1
      }
      ResampleInterpFeatures(r.doc_id, a.rate, n, dn, sumAbs, first, last)
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
    // REAL video-shaped decode: deterministic animated grayscale GIFs
    // (3-6 frames each, synthesized per doc_id — lossless, verified
    // exact round-trip) are demuxed with the JDK's javax.imageio GIF
    // codec; the container reports its frame count, every 2nd frame is
    // decoded (stride sampling — skipped frames are never decoded), and
    // the sampled frames reduce to pixel stats. The oracle recomputes
    // the identical sums from the doc_id arithmetic, decoder-free.
    QueryDef(
      "q81_frame_sample",
      (s, d) => {
        implicit val idEnc = Encoders.scalaLong
        implicit val gifEnc = Encoders.product[GifDoc]
        implicit val outEnc = Encoders.product[FrameFeatures]
        Tables(s, d, "documents")
          .select(col("doc_id")).as[Long](idEnc)
          .mapPartitions(makeGif _)(gifEnc)
          .mapPartitions(frameSampleGif(2) _)(outEnc).toDF()
          .orderBy("doc_id")
      },
      Some("""
        WITH t AS (SELECT doc_id,
                          CAST(8 + doc_id % 5 AS INTEGER) AS width,
                          CAST(6 + doc_id % 4 AS INTEGER) AS height,
                          CAST(3 + doc_id % 4 AS INTEGER) AS n_frames
                   FROM documents)
        SELECT doc_id, n_frames,
               CAST(len(generate_series(0, n_frames - 1, 2)) AS BIGINT)
                 AS n_sampled,
               CAST(list_sum(list_transform(generate_series(0, n_frames - 1, 2),
                 f -> list_sum(flatten(list_transform(generate_series(0, height - 1),
                   y -> list_transform(generate_series(0, width - 1),
                     x -> (doc_id * 31 + f * 17 + x * 7 + y * 13) % 251))))))
                 AS BIGINT) AS sampled_sum,
               CAST(doc_id * 31 % 251 AS INTEGER) AS first_pixel
        FROM t
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
        ORDER BY lang""")),

    // -------------------------------------------------------------- q192:
    // REAL audio decode: deterministic PCM16LE WAVs (synthesized per
    // doc_id — PCM is lossless, so content is known arithmetic) are
    // parsed by a genuine RIFF chunk-walker that reads sample rate /
    // channels / bit depth FROM THE BYTES and decodes the interleaved
    // frames into amplitude stats. Completes the multimodal trio
    // (image q82, video-shaped q81, audio here) with zero external
    // codec dependencies — canonical WAV needs none. The oracle
    // recomputes every feature from the doc_id arithmetic, decoder-free;
    // scale shape identical to q81/q82: per-row codec work inside
    // mapPartitions, embarrassingly parallel, features become plain
    // columns for the rest of the plan.
    QueryDef(
      "q192_wav_decode",
      (s, d) => {
        implicit val idEnc = Encoders.scalaLong
        implicit val wavEnc = Encoders.product[WavDoc]
        implicit val outEnc = Encoders.product[WavFeatures]
        Tables(s, d, "documents")
          .select(col("doc_id")).as[Long](idEnc)
          .mapPartitions(makeWav _)(wavEnc)
          .mapPartitions(decodeWav _)(outEnc).toDF()
          .orderBy("doc_id")
      },
      Some("""
        WITH t AS (SELECT doc_id,
                          CAST(8000 + (doc_id % 4) * 4000 AS INTEGER)
                            AS sample_rate,
                          CAST(1 + doc_id % 2 AS INTEGER) AS n_channels,
                          CAST(256 + (doc_id % 7) * 32 AS BIGINT) AS n_frames
                   FROM documents),
        s2 AS (SELECT doc_id, sample_rate, n_channels, n_frames,
                      flatten(list_transform(
                        generate_series(0, n_channels - 1),
                        c -> list_transform(
                          generate_series(0, CAST(n_frames AS INTEGER) - 1),
                          n -> abs(((doc_id * 31 + n * 7 + c * 13) % 4001)
                                   - 2000)))) AS amps
               FROM t)
        SELECT doc_id, sample_rate, n_channels, n_frames,
               n_frames * 1000 // sample_rate AS duration_ms,
               CAST(list_sum(amps) AS BIGINT) AS sum_abs,
               CAST(list_max(amps) AS INTEGER) AS max_abs,
               CAST((doc_id * 31) % 4001 - 2000 AS INTEGER) AS first_sample
        FROM s2
        ORDER BY doc_id""")),

    // -------------------------------------------------------------- q193:
    // Audio RESAMPLING: every corpus file decimated to a common 4 kHz —
    // the sample-rate normalization step every audio-training pipeline
    // runs before feature extraction, here as lossless integer
    // decimation of the parsed PCM (see resampleWav's scaladoc for why
    // not interpolation). The four fixture rates (8/12/16/20 kHz) give
    // strides 2/3/4/5, so the selected-frame arithmetic varies per
    // document and the oracle replays it with stepped generate_series. Scale shape: same per-row mapPartitions codec
    // work as q81/q82/q192.
    QueryDef(
      "q193_wav_resample",
      (s, d) => {
        implicit val idEnc = Encoders.scalaLong
        implicit val wavEnc = Encoders.product[WavDoc]
        implicit val outEnc = Encoders.product[ResampleFeatures]
        Tables(s, d, "documents")
          .select(col("doc_id")).as[Long](idEnc)
          .mapPartitions(makeWav _)(wavEnc)
          .mapPartitions(resampleWav(4000) _)(outEnc).toDF()
          .orderBy("doc_id")
      },
      Some("""
        WITH t AS (SELECT doc_id,
                          CAST(8000 + (doc_id % 4) * 4000 AS INTEGER)
                            AS src_rate,
                          CAST(256 + (doc_id % 7) * 32 AS INTEGER) AS nf
                   FROM documents),
        s2 AS (SELECT doc_id, src_rate, src_rate // 4000 AS stride, nf,
                      list_transform(
                        generate_series(0, nf - 1, src_rate // 4000),
                        n -> ((doc_id * 31 + n * 7) % 4001) - 2000) AS sel
               FROM t)
        SELECT doc_id, src_rate, CAST(stride AS INTEGER) AS stride,
               CAST(len(sel) AS BIGINT) AS n_out,
               CAST(list_sum(list_transform(sel, v -> abs(v))) AS BIGINT)
                 AS out_sum_abs,
               CAST(sel[1] AS INTEGER) AS out_first,
               CAST(sel[len(sel)] AS INTEGER) AS out_last
        FROM s2
        ORDER BY doc_id""")),

    // -------------------------------------------------------------- q199:
    // FRACTIONAL-RATIO audio resampling: the corpus re-synthesized at
    // 44.1 kHz (the rate q193's decimation refuses — 44100/4000 reduces
    // to 441/40, not an integer) and interpolated down to 4 kHz. The
    // decoder still genuinely parses the RIFF bytes; the interpolation
    // is integer-exact at scale dn = 40 (see resampleWavInterp), so the
    // oracle replays every blended sample — weights included — in SQL.
    // Scale shape: identical to q192/q193, embarrassingly parallel
    // per-row codec work, no shuffle before the output sort.
    QueryDef(
      "q199_wav_resample_interp",
      (s, d) => {
        implicit val idEnc = Encoders.scalaLong
        implicit val wavEnc = Encoders.product[WavDoc]
        implicit val outEnc = Encoders.product[ResampleInterpFeatures]
        Tables(s, d, "documents")
          .select(col("doc_id")).as[Long](idEnc)
          .mapPartitions(makeWavAt(44100) _)(wavEnc)
          .mapPartitions(resampleWavInterp(4000) _)(outEnc).toDF()
          .orderBy("doc_id")
      },
      Some("""
        WITH t AS (SELECT doc_id,
                          CAST(256 + (doc_id % 7) * 32 AS INTEGER) AS nf
                   FROM documents),
        s2 AS (SELECT doc_id, nf,
                      list_transform(
                        list_filter(
                          generate_series(0, (nf * 40) // 441 + 2),
                          j -> (j * 441) // 40 + 1 <= nf - 1),
                        j -> ((doc_id * 31 + ((j * 441) // 40) * 7) % 4001
                                - 2000) * (40 - (j * 441) % 40)
                           + ((doc_id * 31 + ((j * 441) // 40 + 1) * 7)
                                % 4001 - 2000) * ((j * 441) % 40)) AS outs
               FROM t)
        SELECT doc_id, CAST(44100 AS INTEGER) AS src_rate,
               CAST(len(outs) AS BIGINT) AS n_out,
               CAST(40 AS INTEGER) AS scale,
               CAST(list_sum(list_transform(outs, v -> abs(v))) AS BIGINT)
                 AS out_sum_abs,
               CAST(outs[1] AS INTEGER) AS out_first,
               CAST(outs[len(outs)] AS INTEGER) AS out_last
        FROM s2
        ORDER BY doc_id"""))
  )
}
