package graft

import graft.multimodal.Multimodal.{decodeStub, BinDoc}

/** Multimodal plumbing: the stub decoder's contract — deterministic,
  * byte-exact features, empty-payload safety. */
class MultimodalSpec extends SparkSpec {

  test("decodeStub computes byte-exact features") {
    val payload = "abc".getBytes("UTF-8")
    val out = decodeStub(Iterator(BinDoc(7L, payload, "en"))).toSeq
    assert(out.size == 1)
    val f = out.head
    assert(f.doc_id == 7L)
    assert(f.n_bytes == 3L)
    assert(f.byte_sum == 'a'.toLong + 'b'.toLong + 'c'.toLong)
    assert(f.payload_md5 == "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
    assert(f.lang == "en")
  }

  test("animated GIF synth + frame sampler round-trip the pixel arithmetic exactly") {
    import graft.multimodal.Multimodal._
    for (id <- Seq(0L, 3L, 17L)) {
      val doc = makeGif(Iterator(id)).next()
      // real container: bytes start with the GIF89a magic
      assert(new String(doc.payload.take(6), "US-ASCII") == "GIF89a")
      val ff = frameSampleGif(2)(Iterator(doc)).next()
      val nf = gifFrames(id)
      val sampled = 0 until nf by 2
      val expSum = (for {
        f <- sampled; y <- 0 until gifHeight(id); x <- 0 until gifWidth(id)
      } yield gifPixel(id, f, x, y).toLong).sum
      assert(ff.n_frames == nf)
      assert(ff.n_sampled == sampled.size.toLong)
      assert(ff.sampled_sum == expSum, s"lossy GIF round-trip for doc $id")
      assert(ff.first_pixel == gifPixel(id, 0, 0, 0))
    }
  }

  test("decodeStub handles empty payloads and preserves row count") {
    val rows = Seq(BinDoc(1L, Array.emptyByteArray, "en"),
                   BinDoc(2L, Array[Byte](-1, 0), "de")) // -1 -> unsigned 255
    val out = decodeStub(rows.iterator).toSeq
    assert(out.map(_.doc_id) == Seq(1L, 2L))
    assert(out.head.n_bytes == 0L && out.head.byte_sum == 0L)
    assert(out(1).byte_sum == 255L)
  }

  test("PNG encode -> ImageIO decode roundtrips pixels losslessly") {
    import graft.multimodal.Multimodal.{decodePng, makePng, pngHeight, pngPixel, pngWidth}
    val ids = Seq(0L, 7L, 123L, 4999L)
    val out = decodePng(makePng(ids.iterator)).toSeq
    assert(out.map(_.doc_id) == ids)
    out.foreach { f =>
      val (w, h) = (pngWidth(f.doc_id), pngHeight(f.doc_id))
      assert(f.width == w && f.height == h)
      val expectedSum = (for (y <- 0 until h; x <- 0 until w)
        yield pngPixel(f.doc_id, x, y).toLong).sum
      assert(f.pixel_sum == expectedSum, s"decode not lossless for ${f.doc_id}")
      val expectedThumb = Array.tabulate(16)(i =>
        pngPixel(f.doc_id, (i % 4) * w / 4, (i / 4) * h / 4))
      assert(f.thumb_str == expectedThumb.mkString(","))
      assert(f.thumb_sum == expectedThumb.map(_.toLong).sum)
    }
  }

  test("makePng emits a real PNG container (magic bytes)") {
    import graft.multimodal.Multimodal.makePng
    val png = makePng(Iterator(42L)).next().payload
    assert(png.take(8).toSeq == Seq(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
  }

  test("WAV decode parses the bytes (not the generator) and rejects " +
      "corrupt payloads loudly") {
    import graft.multimodal.Multimodal._
    val doc = makeWav(Iterator(7L)).next()
    // real container: RIFF magic + canonical 44-byte PCM header
    assert(new String(doc.payload.take(4), "US-ASCII") == "RIFF")
    assert(new String(doc.payload.slice(8, 12), "US-ASCII") == "WAVE")
    val f = decodeWav(Iterator(doc)).next()
    assert(f.sample_rate == wavRate(7) && f.n_channels == wavChannels(7) &&
      f.n_frames == wavFrames(7))
    assert(f.first_sample == wavSample(7, 0, 0))
    // a corrupted magic must throw, not feature-extract garbage
    val bad = doc.payload.clone(); bad(1) = 'X'.toByte
    intercept[IllegalArgumentException] {
      decodeWav(Iterator(WavDoc(7L, bad))).next()
    }
    // a non-PCM format tag must throw too (byte 20 = audio format LE)
    val nonPcm = doc.payload.clone(); nonPcm(20) = 3 // IEEE float
    intercept[IllegalArgumentException] {
      decodeWav(Iterator(WavDoc(7L, nonPcm))).next()
    }
  }

  test("WAV chunk walker honors RIFF word alignment (odd-sized chunk)") {
    import graft.multimodal.Multimodal._
    val doc = makeWav(Iterator(9L)).next()
    val clean = decodeWav(Iterator(doc)).next()
    // splice a spec-valid odd-sized LIST chunk between WAVE and fmt :
    // 8-byte header + 5 payload bytes + 1 UNCOUNTED pad byte = 14 bytes
    val chunk = java.nio.ByteBuffer.allocate(14)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    chunk.put("LIST".getBytes("US-ASCII")).putInt(5)
      .put("INFOx".getBytes("US-ASCII")).put(0.toByte)
    val out = java.nio.ByteBuffer
      .allocate(doc.payload.length + 14)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(doc.payload, 0, 12).put(chunk.array())
      .put(doc.payload, 12, doc.payload.length - 12)
    out.putInt(4, doc.payload.length + 14 - 8) // patch RIFF size
    val padded = decodeWav(Iterator(WavDoc(9L, out.array()))).next()
    assert(padded == clean,
      "odd-sized chunk shifted the parse: pad byte not honored")
  }

  test("interpolation resample degenerates to scaled decimation on an " +
      "integer-ratio rate, and blends exactly on 44.1 kHz") {
    import graft.multimodal.Multimodal._
    // 8000 -> 4000: up/dn = 2/1, every frac = 0 — the interpolated
    // outputs must be the decimated samples scaled by dn = 1
    val dec = resampleWav(4000)(makeWav(Iterator(4L))).next() // rate 8000
    val itp8 = resampleWavInterp(4000)(Iterator(
      makeWav(Iterator(4L)).next())).next()
    assert(itp8.scale == 1 && itp8.out_first == dec.out_first,
      s"integer-ratio interp diverged from decimation: $itp8 vs $dec")
    assert(itp8.out_sum_abs == dec.out_sum_abs)
    // interp output count drops the tail sample decimation keeps when
    // i0+1 would run past the last frame — never more outputs
    assert(itp8.n_out == dec.n_out || itp8.n_out == dec.n_out - 1)
    // 44100 -> 4000 reduces to 441/40: spot-check j=1 against the
    // closed-form blend (i0 = 11, frac = 1)
    val doc = makeWavAt(44100)(Iterator(5L)).next()
    val f = resampleWavInterp(4000)(Iterator(doc)).next()
    assert(f.src_rate == 44100 && f.scale == 40)
    assert(f.out_first == wavSample(5, 0, 0) * 40, "j=0 must be s[0]*dn")
    val expectedN = {
      var j = 0L; val nf = wavFrames(5)
      while ((j * 441) / 40 + 1 <= nf - 1) j += 1
      j
    }
    assert(f.n_out == expectedN)
    // closed-form blend at the LAST output: j = n_out - 1,
    // i0 = (j*441)/40, frac = (j*441)%40 -> s[i0]*(40-frac)+s[i0+1]*frac
    val jl = expectedN - 1
    val i0 = ((jl * 441) / 40).toInt
    val frac = ((jl * 441) % 40).toInt
    val expectedLast =
      wavSample(5, 0, i0) * (40 - frac) + wavSample(5, 0, i0 + 1) * frac
    assert(f.out_last == expectedLast,
      s"last blended sample ${f.out_last} != closed form $expectedLast")
  }
}
