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

  test("decodeStub handles empty payloads and preserves row count") {
    val rows = Seq(BinDoc(1L, Array.emptyByteArray, "en"),
                   BinDoc(2L, Array[Byte](-1, 0), "de")) // -1 -> unsigned 255
    val out = decodeStub(rows.iterator).toSeq
    assert(out.map(_.doc_id) == Seq(1L, 2L))
    assert(out.head.n_bytes == 0L && out.head.byte_sum == 0L)
    assert(out(1).byte_sum == 255L)
  }

  test("resizeStub always emits the fixed target shape") {
    import graft.multimodal.Multimodal.resizeStub
    val rows = Seq(
      BinDoc(1L, Array.emptyByteArray, "en"),
      BinDoc(2L, "x".getBytes("UTF-8"), "en"),
      BinDoc(3L, ("y" * 1000).getBytes("UTF-8"), "en"))
    val out = resizeStub(16)(rows.iterator).toSeq
    assert(out.forall(_.thumb.length == 16))
    assert(out.head.thumb.forall(_ == 0))              // empty -> zero thumb
    assert(out(1).thumb.forall(_ == 'x'.toInt))        // constant payload -> constant thumb
    assert(out(2).thumb_sum == 16L * 'y'.toInt)
  }
}
