package graft.catalog

import org.apache.spark.sql.types.DataType

/** Per-file BLOOM FILTERS for point-lookup file skipping on
  * high-cardinality UNSORTED columns (`graft.bloom_by`) — the axis
  * min/max stats cannot serve: on a table not clustered by k, every
  * file's [min, max] span covers virtually any probed key, so a
  * needle-in-haystack `WHERE k = v` opens every file. A 4 KB bloom per
  * (file, column), built by the WRITING task and committed inside the
  * file ref, answers "provably absent?" at plan time: at 100 TB a
  * point lookup drops from a corpus scan to the handful of files whose
  * bloom admits the key (false positives only cost reads — never
  * correctness; the reader still evaluates the predicate exactly).
  * The same test serves runtime (dynamic-pruning) IN-lists, so a
  * star-join's fact side skips files no probed dim key hashes into —
  * Iceberg/Delta ship the same mechanism via parquet bloom metadata.
  *
  * Layout: m = 2^15 bits (512 longs), k = 6 probes by double hashing
  * (Kirsch–Mitzenmacher): idx_i = h1 + i*h2 mod m, with h1 the
  * engine-pinned [[GraftBucket.hash64]] canonical value hash and h2 an
  * odd avalanche mix of it — one hash computation per value, shared
  * verbatim between writer and pruner. At the ~150 k rows/file the
  * writer targets, FPR ≈ (1 - e^(-kn/m))^k ≈ 2–3% — a 97% skip rate
  * on absent keys. Encoded base64 (~5.5 KB/file/column in the log).
  */
object GraftBloom {
  val NumBits: Int = 1 << 15
  private val NumWords = NumBits / 64
  private val K = 6

  /** Column types a bloom accepts: exactly the canonical-hash family
    * (same bar as bucket clustering). */
  def supported(dt: DataType): Boolean = GraftBucket.supported(dt)

  /** Second hash: odd-forced murmur3 finalizer of h1 — independent
    * enough for double hashing, free of a second pass over the bytes. */
  private def mix(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h | 1L
  }

  /** Streaming builder, one per (open file, bloom column). */
  final class Builder {
    private val words = new Array[Long](NumWords)
    def add(dt: DataType, value: Any): Unit = {
      val h1 = GraftBucket.hash64(dt, value)
      val h2 = mix(h1)
      var i = 0
      while (i < K) {
        val bit = java.lang.Math.floorMod(h1 + i * h2, NumBits.toLong).toInt
        words(bit >>> 6) |= 1L << (bit & 63)
        i += 1
      }
    }
    def encode(): String = {
      val bb = java.nio.ByteBuffer.allocate(NumWords * 8)
      bb.asLongBuffer().put(words)
      java.util.Base64.getEncoder.encodeToString(bb.array())
    }
  }

  /** Bounded decode cache: a runtime IN-list probes one bloom once per
    * value, and every query re-tests the same committed strings — skip
    * re-decoding 4 KB of base64 each time. Cleared wholesale past the
    * cap (refs are long-lived interned strings; the cap only matters
    * under pathological table counts). */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
  def decodeCached(encoded: String): Array[Long] = {
    if (cache.size > 4096) cache.clear()
    cache.computeIfAbsent(encoded, decode(_))
  }

  /** Decode a committed bloom. Returns null (no filtering) on any
    * shape surprise — an unreadable bloom must never prune. */
  def decode(encoded: String): Array[Long] =
    try {
      val bytes = java.util.Base64.getDecoder.decode(encoded)
      if (bytes.length != NumWords * 8) null
      else {
        val words = new Array[Long](NumWords)
        java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(words)
        words
      }
    } catch { case _: Exception => null }

  /** Membership probe against a decoded bloom. TRUE means "maybe
    * present" (the sound direction when in doubt). */
  def mightContain(words: Array[Long], dt: DataType, value: Any): Boolean = {
    if (words == null) return true
    val h1 =
      try GraftBucket.hash64(dt, value)
      catch { case _: Exception => return true } // foreign spelling: keep
    val h2 = mix(h1)
    var i = 0
    while (i < K) {
      val bit = java.lang.Math.floorMod(h1 + i * h2, NumBits.toLong).toInt
      if ((words(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }
}
