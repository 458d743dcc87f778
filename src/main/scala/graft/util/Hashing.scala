package graft.util

/** Cross-engine deterministic hashing.
  *
  * The oracle gate re-runs every query in DuckDB, so anything "random"
  * (sampling keys, MinHash permutations, LSH hyperplanes) must evaluate to
  * the *same value* in both engines. Spark's `rand`/`hash`/`xxhash64` and
  * DuckDB's `random`/`hash` are all engine-specific, so we derive every
  * pseudo-random quantity from md5 — standardized, byte-identical in both —
  * and reduce it to integers with plain 64-bit arithmetic.
  *
  * Spark side:  CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)
  * DuckDB side: CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)
  *
  * 15 hex digits = 60 bits, so values stay well inside a signed 64-bit int
  * and `(x % P) * a + b` never overflows for a,b < 2^31.
  *
  * At 100 TB this is also the *scalable* choice: every derived key is a
  * pure per-row expression (no RNG state, no driver round-trip), so
  * sampling/minhashing/bucketing all stay embarrassingly parallel.
  */
object Hashing {
  /** Mersenne prime 2^31 - 1 — modulus for MinHash permutations. */
  val P = 2147483647L

  /** MinHash permutation coefficients (k = 16), fixed arbitrary constants
    * < 2^31. Same literals are interpolated into the DuckDB oracle SQL. */
  val K = 16
  val A: Seq[Long] = (0 until K).map(i => ((2L * i + 1) * 1000003L + 12345L) % P)
  val B: Seq[Long] = (0 until K).map(i => ((i + 1) * 7919977L + 54321L) % P)

  /** Spark SQL fragment: md5-derived 60-bit int of expression `s`. */
  def sparkMd5Long(s: String): String =
    s"CAST(conv(substr(md5($s), 1, 15), 16, 10) AS BIGINT)"

  /** JVM-side evaluation of the same 60-bit md5 value, for quantities that
    * are CONSTANT per query (e.g. LSH plane weights): computed once at
    * plan-build time and interpolated as literals into both the Spark plan
    * and the DuckDB oracle SQL, instead of per-row md5 evaluation. */
  def md5Long(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** DuckDB SQL fragment for the same value. */
  def duckMd5Long(s: String): String =
    s"CAST(concat('0x', substr(md5($s), 1, 15)) AS BIGINT)"

  /** Spark literal array of the permutation coefficients. */
  def sparkArray(xs: Seq[Long]): String = xs.mkString("array(", ", ", ")")

  /** DuckDB literal list of the same coefficients. */
  def duckArray(xs: Seq[Long]): String = xs.mkString("[", ", ", "]")
}
