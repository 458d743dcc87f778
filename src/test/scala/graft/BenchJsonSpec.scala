package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact is machine-parsed JSON; number formatting must not
  * depend on the JVM default locale.
  */
class BenchJsonSpec extends AnyFunSuite {

  test("bench JSON numbers stay dot-decimal under a comma-decimal locale") {
    val prev = java.util.Locale.getDefault
    java.util.Locale.setDefault(java.util.Locale.GERMANY)
    try {
      assert(Bench.num(1234.5678) == "1234.568")
      assert(Bench.num(0.0005) == "0.001")
      // the trap the helper exists for: the f-interpolator formats with the
      // default locale and would emit a comma decimal here
      assert(f"${1234.5678}%.3f" == "1234,568")
    } finally java.util.Locale.setDefault(prev)
  }
}
