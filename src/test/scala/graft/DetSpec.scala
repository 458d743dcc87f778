package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.util.Det

/** Property tests for the exact-decimal aggregation layer (graft.util.Det)
  * — the machinery every oracle-paired float aggregate rides through.
  * Deterministically seeded random batteries near the DECIMAL(12,4) edge:
  *
  *  - dsum/revenue must be BIT-identical under any partitioning and row
  *    order (the whole point: shuffle must not change the answer);
  *  - on inputs with exactly representable scale-4 values (the fixture
  *    contract: prices/quantities are generated at ≤4 fractional digits),
  *    dsum equals the exact BigDecimal reference at the extreme of the
  *    [-(10^8 - 1e-4), 10^8 - 1e-4] domain;
  *  - the overflow budget: sum of DECIMAL(12,4) widens to DECIMAL(22,4)
  *    (10 carry digits), so ~10^10 max-magnitude rows fit before overflow —
  *    far beyond any per-partition partial sum; revenue terms carry
  *    scale 10 and are re-rounded to 4 before the final cast so the scaled
  *    integer stays under 2^53 (both engines' decimal->double casts then
  *    round identically).
  */
class DetSpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)

  /** doubles that are exactly k * 10^-4 with |k| < 10^12 (DECIMAL(12,4)
    * domain, the fixture value contract). */
  private def scale4Doubles(n: Int, maxAbs: Long): Seq[(Long, Double)] =
    Seq.fill(n) {
      val k = (rnd.nextLong() % maxAbs)
      k -> JBigDecimal.valueOf(k, 4).doubleValue()
    }

  private def df(vals: Seq[(Long, Double)], parts: Int) = {
    val rows = vals.map { case (_, v) => Row(v) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, parts),
      StructType(Seq(StructField("v", DoubleType))))
  }

  test("dsum is bit-identical across partitionings and row orders") {
    val vals = scale4Doubles(5000, 999999999999L) // up to |99,999,999.9999|
    val sums = Seq(1, 3, 8, 32).map { p =>
      df(rnd.shuffle(vals), p).agg(Det.dsum(col("v")).as("s"))
        .collect()(0).getDouble(0)
    }
    assert(sums.distinct.size == 1,
      s"partitioning changed dsum: $sums")
  }

  test("dsum equals the exact BigDecimal reference at the DECIMAL(12,4) edge") {
    // half the battery pinned at the extreme magnitudes
    val edge = Seq.fill(500)(999999999999L * (if (rnd.nextBoolean()) 1 else -1))
      .map(k => k -> JBigDecimal.valueOf(k, 4).doubleValue())
    val vals = edge ++ scale4Doubles(500, 999999999999L)
    val expect = vals.map { case (k, _) => JBigDecimal.valueOf(k, 4) }
      .foldLeft(JBigDecimal.ZERO)(_.add(_)).doubleValue()
    val got = df(vals, 8).agg(Det.dsum(col("v")).as("s")).collect()(0).getDouble(0)
    assert(got == expect, s"dsum=$got reference=$expect")
  }

  test("revenue matches the HALF_UP BigDecimal reference and is order-free") {
    val terms = Seq.fill(2000) {
      val price = math.abs(rnd.nextLong() % 999999999999L)
      val disc = math.abs(rnd.nextLong() % 1000000L) // scale-6 rate < 1
      (price, disc)
    }
    val rows = terms.map { case (p, d2) =>
      Row(JBigDecimal.valueOf(p, 4).doubleValue(), JBigDecimal.valueOf(d2, 6).doubleValue())
    }
    val schema = StructType(Seq(
      StructField("price", DoubleType), StructField("disc", DoubleType)))
    def run(parts: Int) = spark.createDataFrame(
        spark.sparkContext.parallelize(rnd.shuffle(rows), parts), schema)
      .agg(Det.revenue(col("price"), col("disc")).as("r"))
      .collect()(0).getDouble(0)
    val expect = terms.map { case (p, d2) =>
      JBigDecimal.valueOf(p, 4)
        .multiply(JBigDecimal.ONE.subtract(JBigDecimal.valueOf(d2, 6)))
    }.foldLeft(JBigDecimal.ZERO)(_.add(_))
      .setScale(4, RoundingMode.HALF_UP).doubleValue()
    val got = Seq(run(1), run(8), run(32))
    assert(got.distinct.size == 1, s"partitioning changed revenue: $got")
    assert(got.head == expect, s"revenue=${got.head} reference=$expect")
  }

  test("sum of DECIMAL(12,4) widens to DECIMAL(22,4): 10-digit carry budget") {
    val t = df(scale4Doubles(10, 999999999999L), 2)
      .agg(sum(Det.dec4(col("v"))).as("s")).schema("s").dataType
    assert(t == DecimalType(22, 4), s"carry budget changed: $t")
  }
}
