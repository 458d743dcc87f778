package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The `zorder(...)` DSv2 scalar function — the seam that turns
  * `graft.zorder_by` into a real write-side layout (VERDICT r11 item
  * 5). A z-ordered table's write builder demands an ORDERED
  * distribution on `zorder(c1, ..., cn)`; Spark resolves the transform
  * through the catalog's FunctionCatalog (the same mechanism Iceberg
  * uses for its bucket/truncate sort orders), range-shuffles on the
  * z-value, and each output file then covers a compact Morton-curve
  * range = a compact axis-aligned box in EVERY clustered dimension —
  * so the ordinary per-file min/max stats prune a predicate on ANY
  * single column, where a 1-D sort (`graft.sort_by`) only serves its
  * leading column. The layout machinery itself (Morton locality,
  * skip-count measurement) is proven by q138/ZOrderSpec; this function
  * generalizes it to arbitrary arity and full precision.
  *
  * The z-value is a BINARY of 8·n bytes: each column maps to an
  * order-preserving unsigned 64-bit pattern (sign-flip for integers,
  * IEEE total-order for floats, UTF8 prefix for strings), and the n
  * patterns bit-interleave MSB-first, so unsigned lexicographic byte
  * order IS z-curve order at full precision — no bucketing step, no
  * skew collapse when a column's domain only exercises low bits (the
  * shared high bits just become a common prefix). Nulls map to the
  * all-zeros pattern (nulls-first). Per row this is 64·n bit ops —
  * write-side only, amortized into the shuffle that the ordered
  * distribution requires anyway.
  */
object GraftZOrder extends UnboundFunction {

  /** Column types a z-order clustering accepts: the order-preserving
    * 64-bit mappings below. (Decimals above long precision would need
    * variable-width patterns — loud reject at CREATE.) */
  def supported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DateType | TimestampType |
         TimestampNTZType | DoubleType | FloatType | StringType => true
    case d: DecimalType => d.precision <= 18
    case _ => false
  }

  /** Order-preserving map to unsigned-comparable 64 bits. */
  private def bits(dt: DataType, row: InternalRow, i: Int): Long = dt match {
    case LongType | TimestampType | TimestampNTZType =>
      row.getLong(i) ^ Long.MinValue
    case IntegerType | DateType =>
      (row.getInt(i).toLong << 32) ^ Long.MinValue
    case DoubleType =>
      val b = java.lang.Double.doubleToRawLongBits(row.getDouble(i))
      if (b < 0) ~b else b | Long.MinValue
    case FloatType =>
      val b = java.lang.Float.floatToRawIntBits(row.getFloat(i)).toLong << 32
      if (b < 0) ~b else b | Long.MinValue
    case StringType =>
      val bytes = row.getUTF8String(i).getBytes
      var v = 0L
      var j = 0
      while (j < 8) {
        v = (v << 8) | (if (j < bytes.length) bytes(j) & 0xffL else 0L)
        j += 1
      }
      v
    case d: DecimalType =>
      row.getDecimal(i, d.precision, d.scale).toUnscaledLong ^ Long.MinValue
    case other =>
      throw new IllegalStateException(s"zorder: unsupported ${other.catalogString}")
  }

  override def name(): String = "zorder"
  override def description(): String =
    "zorder(c1, ..., cn) -> BINARY: full-precision Morton interleave; " +
      "byte order = z-curve order"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length >= 2,
      s"zorder needs at least 2 columns, got ${inputType.length}")
    inputType.fields.foreach(f => require(supported(f.dataType),
      s"zorder: unsupported column type ${f.dataType.catalogString}"))
    val dts = inputType.fields.map(_.dataType)
    new ScalarFunction[Array[Byte]] {
      override def inputTypes(): Array[DataType] = dts
      override def resultType(): DataType = BinaryType
      override def name(): String = "zorder"
      override def canonicalName(): String = "graft.zorder"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Array[Byte] = {
        val n = dts.length
        val cols = new Array[Long](n)
        var c = 0
        while (c < n) {
          cols(c) = if (input.isNullAt(c)) 0L else bits(dts(c), input, c)
          c += 1
        }
        val out = new Array[Byte](8 * n)
        var j = 0 // output bit index, 0 = MSB
        while (j < 64 * n) {
          val col = j % n
          val src = 63 - (j / n) // source bit position (63 = MSB)
          if (((cols(col) >>> src) & 1L) != 0L)
            out(j >> 3) = (out(j >> 3) | (0x80 >>> (j & 7))).toByte
          j += 1
        }
        out
      }
    }
  }
}
