package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The `bucket(n, col)` DSv2 scalar function — hash-bucket clustering
  * for HIGH-CARDINALITY keys, the companion to identity-partition SPJ
  * (q212): an orders-to-lineitem join can never identity-partition on
  * the order key (one partition per key), but both tables CAN be
  * written into the same N hash buckets, and two same-bucketed tables
  * then storage-partition-join with ZERO shuffle — Iceberg's bucket
  * join, the production shape of a 100-TB fact-to-fact join.
  *
  * The function is exposed through the catalog's FunctionCatalog under
  * the name Spark's `Expressions.bucket` transform resolves
  * (`bucket`), with a stable `canonicalName` — SPJ compatibility
  * compares the canonical name and the bucket count, so two scans of
  * graft tables bucketed `(col, N)` report provably-identical
  * layouts. The hash is a fixed FNV-1a over the value's
  * order-preserving byte pattern — engine-pinned, JVM-independent, and
  * shared verbatim by the writer (assigning rows to bucket files), the
  * scan (bucket-pruning point lookups to 1/N of the files), and the
  * shuffle Spark plans when a write needs re-clustering.
  */
object GraftBucket extends UnboundFunction {

  /** Key types a bucket clustering accepts. */
  def supported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DateType | TimestampType |
         TimestampNTZType | StringType => true
    case d: DecimalType => d.precision <= 18
    case _ => false
  }

  private def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private def fnv1aLong(v: Long): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < 8) {
      h ^= ((v >>> (56 - 8 * i)) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** The engine-pinned 64-bit value hash (FNV-1a over the value's
    * canonical byte pattern) — shared by bucket assignment AND the
    * per-file bloom filters ([[GraftBloom]]), so a write-side hash and
    * a prune-side hash of the same value always agree. Accepts both
    * catalyst (UTF8String, Decimal) and external (String, java
    * BigDecimal) spellings — writers and pruners arrive with different
    * ones. Nulls hash to 0 by convention. */
  def hash64(dt: DataType, value: Any): Long = (dt, value) match {
    case (_, null) => 0L
    case (LongType | TimestampType | TimestampNTZType, v: Long) =>
      fnv1aLong(v)
    case (IntegerType | DateType, v: Int) => fnv1aLong(v.toLong)
    case (StringType, s: UTF8String) => fnv1a(s.getBytes)
    case (StringType, s: String) =>
      fnv1a(UTF8String.fromString(s).getBytes)
    case (_: DecimalType, d: Decimal) => fnv1aLong(d.toUnscaledLong)
    case (_: DecimalType, d: java.math.BigDecimal) =>
      fnv1aLong(d.unscaledValue().longValueExact())
    case (t, v) => throw new IllegalStateException(
      s"bucket: unsupported value ${v.getClass.getName} for ${t.catalogString}")
  }

  /** Bucket id in [0, n) for a value (null keys go to bucket 0). */
  def bucketId(dt: DataType, value: Any, n: Int): Int =
    java.lang.Math.floorMod(hash64(dt, value), n.toLong).toInt

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col) -> INT: stable FNV-1a hash bucket in [0, n)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      s"bucket expects (numBuckets, col), got ${inputType.length} args")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket: numBuckets must be INT, got " +
        inputType.fields(0).dataType.catalogString)
    val keyType = inputType.fields(1).dataType
    require(supported(keyType),
      s"bucket: unsupported key type ${keyType.catalogString}")
    new ScalarFunction[Int] {
      override def inputTypes(): Array[DataType] =
        Array(IntegerType, keyType)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = "graft.bucket"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Int = {
        val n = input.getInt(0)
        val v: Any =
          if (input.isNullAt(1)) null
          else keyType match {
            case LongType | TimestampType | TimestampNTZType =>
              input.getLong(1)
            case IntegerType | DateType => input.getInt(1)
            case StringType => input.getUTF8String(1)
            case d: DecimalType => input.getDecimal(1, d.precision, d.scale)
            case other => throw new IllegalStateException(
              s"bucket: unsupported ${other.catalogString}")
          }
        bucketId(keyType, v, n)
      }
    }
  }
}
