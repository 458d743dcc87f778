package graft.catalog

import java.time.LocalDate

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HIDDEN (transform) PARTITIONING — Iceberg's signature scale feature,
  * re-expressed over this catalog's stats-pinned file layout. Identity
  * partitioning splits one file per distinct VALUE, which is unusable
  * for the axis every 100-TB table actually partitions on: time. A
  * raw-timestamp identity partition makes one file per microsecond;
  * `PARTITIONED BY (days(ts))` makes one file per day per write, and
  * the user still writes predicates against `ts` — the transform is
  * invisible at query time (hence "hidden"), because pruning runs on
  * the SOURCE column's per-file min/max stats, which a one-day file
  * pins to a one-day span.
  *
  * One partition field = one [[GraftPartField]]:
  *   - `fn`    — identity | days | months | years | hours | truncate
  *   - `width` — truncate's width (0 otherwise)
  *   - `col`   — the source column
  *
  * The encoded string form (`"ts"`, `"days(ts)"`, `"truncate(4,s)"`)
  * is what persists in the table index and `graft.partitioned_by`, so
  * legacy identity entries (bare names) parse unchanged.
  *
  * Transform semantics are the canonical Iceberg/epoch ones (UTC):
  * days = epoch days, hours = epoch hours, months = months since
  * 1970-01, years = years since 1970, truncate(w, s) = first w code
  * points / `v - floorMod(v, w)`. They are implemented ONCE here and
  * shared verbatim by (a) the writer's file-split key, (b) the
  * dynamic-overwrite partition key derived from file stats, (c) the
  * `$partitions` census rendering, and (d) the FunctionCatalog scalar
  * functions Spark resolves when the write distribution demands
  * clustering by the transform — the same mechanism as [[GraftBucket]].
  */
final case class GraftPartField(fn: String, width: Int, col: String) {

  def isIdentity: Boolean = fn == "identity"

  /** Persisted / property spelling. */
  def encoded: String = fn match {
    case "identity" => col
    case "truncate" => s"truncate($width,$col)"
    case other => s"$other($col)"
  }

  /** The connector Transform reported via `Table.partitioning()` and
    * demanded as the write distribution's clustering expression. */
  def transform: Transform = fn match {
    case "identity" => Expressions.identity(col)
    case "days" => Expressions.days(col)
    case "months" => Expressions.months(col)
    case "years" => Expressions.years(col)
    case "hours" => Expressions.hours(col)
    case "truncate" =>
      Expressions.apply("truncate",
        Expressions.literal(width), Expressions.column(col))
  }

  /** Source-type validation, loud at CREATE TABLE. */
  def validate(dt: DataType): Unit = fn match {
    case "identity" => // statsCapable is checked by the caller
    case "days" | "months" | "years" => dt match {
      case DateType | TimestampType | TimestampNTZType =>
      case other => throw new UnsupportedOperationException(
        s"$fn($col) requires a DATE/TIMESTAMP column, got " +
          other.catalogString)
    }
    case "hours" => dt match {
      case TimestampType | TimestampNTZType =>
      case other => throw new UnsupportedOperationException(
        s"hours($col) requires a TIMESTAMP column, got " +
          other.catalogString)
    }
    case "truncate" =>
      require(width > 0, s"truncate($width,$col): width must be > 0")
      dt match {
        case StringType | IntegerType | LongType =>
        case other => throw new UnsupportedOperationException(
          s"truncate($col) requires a STRING/INT/BIGINT column, got " +
            other.catalogString)
      }
    case other => throw new UnsupportedOperationException(
      s"unknown partition transform $other($col)")
  }

  /** Transform of one catalyst-internal value (null-safe). The result
    * is itself a catalyst-internal value (Int / Long / UTF8String) and
    * is the unit of file splitting and partition identity. */
  def eval(dt: DataType, v: Any): Any =
    if (v == null) null
    else fn match {
      case "identity" => v
      case "days" => GraftPartField.epochDay(dt, v)
      case "hours" => Math.floorDiv(v.asInstanceOf[Long],
        GraftPartField.MicrosPerHour).toInt
      case "months" =>
        val d = LocalDate.ofEpochDay(
          GraftPartField.epochDay(dt, v).toLong)
        (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
      case "years" =>
        LocalDate.ofEpochDay(
          GraftPartField.epochDay(dt, v).toLong).getYear - 1970
      case "truncate" => dt match {
        case StringType => v.asInstanceOf[UTF8String].substring(0, width)
        case IntegerType =>
          val i = v.asInstanceOf[Int]; i - Math.floorMod(i, width)
        case LongType =>
          val l = v.asInstanceOf[Long]
          l - Math.floorMod(l, width.toLong)
        case other => throw new IllegalStateException(
          s"truncate: unsupported ${other.catalogString}")
      }
    }

  /** Human/SQL rendering of a transform result — the `$partitions`
    * census key (`days(ts)=2024-03-15`, Iceberg's own spelling). */
  def render(dt: DataType, v: Any): String =
    if (v == null) "null"
    else fn match {
      case "identity" => v.toString
      case "days" =>
        LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString
      case "hours" =>
        val h = v.asInstanceOf[Int].toLong
        val d = LocalDate.ofEpochDay(Math.floorDiv(h, 24L))
        f"$d-${Math.floorMod(h, 24L)}%02d"
      case "months" =>
        val m = v.asInstanceOf[Int]
        f"${1970 + Math.floorDiv(m, 12)}-${Math.floorMod(m, 12) + 1}%02d"
      case "years" => (1970 + v.asInstanceOf[Int]).toString
      case "truncate" => v.toString
    }
}

object GraftPartField {
  private[catalog] val MicrosPerDay: Long = 86400000000L
  private[catalog] val MicrosPerHour: Long = 3600000000L

  private[catalog] def epochDay(dt: DataType, v: Any): Int = dt match {
    case DateType => v.asInstanceOf[Int]
    case TimestampType | TimestampNTZType =>
      Math.floorDiv(v.asInstanceOf[Long], MicrosPerDay).toInt
    case other => throw new IllegalStateException(
      s"no epoch-day for ${other.catalogString}")
  }

  private val Pat = """^(days|months|years|hours)\(([^(),]+)\)$""".r
  private val TruncPat = """^truncate\((\d+),([^(),]+)\)$""".r

  /** Parse the persisted spelling; a bare name is identity (the legacy
    * form every pre-transform table index carries). */
  def parse(s: String): GraftPartField = s.trim match {
    case Pat(fn, c) => GraftPartField(fn, 0, c.trim)
    case TruncPat(w, c) => GraftPartField("truncate", w.toInt, c.trim)
    case bare => GraftPartField("identity", 0, bare)
  }

  /** Resolve a DDL `PARTITIONED BY` Transform into a partition field.
    * Accepts identity, days/months/years/hours(col), and
    * truncate(w, col) in either argument order (Iceberg DDL writes the
    * width first; Spark's parser preserves whatever the user typed). */
  def fromTransform(t: Transform): GraftPartField = {
    import org.apache.spark.sql.connector.expressions.{Literal => V2Literal, NamedReference}
    def colOf(refs: Array[NamedReference]): String = {
      require(refs.length == 1 && refs(0).fieldNames().length == 1,
        s"partition transform $t must reference exactly one top-level " +
          "column")
      refs(0).fieldNames()(0)
    }
    t.name().toLowerCase(java.util.Locale.ROOT) match {
      case "identity" => GraftPartField("identity", 0, colOf(t.references()))
      case fn @ ("days" | "months" | "years" | "hours") =>
        GraftPartField(fn, 0, colOf(t.references()))
      case "truncate" =>
        val lits = t.arguments().collect { case l: V2Literal[_] => l }
        require(lits.length == 1 && t.arguments().length == 2,
          s"truncate expects (width, col), got $t")
        val w = lits(0).value() match {
          case i: java.lang.Integer => i.intValue()
          case l: java.lang.Long => l.toInt
          case other => throw new UnsupportedOperationException(
            s"truncate width must be an integer literal, got $other")
        }
        GraftPartField("truncate", w, colOf(t.references()))
      case other => throw new UnsupportedOperationException(
        s"graft catalog supports identity, days, months, years, hours " +
          s"and truncate PARTITIONED BY transforms, got $other in $t")
    }
  }

  /** The FunctionCatalog scalar functions behind the write-side
    * clustering transforms — resolved by name exactly like
    * [[GraftBucket]]/[[GraftZOrder]]; canonical names are stable so
    * SPJ compatibility checks compare equal across scans. */
  private def unaryTime(fname: String): UnboundFunction = new UnboundFunction {
    override def name(): String = fname
    override def description(): String =
      s"$fname(ts) -> INT: epoch-based $fname partition transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 1,
        s"$fname expects one DATE/TIMESTAMP argument")
      val dt = inputType.fields(0).dataType
      val f = GraftPartField(fname, 0, "x")
      f.validate(dt)
      new ScalarFunction[Int] {
        override def inputTypes(): Array[DataType] = Array(dt)
        override def resultType(): DataType = IntegerType
        override def name(): String = fname
        override def canonicalName(): String = s"graft.$fname"
        override def produceResult(input: InternalRow): Int = {
          val v: Any =
            if (input.isNullAt(0)) null
            else dt match {
              case DateType => input.getInt(0)
              case _ => input.getLong(0)
            }
          // null partition values cluster together under key 0 — the
          // writer still files them under the null key; clustering
          // placement never affects correctness
          val r = f.eval(dt, v)
          if (r == null) 0 else r.asInstanceOf[Int]
        }
      }
    }
  }

  val DaysFn: UnboundFunction = unaryTime("days")
  val MonthsFn: UnboundFunction = unaryTime("months")
  val YearsFn: UnboundFunction = unaryTime("years")
  val HoursFn: UnboundFunction = unaryTime("hours")

  val TruncateFn: UnboundFunction = new UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(w, col): width-truncated partition transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2 &&
          inputType.fields(0).dataType == IntegerType,
        s"truncate expects (INT width, col), got ${inputType.catalogString}")
      val dt = inputType.fields(1).dataType
      // type validation happens ONCE here at bind — produceResult runs
      // per row inside the write shuffle (the width is a literal, so a
      // per-row field rebuild would be pure hot-path waste; eval itself
      // only switches on the pre-checked type)
      GraftPartField("truncate", 1, "x").validate(dt)
      new ScalarFunction[Any] {
        override def inputTypes(): Array[DataType] =
          Array(IntegerType, dt)
        override def resultType(): DataType = dt
        override def name(): String = "truncate"
        override def canonicalName(): String = "graft.truncate"
        override def produceResult(input: InternalRow): Any = {
          val f = GraftPartField("truncate", input.getInt(0), "x")
          if (input.isNullAt(1)) null
          else dt match {
            case StringType => f.eval(dt, input.getUTF8String(1))
            case IntegerType => f.eval(dt, input.getInt(1))
            case LongType => f.eval(dt, input.getLong(1))
            case other => throw new IllegalStateException(
              s"truncate: unsupported ${other.catalogString}")
          }
        }
      }
    }
  }
}
