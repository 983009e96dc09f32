package graft.sources.arrow

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiles DSv2 `sources.Filter` predicates to row predicates the Arrow
  * reader evaluates during the scan. Only filters this object claims
  * (`supported`) are reported as pushed; everything else stays residual
  * and Catalyst re-applies it above the scan — so claiming less is
  * always safe, claiming wrong is never possible.
  */
object FilterEval {

  def supported(schema: StructType, f: Filter): Boolean = f match {
    case EqualTo(a, _) => comparable(schema, a)
    case GreaterThan(a, _) => comparable(schema, a)
    case GreaterThanOrEqual(a, _) => comparable(schema, a)
    case LessThan(a, _) => comparable(schema, a)
    case LessThanOrEqual(a, _) => comparable(schema, a)
    case In(a, _) => comparable(schema, a)
    case IsNull(a) => schema.fieldNames.contains(a)
    case IsNotNull(a) => schema.fieldNames.contains(a)
    case StringStartsWith(a, _) => isString(schema, a)
    case StringEndsWith(a, _) => isString(schema, a)
    case StringContains(a, _) => isString(schema, a)
    case And(l, r) => supported(schema, l) && supported(schema, r)
    case Or(l, r) => supported(schema, l) && supported(schema, r)
    // NOT is never claimed: compiled predicates collapse SQL's
    // three-valued logic to Boolean (null comparisons evaluate false),
    // and negating that false would PASS rows whose comparison is
    // unknown — e.g. `tag =!= "a"` must exclude null tags, but
    // Not(EqualTo) over a null row would admit them. Unclaimed, the
    // filter stays residual and Catalyst evaluates it with real
    // null semantics. (And/Or are safe: unknown propagates to false
    // on both sides, which matches SQL's row-exclusion behavior.)
    case Not(_) => false
    case _ => false
  }

  private def isString(schema: StructType, name: String): Boolean =
    schema.fieldNames.contains(name) &&
      schema(name).dataType == StringType

  private def comparable(schema: StructType, name: String): Boolean =
    schema.fieldNames.contains(name) && (schema(name).dataType match {
      case _: NumericType | StringType | TimestampType | TimestampNTZType |
           DateType | BooleanType => true
      case _ => false
    })

  /** Build an InternalRow predicate for a pushed filter against the
    * pruned read schema. */
  def compile(schema: StructType, f: Filter): InternalRow => Boolean = f match {
    case And(l, r) =>
      val (cl, cr) = (compile(schema, l), compile(schema, r))
      row => cl(row) && cr(row)
    case Or(l, r) =>
      val (cl, cr) = (compile(schema, l), compile(schema, r))
      row => cl(row) || cr(row)
    case Not(c) =>
      val cc = compile(schema, c); row => !cc(row)
    case IsNull(a) =>
      val i = schema.fieldIndex(a); row => row.isNullAt(i)
    case IsNotNull(a) =>
      val i = schema.fieldIndex(a); row => !row.isNullAt(i)
    case EqualTo(a, v) => cmp(schema, a, v)(_ == 0)
    case GreaterThan(a, v) => cmp(schema, a, v)(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(schema, a, v)(_ >= 0)
    case LessThan(a, v) => cmp(schema, a, v)(_ < 0)
    case LessThanOrEqual(a, v) => cmp(schema, a, v)(_ <= 0)
    case In(a, vs) =>
      val i = schema.fieldIndex(a)
      val dt = schema(a).dataType
      val set = vs.map(v => normalize(dt, v)).toSet
      row => !row.isNullAt(i) && set.contains(extract(row, i, dt))
    case StringStartsWith(a, p) => strPred(schema, a)(_.startsWith(p))
    case StringEndsWith(a, p) => strPred(schema, a)(_.endsWith(p))
    case StringContains(a, p) => strPred(schema, a)(_.contains(p))
    case other =>
      throw new IllegalStateException(s"unclaimed filter pushed: $other")
  }

  private def strPred(schema: StructType, a: String)(p: String => Boolean)
      : InternalRow => Boolean = {
    val i = schema.fieldIndex(a)
    row => !row.isNullAt(i) && p(row.getUTF8String(i).toString)
  }

  private def cmp(schema: StructType, a: String, v: Any)(res: Int => Boolean)
      : InternalRow => Boolean = {
    val i = schema.fieldIndex(a)
    val dt = schema(a).dataType
    val cv = normalize(dt, v)
    row =>
      if (row.isNullAt(i)) false
      else res(compareValues(extract(row, i, dt), cv))
  }

  /** External literal (java.sql.Timestamp, String, boxed numerics) →
    * internal representation matching [[extract]]. */
  private def normalize(dt: DataType, v: Any): Any = (dt, v) match {
    case (_: DecimalType, n: java.math.BigDecimal) =>
      org.apache.spark.sql.types.Decimal(n)
    case (_: DecimalType, n: scala.math.BigDecimal) =>
      org.apache.spark.sql.types.Decimal(n)
    case (TimestampType, t: java.sql.Timestamp) =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)
    case (TimestampType, t: java.time.Instant) =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(t)
    case (TimestampNTZType, t: java.time.LocalDateTime) =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateTimeToMicros(t)
    case (DateType, d: java.sql.Date) =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d)
    case (DateType, d: java.time.LocalDate) =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateToDays(d)
    case (StringType, s: String) => UTF8String.fromString(s)
    case _ => v
  }

  private def extract(row: InternalRow, i: Int, dt: DataType): Any = dt match {
    case ByteType => row.getByte(i)
    case ShortType => row.getShort(i)
    case IntegerType => row.getInt(i)
    case LongType | TimestampType | TimestampNTZType => row.getLong(i)
    case DateType => row.getInt(i)
    case FloatType => row.getFloat(i)
    case DoubleType => row.getDouble(i)
    case BooleanType => row.getBoolean(i)
    case StringType => row.getUTF8String(i)
    // comparable() claims every NumericType, which includes decimals —
    // without this arm a pushed decimal predicate would compile fine
    // and crash the scan at the first evaluated row
    case d: DecimalType => row.getDecimal(i, d.precision, d.scale)
    case other => throw new IllegalStateException(s"uncomparable $other")
  }

  private def compareValues(a: Any, b: Any): Int = (a, b) match {
    case (x: Byte, y: Number) => java.lang.Long.compare(x.toLong, y.longValue)
    case (x: Short, y: Number) => java.lang.Long.compare(x.toLong, y.longValue)
    case (x: Int, y: Number) => java.lang.Long.compare(x.toLong, y.longValue)
    case (x: Long, y: Number) => java.lang.Long.compare(x, y.longValue)
    case (x: Float, y: Number) =>
      java.lang.Double.compare(x.toDouble, y.doubleValue)
    case (x: Double, y: Number) => java.lang.Double.compare(x, y.doubleValue)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case (x: UTF8String, y: UTF8String) => x.compareTo(y)
    case (x: org.apache.spark.sql.types.Decimal,
        y: org.apache.spark.sql.types.Decimal) => x.compare(y)
    case (x, y) => throw new IllegalStateException(s"cannot compare $x / $y")
  }
}
