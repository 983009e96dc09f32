package graft.sources.arrow

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Batch-level zone maps for the Arrow IPC source: per-record-batch
  * min/max of every numeric/temporal column, written into the IPC
  * footer's custom metadata and consulted at PLANNING time to drop
  * record batches no pushed filter can match.
  *
  * This is the storage-engine data-skipping trick (parquet row-group
  * stats, ORC/Delta/Iceberg zone maps) applied to a format that does
  * not carry statistics natively: at 100 TB a scan with a selective
  * range filter on a sort/cluster key reads only the overlapping
  * batches — the footer is read anyway for split planning, so pruning
  * is free. Because the scan already splits at record-batch
  * granularity, a skipped batch is a split that never becomes a task.
  *
  * Pruning is strictly conservative: a batch is dropped only when a
  * pushed filter PROVABLY matches nothing in the batch's [min,max]
  * range. Missing stats (all-null batch, NaN poisoning, untracked
  * column, version mismatch) keep the batch; the pushed filter is
  * still evaluated row-level inside the reader, so skipping is a pure
  * optimization with no correctness surface beyond the stats being
  * true bounds.
  *
  * Encoding (footer key `graft.zonemap`), line-oriented:
  * {{{
  *   v1
  *   colA,colB                 tracked column names
  *   12:99;0.5:2.5             batch 0: per-column "min:max" ("" = none)
  *   100:180;                  batch 1
  * }}}
  * Integral stats print as exact longs, fractional via Double.toString
  * (round-trip exact); names containing a delimiter are not tracked.
  */
object ZoneMaps {
  val MetaKey = "graft.zonemap"

  /** Column kinds the writer tracks. */
  final val KindNone = 0
  final val KindLong = 1 // integral + temporal (micros / days)
  final val KindDouble = 2

  def kindOf(dt: DataType): Int = dt match {
    case ByteType | ShortType | IntegerType | LongType |
         TimestampType | TimestampNTZType | DateType => KindLong
    case FloatType | DoubleType => KindDouble
    case _ => KindNone
  }

  def trackable(name: String, dt: DataType): Boolean =
    kindOf(dt) != KindNone && name.nonEmpty &&
      !name.exists(",;:\n".contains(_))

  /** One batch's stats for one column, as decimal strings. */
  type Range = Option[(String, String)]

  def encode(cols: Seq[String], batches: Seq[Seq[Range]]): String = {
    val header = s"v1\n${cols.mkString(",")}\n"
    header + batches.map(_.map {
      case Some((mn, mx)) => s"$mn:$mx"
      case None => ""
    }.mkString(";")).mkString("\n")
  }

  final case class ZoneMap(cols: Array[String],
      batches: Array[Array[Range]]) {
    private val idx = cols.zipWithIndex.toMap
    def stat(batch: Int, col: String): Range =
      if (batch >= batches.length) None
      else idx.get(col).flatMap { i =>
        val b = batches(batch)
        if (i < b.length) b(i) else None
      }
  }

  def decode(s: String): Option[ZoneMap] = {
    val lines = s.split("\n", -1)
    if (lines.length < 2 || lines(0) != "v1") None
    else {
      // NO element filtering here: dropping a name would shift every
      // later column onto the wrong stat cell — positions are the
      // contract (trackable() already refuses unencodable names)
      val cols =
        if (lines(1).isEmpty) Array.empty[String]
        else lines(1).split(",", -1)
      val batches = lines.drop(2).map(_.split(";", -1).map { cell =>
        val i = cell.indexOf(':')
        if (i <= 0) None
        else Some((cell.substring(0, i), cell.substring(i + 1))): Range
      })
      Some(ZoneMap(cols, batches))
    }
  }

  /** Can `filter` possibly match a row of batch `batch`? Conservative:
    * unknown filters/columns/literals answer true. */
  def mayMatch(filter: Filter, schema: StructType, zm: ZoneMap,
      batch: Int): Boolean = filter match {
    case And(l, r) =>
      mayMatch(l, schema, zm, batch) && mayMatch(r, schema, zm, batch)
    case Or(l, r) =>
      mayMatch(l, schema, zm, batch) || mayMatch(r, schema, zm, batch)
    case EqualTo(a, v) => rangeTest(a, v, schema, zm, batch) {
      case (mn, mx, x) => mn <= x && x <= mx
    }
    case GreaterThan(a, v) => rangeTest(a, v, schema, zm, batch) {
      case (_, mx, x) => mx > x
    }
    case GreaterThanOrEqual(a, v) => rangeTest(a, v, schema, zm, batch) {
      case (_, mx, x) => mx >= x
    }
    case LessThan(a, v) => rangeTest(a, v, schema, zm, batch) {
      case (mn, _, x) => mn < x
    }
    case LessThanOrEqual(a, v) => rangeTest(a, v, schema, zm, batch) {
      case (mn, _, x) => mn <= x
    }
    case In(a, vs) =>
      vs.isEmpty || vs.exists(v => rangeTest(a, v, schema, zm, batch) {
        case (mn, mx, x) => mn <= x && x <= mx
      })
    // IsNull/IsNotNull/Not/strings: undecidable from min/max alone
    case _ => true
  }

  /** Evaluate `test(min, max, literal)` as BigDecimal (exact for both
    * long and double round-trips); any parse/convert failure → true. */
  private def rangeTest(col: String, v: Any, schema: StructType,
      zm: ZoneMap, batch: Int)(
      test: ((BigDecimal, BigDecimal, BigDecimal)) => Boolean): Boolean =
    zm.stat(batch, col) match {
      case None => true
      case Some((mn, mx)) =>
        val dt = schema.find(_.name == col).map(_.dataType)
        (dt, literal(dt, v)) match {
          case (Some(_), Some(x)) =>
            try test((BigDecimal(mn), BigDecimal(mx), x))
            catch { case _: NumberFormatException => true }
          case _ => true
        }
    }

  /** Per-batch row/null-count stats (footer key `graft.rowstats`) —
    * the COUNT side of aggregate pushdown, companion to the min/max
    * zone map above. Tracked for EVERY column with an encodable name
    * regardless of type (null counting is type-agnostic), so
    * `count(col)` is answerable wherever `count(*)` is.
    *
    * Encoding, line-oriented like the zone map:
    * {{{
    *   v1
    *   colA,colB            tracked column names
    *   128|0;3              batch 0: rowCount | per-column null counts
    *   97|1;0               batch 1
    * }}}
    */
  object RowStats {
    val MetaKey = "graft.rowstats"

    def trackable(name: String): Boolean =
      name.nonEmpty && !name.exists(",;:|\n".contains(_))

    def encode(cols: Seq[String], batches: Seq[(Long, Seq[Long])]): String = {
      val header = s"v1\n${cols.mkString(",")}\n"
      header + batches.map { case (rows, nulls) =>
        s"$rows|${nulls.mkString(";")}"
      }.mkString("\n")
    }

    final case class Stats(cols: Array[String],
        batches: Array[(Long, Array[Long])]) {
      private val idx = cols.zipWithIndex.toMap
      def rowCount(batch: Int): Long = batches(batch)._1
      def nullCount(batch: Int, col: String): Option[Long] =
        idx.get(col).flatMap { i =>
          val b = batches(batch)._2
          if (i < b.length) Some(b(i)) else None
        }
    }

    def decode(s: String): Option[Stats] = {
      val lines = s.split("\n", -1)
      if (lines.length < 2 || lines(0) != "v1") None
      else try {
        val cols =
          if (lines(1).isEmpty) Array.empty[String]
          else lines(1).split(",", -1)
        val batches = lines.drop(2).map { line =>
          val bar = line.indexOf('|')
          val rows = line.substring(0, bar).toLong
          val rest = line.substring(bar + 1)
          val nulls =
            if (rest.isEmpty) Array.empty[Long]
            else rest.split(";", -1).map(_.toLong)
          (rows, nulls)
        }
        Some(Stats(cols, batches))
      } catch {
        case _: NumberFormatException | _: IndexOutOfBoundsException => None
      }
    }
  }

  /** External filter literal → BigDecimal in the stat domain
    * (micros for timestamps, days for dates). None = not comparable. */
  private def literal(dt: Option[DataType], v: Any): Option[BigDecimal] = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    (dt, v) match {
      case (Some(TimestampType), t: java.sql.Timestamp) =>
        Some(BigDecimal(DateTimeUtils.fromJavaTimestamp(t)))
      case (Some(TimestampType), t: java.time.Instant) =>
        Some(BigDecimal(DateTimeUtils.instantToMicros(t)))
      case (Some(TimestampNTZType), t: java.time.LocalDateTime) =>
        Some(BigDecimal(DateTimeUtils.localDateTimeToMicros(t)))
      case (Some(DateType), d: java.sql.Date) =>
        Some(BigDecimal(DateTimeUtils.fromJavaDate(d)))
      case (Some(DateType), d: java.time.LocalDate) =>
        Some(BigDecimal(DateTimeUtils.localDateToDays(d)))
      case (_, n: java.lang.Byte) => Some(BigDecimal(n.longValue))
      case (_, n: java.lang.Short) => Some(BigDecimal(n.longValue))
      case (_, n: java.lang.Integer) => Some(BigDecimal(n.longValue))
      case (_, n: java.lang.Long) => Some(BigDecimal(n.longValue))
      case (_, n: java.lang.Float)
        if !java.lang.Float.isNaN(n) && !java.lang.Float.isInfinite(n) =>
        Some(BigDecimal(n.doubleValue))
      case (_, n: java.lang.Double)
        if !java.lang.Double.isNaN(n) && !java.lang.Double.isInfinite(n) =>
        Some(BigDecimal(n.doubleValue))
      case _ => None
    }
  }
}
