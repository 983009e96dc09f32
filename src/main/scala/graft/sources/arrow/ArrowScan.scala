package graft.sources.arrow

import java.nio.channels.FileChannel
import java.nio.file.{Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.arrow.vector.ipc.ArrowFileReader
import org.apache.arrow.compression.CommonsCompressionFactory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnarBatch, ColumnVector}

/** Scan pipeline for the Arrow IPC source.
  *
  * Column pruning (`SupportsPushDownRequiredColumns`) is the essence of
  * a columnar storage engine: only requested fields are materialized —
  * Arrow IPC lays each column in separate buffers, so unrequested
  * columns are never even wrapped (the loaded record batch is shared,
  * but Spark only sees pruned vectors, and the filter/projection work
  * never touches them).
  *
  * Filter pushdown (`SupportsPushDownFilters`) claims the predicates
  * [[FilterEval]] can evaluate and applies them inside the reader; when
  * no filters are pushed the scan stays fully columnar
  * (PartitionReader[ColumnarBatch] of zero-copy ArrowColumnVectors).
  */
class ArrowScanBuilder(path: String, schema: StructType,
    maxSplitBytes: Long = 128L * 1024 * 1024)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {

  private var readSchema: StructType = schema
  private var pushed: Array[Filter] = Array.empty
  // Set when pushAggregation accepted: the agg output schema plus the
  // per-file partial rows, already computed from footers on the driver.
  private var aggResult: Option[(StructType, Seq[Array[Any]])] = None

  override def pruneColumns(required: StructType): Unit = {
    // Preserve file field order for stable reader ordinals.
    val requested = required.fieldNames.toSet
    readSchema = StructType(schema.fields.filter(f => requested(f.name)))
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (claimed, residual) =
      filters.partition(f => FilterEval.supported(schema, f))
    pushed = claimed
    residual // Catalyst keeps evaluating these above the scan.
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** MIN/MAX/COUNT answered from footer statistics — the same
    * planning-time trick the parquet path plays with row-group stats
    * (AggPushdownSpec), applied to the namesake Arrow source: the
    * writer already persists per-batch min/max ([[ZoneMaps]]) and
    * row/null counts ([[ZoneMaps.RowStats]]) in the IPC footer, so a
    * global MIN/MAX/COUNT never touches a data batch. At 100 TB this
    * is the difference between a metadata pass over footers and a full
    * scan.
    *
    * Supported: no grouping, no pushed filters (stats describe the
    * unfiltered file), MIN/MAX on integral/temporal columns (floats
    * excluded — a NaN-poisoned batch has no stats and NaN ordering
    * cannot be reconstructed from min/max), COUNT(*) and
    * COUNT(col) non-distinct on any tracked column. Partial pushdown:
    * each file contributes one row of partials; Spark's final
    * aggregate merges min-of-mins / sum-of-counts, so multi-file
    * scans parallelize the (tiny) merge and empty inputs keep exact
    * COUNT=0 semantics. Any file missing the needed stats rejects the
    * pushdown entirely and the query falls back to the ordinary
    * columnar scan — stats are an optimization, never a correctness
    * surface. */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (pushed.nonEmpty || aggregation.groupByExpressions.nonEmpty)
      return false

    // Translate each agg func to (output field, per-file evaluator).
    sealed trait Op
    final case class MinOp(col: String, dt: DataType) extends Op
    final case class MaxOp(col: String, dt: DataType) extends Op
    final case class CountCol(col: String) extends Op
    case object CountAll extends Op

    def singleCol(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case r: NamedReference if r.fieldNames.length == 1 =>
        Some(r.fieldNames.head)
      case _ => None
    }
    def minMaxable(name: String): Option[DataType] =
      schema.find(_.name == name).map(_.dataType)
        .filter(dt => ZoneMaps.kindOf(dt) == ZoneMaps.KindLong)

    val ops = aggregation.aggregateExpressions.map {
      case m: Min => singleCol(m.column)
        .flatMap(c => minMaxable(c).map(MinOp(c, _)))
      case m: Max => singleCol(m.column)
        .flatMap(c => minMaxable(c).map(MaxOp(c, _)))
      case c: Count if !c.isDistinct => singleCol(c.column).map(CountCol(_))
      case _: CountStar => Some(CountAll)
      case _ => None
    }
    if (ops.exists(_.isEmpty)) return false
    val resolved = ops.map(_.get)

    // Evaluate every file from its footer; any gap rejects the push.
    // KindLong stats are exact long strings (internal micros/days for
    // temporals), so Long arithmetic is lossless end-to-end.
    def internalValue(v: Long, dt: DataType): Any = dt match {
      case ByteType => v.toByte
      case ShortType => v.toShort
      case IntegerType | DateType => v.toInt
      case _ => v
    }
    // A tracked integral column's batch stat is None iff the batch is
    // all-null there (no NaN poisoning for KindLong), so skipping
    // statless batches is exactly MIN/MAX's null-ignoring semantics.
    def minMaxFromZm(info: ArrowDataSource.FooterInfo, c: String,
        dt: DataType, nBatches: Int, pickMin: Boolean)
        : Either[Unit, Any] =
      info.zoneMap match {
        case Some(zm) if zm.batches.length == nBatches &&
            zm.cols.contains(c) =>
          val vals = (0 until nBatches).flatMap(b => zm.stat(b, c))
            .map(r => (if (pickMin) r._1 else r._2).toLong)
          if (vals.isEmpty) Right(null)
          else Right(internalValue(
            if (pickMin) vals.min else vals.max, dt))
        case _ => Left(())
      }

    val files = ArrowDataSource.listIpcFiles(path)
    val rows = files.map { f =>
      val info = ArrowDataSource.footerInfo(f)
      val nBatches = info.sizes.length
      val row = new Array[Any](resolved.length)
      var ok = true
      resolved.zipWithIndex.foreach { case (op, i) =>
        if (ok) op match {
          case CountAll => info.rowStats match {
            case Some(rs) if rs.batches.length == nBatches =>
              row(i) = (0 until nBatches).map(rs.rowCount).sum
            case _ => ok = false
          }
          case CountCol(c) => info.rowStats match {
            case Some(rs) if rs.batches.length == nBatches &&
                rs.cols.contains(c) =>
              row(i) = (0 until nBatches)
                .map(b => rs.rowCount(b) - rs.nullCount(b, c).get).sum
            case _ => ok = false
          }
          case MinOp(c, dt) =>
            minMaxFromZm(info, c, dt, nBatches, pickMin = true) match {
              case Right(v) => row(i) = v
              case Left(()) => ok = false
            }
          case MaxOp(c, dt) =>
            minMaxFromZm(info, c, dt, nBatches, pickMin = false) match {
              case Right(v) => row(i) = v
              case Left(()) => ok = false
            }
        }
      }
      if (ok) Some(row) else None
    }

    if (rows.exists(_.isEmpty)) return false

    val outFields = resolved.map {
      case MinOp(c, dt) => StructField(s"min($c)", dt)
      case MaxOp(c, dt) => StructField(s"max($c)", dt)
      case CountCol(c) => StructField(s"count($c)", LongType)
      case CountAll => StructField("count(*)", LongType)
    }
    aggResult = Some((StructType(outFields), rows.map(_.get)))
    true
  }

  override def build(): Scan = {
    aggResult match {
      case Some((aggSchema, rows)) =>
        return new ArrowAggScan(path, aggSchema, rows)
      case None => ()
    }
    // The reader must see every column a pushed filter references even
    // when the projection pruned it away (e.g. count(*) over a filter).
    val filterRefs = pushed.flatMap(_.references).toSet
    val have = readSchema.fieldNames.toSet
    val withRefs = StructType(readSchema.fields ++
      schema.fields.filter(f => filterRefs(f.name) && !have(f.name)))
    new ArrowScan(path, withRefs, pushed, maxSplitBytes)
  }
}

class ArrowScan(path: String, schema: StructType, filters: Array[Filter],
    maxSplitBytes: Long = 128L * 1024 * 1024)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-arrow $path pruned=[${schema.fieldNames.mkString(",")}] " +
      s"pushed=[${filters.mkString(",")}]"

  /** Split every IPC file at record-batch boundaries using the footer's
    * block metadata, packing consecutive batches up to ~128 MB per
    * split. Scan parallelism therefore tracks data volume (as with
    * parquet row groups), not file count — one huge file no longer
    * serializes onto one task.
    *
    * Before packing, pushed filters are tested against the file's zone
    * map ([[ZoneMaps]], written into the footer by our writer): a
    * record batch whose per-column [min,max] provably cannot satisfy
    * the filters never becomes part of any split. Pruning is
    * conservative and purely an optimization — surviving batches still
    * evaluate the filters row-level in the reader. */
  override def planInputPartitions(): Array[InputPartition] = {
    ArrowDataSource.listIpcFiles(path).flatMap { p =>
      val info = ArrowDataSource.footerInfo(p)
      val (blocks, zoneMap) = (info.sizes, info.zoneMap)
      if (blocks.isEmpty) Seq(ArrowFilePartition(p.toString, Array.empty))
      else {
        val keep: Int => Boolean =
          if (filters.isEmpty) _ => true
          else zoneMap match {
            case Some(zm) if zm.batches.length == blocks.length =>
              idx => filters.forall(ZoneMaps.mayMatch(_, schema, zm, idx))
            case _ => _ => true
          }
        val splits = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
        var current = scala.collection.mutable.ArrayBuffer.empty[Int]
        var bytes = 0L
        for ((size, idx) <- blocks.zipWithIndex if keep(idx)) {
          if (current.nonEmpty && bytes + size > maxSplitBytes) {
            splits += current.toArray
            current = scala.collection.mutable.ArrayBuffer.empty[Int]
            bytes = 0L
          }
          current += idx
          bytes += size
        }
        if (current.nonEmpty) splits += current.toArray
        splits.map(idxs => ArrowFilePartition(p.toString, idxs))
      }
    }.map(p => p: InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ArrowReaderFactory(schema, filters)
}

/** One scan split: a file plus the footer indices of the record batches
  * it covers (empty = whole file, used for block-less empty files). */
case class ArrowFilePartition(file: String, blockIdxs: Array[Int])
  extends InputPartition

class ArrowReaderFactory(schema: StructType, filters: Array[Filter])
    extends PartitionReaderFactory {

  // Columnar only when nothing needs row-at-a-time filtering.
  override def supportColumnarReads(partition: InputPartition): Boolean =
    filters.isEmpty

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ArrowFilePartition]
    new ArrowRowReader(p, schema, filters)
  }

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[ColumnarBatch] = {
    val p = partition.asInstanceOf[ArrowFilePartition]
    new ArrowBatchReader(p, schema)
  }
}

/** Shared reader mechanics: iterate this split's record batches,
  * exposing each as a ColumnarBatch of the pruned columns. */
private[arrow] abstract class ArrowReaderBase(partition: ArrowFilePartition,
    schema: StructType) {
  protected val channel: FileChannel =
    FileChannel.open(Paths.get(partition.file), StandardOpenOption.READ)
  protected val reader: ArrowFileReader =
    new ArrowFileReader(channel, ArrowDataSource.allocator,
      CommonsCompressionFactory.INSTANCE)
  protected val root = reader.getVectorSchemaRoot
  private val ordinals: Array[Int] = {
    val fileFields = root.getSchema.getFields.asScala.map(_.getName)
    schema.fieldNames.map(n => fileFields.indexOf(n))
  }
  private val blocks = reader.getRecordBlocks
  private var cursor = 0

  private def loadNext(): Boolean =
    if (cursor >= partition.blockIdxs.length) false
    else {
      val ok = reader.loadRecordBatch(blocks.get(partition.blockIdxs(cursor)))
      cursor += 1
      ArrowDataSource.recordBatchesLoaded.incrementAndGet()
      ok
    }

  protected def nextBatch(): Option[ColumnarBatch] =
    if (!loadNext()) None
    else {
      val vectors: Array[ColumnVector] = ordinals.map(i =>
        new ArrowColumnVector(root.getVector(i)): ColumnVector)
      Some(new ColumnarBatch(vectors, root.getRowCount))
    }

  def closeAll(): Unit = { reader.close(); channel.close() }
}

class ArrowBatchReader(partition: ArrowFilePartition, schema: StructType)
    extends ArrowReaderBase(partition, schema)
    with PartitionReader[ColumnarBatch] {
  private var current: ColumnarBatch = _
  override def next(): Boolean = nextBatch() match {
    case Some(b) => current = b; true
    case None => false
  }
  override def get(): ColumnarBatch = current
  override def close(): Unit = closeAll()
}

/** Scan produced when an aggregate was pushed: emits the per-file
  * partial rows precomputed from footer statistics — no data batch is
  * ever opened (ArrowAggPushdownSpec pins this via
  * [[ArrowDataSource.recordBatchesLoaded]]). Spark plans the final
  * merge aggregate (min-of-mins / sum-of-counts) above this scan. */
class ArrowAggScan(path: String, aggSchema: StructType,
    rows: Seq[Array[Any]]) extends Scan with Batch {
  override def readSchema(): StructType = aggSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-arrow-agg $path stats=[${aggSchema.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(ArrowAggPartition(rows.toArray))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition)
          : PartitionReader[InternalRow] = {
        val vals = partition.asInstanceOf[ArrowAggPartition].rows
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < vals.length }
          override def get(): InternalRow =
            new GenericInternalRow(vals(i))
          override def close(): Unit = ()
        }
      }
    }
}

/** All per-file partial rows ride in one tiny partition (one row per
  * file; values are boxed primitives/null). */
case class ArrowAggPartition(rows: Array[Array[Any]])
  extends InputPartition

class ArrowRowReader(partition: ArrowFilePartition, schema: StructType,
    filters: Array[Filter])
    extends ArrowReaderBase(partition, schema)
    with PartitionReader[InternalRow] {
  private val predicate: InternalRow => Boolean =
    if (filters.isEmpty) _ => true
    else {
      val compiled = filters.map(FilterEval.compile(schema, _))
      row => compiled.forall(_(row))
    }
  private var rows: java.util.Iterator[InternalRow] =
    java.util.Collections.emptyIterator()
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (true) {
      while (rows.hasNext) {
        val r = rows.next()
        if (predicate(r)) { current = r; return true }
      }
      nextBatch() match {
        case Some(b) => rows = b.rowIterator()
        case None => return false
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = closeAll()
}
