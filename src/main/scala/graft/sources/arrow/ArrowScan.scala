package graft.sources.arrow

import java.nio.channels.FileChannel
import java.nio.file.{Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.arrow.vector.ipc.ArrowFileReader
import org.apache.arrow.compression.CommonsCompressionFactory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
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
    with SupportsPushDownFilters {

  private var readSchema: StructType = schema
  private var pushed: Array[Filter] = Array.empty

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

  override def build(): Scan = {
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
      val (blocks, zoneMap) = ArrowDataSource.footerInfo(p)
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
