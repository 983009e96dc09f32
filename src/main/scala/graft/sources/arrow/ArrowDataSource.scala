package graft.sources.arrow

import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowFileReader
import org.apache.arrow.compression.CommonsCompressionFactory
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Arrow IPC file DataSource V2 — the reference's namesake capability
  * (an Arrow columnar storage engine,
  * `/root/reference/CMakeLists.txt:2,103`) re-expressed as a Spark
  * source/sink:
  *
  * {{{
  *   df.write.format("arrow").option("codec", "zstd").save(dir)
  *   spark.read.format("arrow").load(dir)
  * }}}
  *
  * Read path: one InputPartition per IPC file (parallelism = file
  * count, as with parquet), column pruning materializes only requested
  * vectors, pushed filters evaluate inside the reader, and unfiltered
  * scans hand Spark zero-copy columnar batches. Write path: one writer
  * per task, record batches of bounded size, optional lz4/zstd buffer
  * compression.
  */
class ArrowDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "arrow"

  override def supportsExternalMetadata(): Boolean = true

  private def paths(options: CaseInsensitiveStringMap): Seq[Path] = {
    val p = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("arrow source requires a path"))
    ArrowDataSource.listIpcFiles(p)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = paths(options)
    require(files.nonEmpty, s"no .arrow files under ${options.get("path")}")
    ArrowDataSource.readFooterSchema(files.head)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new ArrowTable(schema, properties.asScala.toMap)
}

class ArrowTable(schema: StructType, properties: Map[String, String])
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String =
    s"arrow:${properties.getOrElse("path", "?")}"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val path = Option(options.get("path"))
      .orElse(properties.get("path"))
      .getOrElse(throw new IllegalArgumentException("arrow: path required"))
    val maxSplitBytes = Option(options.get("maxSplitBytes")).map(_.toLong)
      .getOrElse(128L * 1024 * 1024)
    new ArrowScanBuilder(path, schema, maxSplitBytes)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val path = Option(info.options.get("path"))
      .orElse(properties.get("path"))
      .getOrElse(throw new IllegalArgumentException("arrow: path required"))
    new ArrowWriteBuilder(path, info.schema(),
      Option(info.options.get("codec")),
      Option(info.options.get("batchRows")).map(_.toInt).getOrElse(8192))
  }
}

object ArrowDataSource {
  /** Process-wide allocator (Arrow vectors allocate off-heap; one root
    * per executor JVM, children per reader/writer). */
  lazy val allocator: RootAllocator = new RootAllocator(Long.MaxValue)

  def listIpcFiles(dir: String): Seq[Path] = {
    val p = Paths.get(dir)
    if (Files.isRegularFile(p)) Seq(p)
    else if (!Files.exists(p)) Seq.empty
    else Files.list(p).iterator.asScala
      .filter(f => f.getFileName.toString.endsWith(".arrow"))
      .toSeq.sortBy(_.toString)
  }

  def readFooterSchema(file: Path): StructType = {
    val ch = FileChannel.open(file, StandardOpenOption.READ)
    val reader = new ArrowFileReader(ch, allocator,
      CommonsCompressionFactory.INSTANCE)
    try ArrowSchemas.fromArrowSchema(reader.getVectorSchemaRoot.getSchema)
    finally { reader.close(); ch.close() }
  }

  /** Per-record-batch on-disk sizes (metadata+body) from the IPC footer
    * — the split planner's input; reads only the footer, no batch data. */
  def recordBlockSizes(file: Path): Seq[Long] = {
    val ch = FileChannel.open(file, StandardOpenOption.READ)
    val reader = new ArrowFileReader(ch, allocator,
      CommonsCompressionFactory.INSTANCE)
    try {
      reader.getVectorSchemaRoot // forces footer read
      reader.getRecordBlocks.asScala
        .map(b => b.getMetadataLength.toLong + b.getBodyLength).toSeq
    } finally { reader.close(); ch.close() }
  }

  /** The file's zone map from the IPC footer custom metadata, if our
    * writer recorded one (see [[ZoneMaps]]). Footer-only read. */
  def zoneMap(file: Path): Option[ZoneMaps.ZoneMap] = footerInfo(file).zoneMap

  /** Everything the planner wants from one IPC footer: per-batch block
    * sizes, the min/max zone map, and the row/null-count stats. One
    * footer read — each open re-parses the footer. */
  final case class FooterInfo(sizes: Seq[Long],
      zoneMap: Option[ZoneMaps.ZoneMap],
      rowStats: Option[ZoneMaps.RowStats.Stats])

  def footerInfo(file: Path): FooterInfo = {
    val ch = FileChannel.open(file, StandardOpenOption.READ)
    val reader = new ArrowFileReader(ch, allocator,
      CommonsCompressionFactory.INSTANCE)
    try {
      reader.getVectorSchemaRoot // forces footer read
      val sizes = reader.getRecordBlocks.asScala
        .map(b => b.getMetadataLength.toLong + b.getBodyLength).toSeq
      val zm = Option(reader.getMetaData.get(ZoneMaps.MetaKey))
        .flatMap(ZoneMaps.decode)
      val rs = Option(reader.getMetaData.get(ZoneMaps.RowStats.MetaKey))
        .flatMap(ZoneMaps.RowStats.decode)
      FooterInfo(sizes, zm, rs)
    } finally { reader.close(); ch.close() }
  }

  /** Process-wide count of record batches actually loaded from disk —
    * a test hook: metadata-only paths (aggregate pushdown, zone-map
    * pruning specs) assert this does not move. */
  val recordBatchesLoaded = new java.util.concurrent.atomic.AtomicLong(0)
}
