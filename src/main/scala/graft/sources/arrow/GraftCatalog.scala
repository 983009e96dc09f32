package graft.sources.arrow

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** The shared bucket function of the Arrow source's bucketed layout.
  *
  * One definition serves BOTH halves of storage-partitioned join:
  * the writer routes each row to `id(hash(key), n)` and records the id
  * in the file footer, and the same arithmetic is exposed to Catalyst
  * as the V2 `ScalarFunction` behind the scan's reported
  * `bucket(n, col)` transform — so Spark can (a) prove two graft
  * tables bucketed with equal `n` are co-partitioned (equal keys hash
  * to equal ids by construction) and (b) evaluate the function itself
  * if it ever needs to shuffle a non-bucketed side to match.
  *
  * The hash is Murmur3 over the key's 64-bit widening (or UTF-8
  * bytes), seed 42 — self-contained so the on-disk layout contract
  * never drifts with Spark-internal hash changes.
  */
object GraftBucket {
  val Seed = 42

  /** Key types the bucketed layout supports (join keys, in practice). */
  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType => true
    case _ => false
  }

  def hashLong(v: Long): Int = Murmur3_x86_32.hashLong(v, Seed)

  def hashString(s: UTF8String): Int =
    Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
      s.numBytes(), Seed)

  /** Bucket id of the key at `ord` in `row`; null keys go to bucket 0
    * (any fixed placement is consistent between writer and function). */
  def idOf(dt: DataType, row: org.apache.spark.sql.catalyst.expressions.SpecializedGetters,
      ord: Int, n: Int): Int = {
    if (row.isNullAt(ord)) return 0
    val h = dt match {
      case ByteType => hashLong(row.getByte(ord).toLong)
      case ShortType => hashLong(row.getShort(ord).toLong)
      case IntegerType => hashLong(row.getInt(ord).toLong)
      case LongType => hashLong(row.getLong(ord))
      case StringType => hashString(row.getUTF8String(ord))
      case other => throw new UnsupportedOperationException(
        s"graft bucket key type $other")
    }
    Math.floorMod(h, n)
  }

  // footer metadata keys the writer records and the scan reads
  val MetaCol = "graft.bucket.col"
  val MetaN = "graft.bucket.n"
  val MetaId = "graft.bucket.id"
}

/** Sorted-layout stamp: `option("sortBy", col)` makes the writer VERIFY
  * (not trust) that each file's rows arrive ascending NULLS FIRST on
  * `col` — Spark's default ordering, `sortWithinPartitions(col)`
  * upstream produces exactly it — and stamp the footer only when the
  * whole file held the order. [[ArrowScan]] turns unanimous stamps into
  * a reported V2 ordering, which is what lets a bucketed+sorted
  * equi-join plan sort-merge with NEITHER exchanges NOR sorts. */
object GraftSort {
  val MetaCol = "graft.sort.col"

  /** Order-trackable types: the integral/temporal family (compared as
    * long) and strings (compared as UTF-8 bytes — Spark's own binary
    * string ordering). */
  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | StringType => true
    case _ => false
  }
}

/** `bucket(numBuckets, col)` as a Spark V2 function — what
  * `V2ExpressionUtils` loads (by the fixed name `bucket`, empty
  * namespace) when it resolves the scan's reported
  * `KeyGroupedPartitioning` transform. */
class GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col): graft arrow bucketed-layout hash bucket id"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (numBuckets, col), got ${inputType.simpleString}")
    val keyType = inputType.fields(1).dataType
    require(GraftBucket.supported(keyType),
      s"graft bucket does not support key type ${keyType.simpleString}")
    new GraftBucketBound(keyType)
  }
}

class GraftBucketBound(keyType: DataType) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  // equality of canonicalName across two scans is what lets Spark
  // prove co-partitioning; key the name on the bound input type
  override def canonicalName(): String = s"graft.bucket(${keyType.sql})"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer =
    GraftBucket.idOf(keyType, input, 1, input.getInt(0))
}

/** Minimal V2 catalog exposing Arrow IPC directories as tables and the
  * graft bucket function — the piece that turns the Arrow source's
  * bucketed layout into exchange-free storage-partitioned joins.
  *
  * Catalyst only resolves a non-identity partition transform
  * (`bucket(n, col)`) through the relation's `FunctionCatalog`
  * (`V2ExpressionUtils.loadV2FunctionOpt`), and path-based
  * `spark.read.format(...)` relations carry no catalog — so bucketed
  * reads go through here instead:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     classOf[GraftCatalog].getName)
  *   spark.table(s"graft.arrow.`$dir`")   // namespace arrow, name = path
  * }}}
  *
  * Tables are identified by filesystem path; the catalog is read-only
  * (writes keep using `df.write.format("arrow")`).
  */
class GraftCatalog extends TableCatalog with FunctionCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {
  private var catalogName: String = "graft"

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = { catalogName = name }

  override def name(): String = catalogName

  /** Maintenance verbs as SQL:
    * `CALL graft.system.vacuum(path => '/data', grace_ms => 0)` —
    * see [[GraftProcedures]]. */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures
        .UnboundProcedure =
    GraftProcedures.all.getOrElse(ident.name,
      throw new RuntimeException(
        s"graft: no procedure ${ident.name}; have " +
          GraftProcedures.all.keys.toSeq.sorted.mkString(", ")))

  override def listProcedures(namespace: Array[String])
      : Array[Identifier] =
    GraftProcedures.all.keys.toArray.sorted
      .map(Identifier.of(Array("system"), _))

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty

  override def loadTable(ident: Identifier): Table = {
    val path = ident.name
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident)
    val opts = new CaseInsensitiveStringMap(Map("path" -> path).asJava)
    val provider = new ArrowDataSource
    val schema = provider.inferSchema(opts)
    new ArrowTable(schema, Map("path" -> path), Array.empty)
  }

  /** `VERSION AS OF <epoch>` over a streaming-sink directory: versions
    * are the sink's committed epochs (the commit log keeps per-epoch
    * attribution through snapshot compaction), so
    * `SELECT ... FROM graft.arrow.`dir` VERSION AS OF 3` reads exactly
    * the files epochs 0..3 committed. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val path = ident.name
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident)
    // named refs first (Iceberg's tags): `VERSION AS OF 'v1-training'`
    // resolves through the table's _tags file, numbers stay epochs
    val epoch = try version.toLong catch {
      case _: NumberFormatException =>
        val root = java.nio.file.Paths.get(path)
          .toAbsolutePath.normalize
        ArrowDataSource.tags(root).getOrElse(version,
          throw new IllegalArgumentException(
            s"graft arrow: '$version' is neither an epoch number nor " +
              s"a tag of $path (tags: " +
              s"${ArrowDataSource.tags(root).keys.toSeq.sorted
                .mkString(", ")})"))
    }
    val opts = new CaseInsensitiveStringMap(Map("path" -> path).asJava)
    val schema = new ArrowDataSource().inferSchema(opts)
    new ArrowTable(schema,
      Map("path" -> path, "epochAsOf" -> epoch.toString), Array.empty)
  }

  /** `TIMESTAMP AS OF <ts>` — Spark hands the literal as MICROseconds
    * since the epoch; resolve it against the log's commit stamps
    * (greatest epoch at or before the instant, Delta's contract) and
    * travel to that epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val path = ident.name
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident)
    val millis = Math.floorDiv(timestamp, 1000L)
    val epoch = ArrowDataSource.epochForTimestamp(
      java.nio.file.Paths.get(path).toAbsolutePath.normalize, millis)
    val opts = new CaseInsensitiveStringMap(Map("path" -> path).asJava)
    val schema = new ArrowDataSource().inferSchema(opts)
    new ArrowTable(schema,
      Map("path" -> path, "epochAsOf" -> epoch.toString), Array.empty)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft catalog is read-only; write with df.write.format(\"arrow\")")

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "bucket"))

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace.isEmpty && ident.name == "bucket")
      new GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)
}
