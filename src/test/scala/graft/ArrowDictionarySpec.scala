package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.{ArrowDataSource, ArrowOptimize}

/** The two-pass dictionary-encoding rewrite ([[ArrowOptimize]]):
  * low-cardinality string columns become int32 indices + a per-file
  * dictionary, the read path decodes transparently, footer statistics
  * survive. Pins the three claims the writer's design note makes:
  * losslessness, smaller bytes on low-cardinality strings, and the
  * cardinality cut-off leaving high-card columns plain. */
class ArrowDictionarySpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def dirSize(dir: String): Long =
    ArrowDataSource.listIpcFiles(dir).map(Files.size(_)).sum

  // orders carries two low-cardinality strings (o_orderstatus: 3,
  // o_orderpriority: 5) — the dictionary sweet spot
  private lazy val dirs: (String, String) = {
    val plain = Files.createTempDirectory("dict_plain").toString
    val opt = Files.createTempDirectory("dict_opt").toString
    Tables.orders(spark, TestSession.Sf)
      .write.format("arrow").option("batchRows", 500)
      .mode("overwrite").save(plain)
    ArrowOptimize.dictionaryEncode(spark, plain, opt)
    (plain, opt)
  }

  test("dictionary-encoded files round-trip bit-identically") {
    val (plain, opt) = dirs
    val a = spark.read.format("arrow").load(plain)
    val b = spark.read.format("arrow").load(opt)
    assert(a.schema == b.schema,
      s"schema changed: ${a.schema} vs ${b.schema}")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(b.count() == Tables.orders(spark, TestSession.Sf).count())
  }

  test("low-cardinality strings shrink the file") {
    val (plain, opt) = dirs
    val (szPlain, szOpt) = (dirSize(plain), dirSize(opt))
    assert(szOpt < szPlain,
      s"dictionary encoding grew the data: $szOpt vs $szPlain")
  }

  test("pushed filters and aggregate pushdown still work on encoded files") {
    val (_, opt) = dirs
    // row-level filter on a dictionary-encoded column
    val urgent = spark.read.format("arrow").load(opt)
      .filter(col("o_orderpriority") === "1-URGENT")
    val expected = Tables.orders(spark, TestSession.Sf)
      .filter(col("o_orderpriority") === "1-URGENT").count()
    assert(urgent.count() == expected)
    // footer stats survived the rewrite: MIN/MAX/COUNT stay
    // metadata-only
    val agg = spark.read.format("arrow").load(opt)
      .agg(min(col("o_orderkey")).as("mn"), count(lit(1)).as("n"))
    assert(agg.queryExecution.executedPlan.toString
      .contains("graft-arrow-agg"))
    val before = ArrowDataSource.recordBatchesLoaded.get()
    val r = agg.collect()(0)
    assert(ArrowDataSource.recordBatchesLoaded.get() == before)
    assert(r.getLong(1) == Tables.orders(spark, TestSession.Sf).count())
  }

  test("dictionary decode is lazy: one materialization per file+column") {
    val plain = Files.createTempDirectory("dictlazy_plain").toString
    val opt = Files.createTempDirectory("dictlazy_opt").toString
    Tables.orders(spark, TestSession.Sf).repartition(1)
      .write.format("arrow").option("batchRows", 250)
      .mode("overwrite").save(plain)
    ArrowOptimize.dictionaryEncode(spark, plain, opt)
    val nBatches = ArrowDataSource.recordBlockSizes(
      ArrowDataSource.listIpcFiles(opt).head).length
    assert(nBatches >= 4, s"want a multi-batch file, got $nBatches")
    val before = ArrowDataSource.dictMaterializations.get()
    val got = spark.read.format("arrow").load(opt)
      .groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val used = ArrowDataSource.dictMaterializations.get() - before
    // one file, one dictionary column projected → one value-array
    // materialization regardless of batch count (the eager decode
    // this replaced allocated one full vector per batch)
    assert(used == 1, s"expected 1 dictionary materialization " +
      s"for 1 file x 1 column over $nBatches batches, got $used")
    val expected = Tables.orders(spark, TestSession.Sf)
      .groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("the cardinality cut-off leaves high-card columns plain") {
    val plain = Files.createTempDirectory("dictcut_plain").toString
    val opt = Files.createTempDirectory("dictcut_opt").toString
    Tables.documents(spark, TestSession.Sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .write.format("arrow").mode("overwrite").save(plain)
    // cut below the text cardinality but above lang's
    ArrowOptimize.dictionaryEncode(spark, plain, opt, maxCardinality = 50)
    val f = ArrowDataSource.listIpcFiles(opt).head
    val ch = java.nio.channels.FileChannel.open(Paths.get(f.toString),
      java.nio.file.StandardOpenOption.READ)
    val reader = new org.apache.arrow.vector.ipc.ArrowFileReader(ch,
      ArrowDataSource.allocator)
    try {
      val fields = reader.getVectorSchemaRoot.getSchema.getFields
      val byName = (0 until fields.size())
        .map(i => fields.get(i).getName -> fields.get(i)).toMap
      assert(byName("lang").getDictionary != null,
        "low-cardinality lang should be dictionary-encoded")
      assert(byName("text").getDictionary == null,
        "high-cardinality text must stay plain past the cut-off")
    } finally { reader.close(); ch.close() }
    // and the mixed layout still round-trips
    val a = spark.read.format("arrow").load(plain)
    val b = spark.read.format("arrow").load(opt)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
