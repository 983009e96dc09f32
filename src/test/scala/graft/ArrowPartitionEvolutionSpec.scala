package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.ArrowDataSource

/** Partition evolution (`CALL graft.system.set_partitioning`):
  * mixed-generation reads stay exact (path XOR bytes per column),
  * pruning applies to the generations that expose the layout,
  * writers route by the recorded spec, and DML on evolved columns
  * goes copy-on-write instead of a wrong metadata unlink. */
class ArrowPartitionEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private def tmpDir(): String =
    Files.createTempDirectory("part_evolve").toString

  private def bagEqual(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Boolean = {
    // exceptAll is positional; evolution reorders the table schema
    // (partition columns last) — align on b's column order by name
    val aa = a.select(b.columns.map(col).toIndexedSeq: _*)
    aa.exceptAll(b).isEmpty && b.exceptAll(aa).isEmpty
  }

  private def setPartitioning(path: String, cols: String): Unit = {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.arrow.GraftCatalog].getName)
    spark.sql("CALL graft.system.set_partitioning(path => " +
      s"'$path', cols => '$cols')").collect()
    ()
  }

  test("flat table evolves: old generation reads from bytes, new " +
      "generation prunes by path, mixed results are exact") {
    val dir = tmpDir()
    val o = Tables.orders(spark, TestSession.Sf)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"))
    o.filter(col("o_orderkey") <= 700)
      .write.format("arrow").mode("overwrite").save(dir)
    setPartitioning(dir, "o_orderstatus")
    // plain append — no partitionBy named — must route by the spec.
    // Path-based V2 appends resolve BY POSITION, and evolution moves
    // the partition column to the table schema's tail: present
    // columns in table order (the contract any position-based writer
    // already lives by).
    val tableOrder = spark.read.format("arrow").load(dir)
      .schema.fieldNames.toSeq
    o.filter(col("o_orderkey") > 700)
      .select(tableOrder.map(col): _*)
      .write.format("arrow").mode("append").save(dir)
    val statusDirs = Files.list(java.nio.file.Paths.get(dir))
    val dirNames = try {
      import scala.jdk.CollectionConverters._
      statusDirs.iterator().asScala.map(_.getFileName.toString).toSet
    } finally statusDirs.close()
    assert(dirNames.exists(_.startsWith("o_orderstatus=")),
      s"append did not route by the recorded spec: $dirNames")
    val back = spark.read.format("arrow").load(dir)
    // schema: the evolved column surfaces exactly once
    assert(back.schema.fieldNames.count(_ == "o_orderstatus") == 1)
    assert(bagEqual(back, o), "mixed-generation read drifted")
    // filter across generations: exact rows from BOTH
    val f = back.filter(col("o_orderstatus") === "F")
    assert(bagEqual(f, o.filter(col("o_orderstatus") === "F")),
      "filtered mixed-generation read drifted")
    // pruning: the new generation's non-F files never load, the old
    // generation's files still do
    // SUM, not COUNT: COUNT answers from footer stats (0 batches)
    val before = ArrowDataSource.recordBatchesLoaded.get()
    f.agg(sum(col("o_totalprice"))).collect()
    val loadedF = ArrowDataSource.recordBatchesLoaded.get() - before
    val before2 = ArrowDataSource.recordBatchesLoaded.get()
    back.agg(sum(col("o_totalprice"))).collect()
    val loadedAll = ArrowDataSource.recordBatchesLoaded.get() - before2
    assert(loadedF < loadedAll,
      s"status filter pruned nothing: $loadedF vs $loadedAll batches")
  }

  test("spec change A->B: each generation prunes on its own layout") {
    val dir = tmpDir()
    val o = Tables.orders(spark, TestSession.Sf)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_orderpriority"), col("o_totalprice"))
    o.filter(col("o_orderkey") <= 700)
      .write.format("arrow").partitionBy("o_orderstatus")
      .mode("overwrite").save(dir)
    setPartitioning(dir, "o_orderpriority")
    val tableOrder = spark.read.format("arrow").load(dir)
      .schema.fieldNames.toSeq
    o.filter(col("o_orderkey") > 700)
      .select(tableOrder.map(col): _*)
      .write.format("arrow").mode("append").save(dir)
    val back = spark.read.format("arrow").load(dir)
    assert(bagEqual(back, o), "A->B mixed read drifted")
    for (c <- Seq("o_orderstatus", "o_orderpriority")) {
      val v = o.select(col(c)).distinct().orderBy(col(c))
        .collect()(0).getString(0)
      assert(bagEqual(back.filter(col(c) === v),
        o.filter(col(c) === v)), s"filter on $c drifted")
    }
  }

  test("recorded type is authoritative: a long partition column " +
      "keeps LongType across generations") {
    val dir = tmpDir()
    val o = Tables.orders(spark, TestSession.Sf)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"))
    o.filter(col("o_orderkey") <= 700)
      .write.format("arrow").mode("overwrite").save(dir)
    setPartitioning(dir, "o_custkey")
    val tableOrder = spark.read.format("arrow").load(dir)
      .schema.fieldNames.toSeq
    o.filter(col("o_orderkey") > 700)
      .select(tableOrder.map(col): _*)
      .write.format("arrow").mode("append").save(dir)
    val back = spark.read.format("arrow").load(dir)
    assert(back.schema("o_custkey").dataType == LongType)
    val got = back.agg(sum(col("o_custkey"))).collect()(0).getLong(0)
    val exp = o.agg(sum(col("o_custkey"))).collect()(0).getLong(0)
    assert(got == exp, s"o_custkey sum drifted: $got vs $exp")
  }

  test("DELETE on an evolved column removes rows from BOTH " +
      "generations (copy-on-write, never a wrong metadata unlink)") {
    val dir = tmpDir()
    val o = Tables.orders(spark, TestSession.Sf)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"))
    o.filter(col("o_orderkey") <= 700)
      .write.format("arrow").mode("overwrite").save(dir)
    setPartitioning(dir, "o_orderstatus")
    val tableOrder = spark.read.format("arrow").load(dir)
      .schema.fieldNames.toSeq
    o.filter(col("o_orderkey") > 700)
      .select(tableOrder.map(col): _*)
      .write.format("arrow").mode("append").save(dir)
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.arrow.GraftCatalog].getName)
    spark.sql(s"DELETE FROM graft.arrow.`$dir` " +
      "WHERE o_orderstatus = 'P'").collect()
    val back = spark.read.format("arrow").load(dir)
    assert(bagEqual(back, o.filter(col("o_orderstatus") =!= "P")),
      "evolved-column DELETE left or lost rows")
  }

  test("refusals: unknown column, empty table, bucketed layout, " +
      "streaming sink") {
    val dir = tmpDir()
    Tables.orders(spark, TestSession.Sf)
      .select(col("o_orderkey"), col("o_orderstatus"))
      .write.format("arrow").mode("overwrite").save(dir)
    val e1 = intercept[Exception] { setPartitioning(dir, "nope") }
    assert(e1.getMessage.contains("not in the table schema"))
    val bucketed = tmpDir()
    Tables.orders(spark, TestSession.Sf)
      .select(col("o_orderkey"), col("o_orderstatus"))
      .write.format("arrow").option("bucketBy", "o_orderkey")
      .option("numBuckets", "4").mode("overwrite").save(bucketed)
    val e2 = intercept[Exception] {
      setPartitioning(bucketed, "o_orderstatus")
    }
    assert(e2.getMessage.contains("bucketed"), e2.getMessage)
  }

  test("grouped aggregate over an evolved partition column refuses " +
      "the footer push and stays exact (no NULL-group mis-grouping)") {
    val dir = tmpDir()
    val o = Tables.orders(spark, TestSession.Sf)
      .select(col("o_orderkey"), col("o_orderstatus"))
    o.filter(col("o_orderkey") <= 700)
      .write.format("arrow").mode("overwrite").save(dir)
    setPartitioning(dir, "o_orderstatus")
    val tableOrder = spark.read.format("arrow").load(dir)
      .schema.fieldNames.toSeq
    o.filter(col("o_orderkey") > 700)
      .select(tableOrder.map(col): _*)
      .write.format("arrow").mode("append").save(dir)
    // GROUP BY the evolved column: footer partials can only attribute
    // NEW-generation files to a group — a pushed answer would dump
    // every pre-evolution row into a NULL group
    val got = spark.read.format("arrow").load(dir)
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val exp = o.groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(!got.contains(None), s"NULL group appeared: $got")
    assert(got == exp, s"evolved group-by drifted: $got vs $exp")
  }

  test("a second evolution keeps the first column's recorded type " +
      "(numeric-looking strings stay strings)") {
    val dir = tmpDir()
    val df = spark.range(100).toDF("id")
      .withColumn("code", format_string("%02d", col("id") % 3))
      .withColumn("tag", concat(lit("t"), col("id") % 2))
    df.filter(col("id") < 40)
      .write.format("arrow").mode("overwrite").save(dir)
    setPartitioning(dir, "code")
    def order() = spark.read.format("arrow").load(dir)
      .schema.fieldNames.toSeq
    df.filter(col("id") >= 40 && col("id") < 70)
      .select(order().map(col): _*)
      .write.format("arrow").mode("append").save(dir)
    // second evolution: the write spec moves to `tag`; `code` must
    // KEEP its recorded StringType even though every code dir value
    // ("00".."02") would infer as a long
    setPartitioning(dir, "tag")
    df.filter(col("id") >= 70)
      .select(order().map(col): _*)
      .write.format("arrow").mode("append").save(dir)
    val back = spark.read.format("arrow").load(dir)
    assert(back.schema("code").dataType ==
      org.apache.spark.sql.types.StringType,
      s"code re-typed: ${back.schema("code").dataType}")
    assert(bagEqual(back, df), "three-generation read drifted")
    assert(bagEqual(back.filter(col("code") === "01"),
      df.filter(col("code") === "01")), "string-typed filter drifted")
  }

  test("OPTIMIZE migrates pre-evolution files into the current " +
      "layout without changing answers") {
    val dir = tmpDir()
    val o = Tables.orders(spark, TestSession.Sf)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"))
    o.filter(col("o_orderkey") <= 700)
      .write.format("arrow").mode("overwrite").save(dir)
    setPartitioning(dir, "o_orderstatus")
    val tableOrder = spark.read.format("arrow").load(dir)
      .schema.fieldNames.toSeq
    o.filter(col("o_orderkey") > 700)
      .select(tableOrder.map(col): _*)
      .write.format("arrow").mode("append").save(dir)
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.arrow.GraftCatalog].getName)
    spark.sql(s"CALL graft.system.compact(path => '$dir', " +
      "target_rows => 1000000)").collect()
    val back = spark.read.format("arrow").load(dir)
    assert(bagEqual(back, o), "post-OPTIMIZE read drifted")
    // post-migration, a status filter prunes EVERY visible file it
    // can: all files now expose the layout
    val before = ArrowDataSource.recordBatchesLoaded.get()
    back.filter(col("o_orderstatus") === "F")
      .agg(sum(col("o_totalprice"))).collect()
    val loadedF = ArrowDataSource.recordBatchesLoaded.get() - before
    val before2 = ArrowDataSource.recordBatchesLoaded.get()
    back.agg(sum(col("o_totalprice"))).collect()
    val loadedAll = ArrowDataSource.recordBatchesLoaded.get() - before2
    assert(loadedF < loadedAll,
      s"post-OPTIMIZE pruning regressed: $loadedF vs $loadedAll")
  }
}
