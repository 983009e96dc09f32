package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.ArrowDataSource

/** Hive-style partitioned writes on the Arrow DSv2:
  * `write.partitionBy(col)` lands rows in `col=value/` directories
  * with the partition column carried by the path (parquet's layout,
  * `partitioned_write_prune` is the parquet twin), reads surface the
  * column again, and partition filters prune whole FILES at planning
  * time — exactly, not conservatively, because the value is constant
  * per directory. */
class ArrowPartitionSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("arrowpart").toString
    Tables.orders(spark, TestSession.Sf)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .write.format("arrow").partitionBy("o_orderstatus")
      .mode("overwrite").save(d)
    d
  }

  test("partitionBy writes value directories and round-trips the data") {
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted
    assert(subdirs.forall(_.startsWith("o_orderstatus=")),
      s"unexpected layout: ${subdirs.mkString(",")}")
    assert(subdirs.length >= 2)
    val back = spark.read.format("arrow").load(dir)
    assert(back.schema.fieldNames.contains("o_orderstatus"))
    val a = Tables.orders(spark, TestSession.Sf)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val b = back.select(col("o_orderkey"), col("o_totalprice"),
      col("o_orderstatus"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("maxOpenWriters caps open sub-writers without losing rows") {
    val d = java.nio.file.Files.createTempDirectory("arrowlru").toString
    val src = Tables.orders(spark, TestSession.Sf)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    // one task, 5 interleaved partition values, cap of 2 open writers:
    // the LRU seal/reopen path exercises constantly
    src.repartition(1).write.format("arrow")
      .option("maxOpenWriters", "2")
      .partitionBy("o_orderpriority").mode("overwrite").save(d)
    val back = spark.read.format("arrow").load(d)
    assert(back.count() == src.count())
    val a = src
    val b = back.select(col("o_orderkey"), col("o_totalprice"),
      col("o_orderpriority"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // eviction produced multiple files in at least one partition dir
    val nFiles = ArrowDataSource.listIpcFiles(d).length
    assert(nFiles > 5, s"expected evicted re-opens to add files, " +
      s"got $nFiles for 5 partitions")
  }

  test("a user-specified schema fixes partition column types") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("arrowptype").toString
    (1L to 20L).map(i => (i, i % 3)).toDF("id", "bucket")
      .write.format("arrow").partitionBy("bucket")
      .mode("overwrite").save(d)
    // inference would call `bucket` a LONG; a user schema declares INT
    // and the readers must honor it (constant vectors typed INT)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.IntegerType)))
    val back = spark.read.format("arrow").schema(schema).load(d)
    assert(back.schema("bucket").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val got = back.filter(col("bucket") === 1)
      .select(col("id"), col("bucket")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    assert(got.toSeq == (1L to 20L).filter(_ % 3 == 1).map(i => (i, 1)))
  }

  test("partition filters prune whole files at planning time") {
    val all = spark.read.format("arrow").load(dir)
    val total = all.rdd.getNumPartitions
    val one = spark.read.format("arrow").load(dir)
      .filter(col("o_orderstatus") === "F")
    assert(one.rdd.getNumPartitions < total,
      s"partition filter pruned nothing: ${one.rdd.getNumPartitions}/$total")
    val expected = Tables.orders(spark, TestSession.Sf)
      .filter(col("o_orderstatus") === "F").count()
    assert(one.count() == expected)
    // pruning composes with data-column filters
    val mixed = spark.read.format("arrow").load(dir)
      .filter(col("o_orderstatus") === "F" && col("o_orderkey") <= 500)
    val expMixed = Tables.orders(spark, TestSession.Sf)
      .filter(col("o_orderstatus") === "F" && col("o_orderkey") <= 500)
      .count()
    assert(mixed.count() == expMixed)
  }

  test("aggregate pushdown composes with partition filters") {
    val q = spark.read.format("arrow").load(dir)
      .filter(col("o_orderstatus") === "F")
      .agg(min(col("o_orderkey")).as("mn"), count(lit(1)).as("n"))
    assert(q.queryExecution.executedPlan.toString
      .contains("graft-arrow-agg"),
      s"agg not pushed:\n${q.queryExecution.executedPlan}")
    val before = ArrowDataSource.recordBatchesLoaded.get()
    val r = q.collect()(0)
    assert(ArrowDataSource.recordBatchesLoaded.get() == before,
      "partition-filtered aggregate read data batches")
    val e = Tables.orders(spark, TestSession.Sf)
      .filter(col("o_orderstatus") === "F")
      .agg(min(col("o_orderkey")), count(lit(1))).collect()(0)
    assert(r == e)
  }

  test("COUNT over a fully-pruned partition filter is 0, not NULL") {
    // pushed aggregate + a partition filter matching no directory:
    // Spark merges pushed COUNT partials with Sum, which is NULL over
    // an empty scan — the source must emit one zero-count partial row
    val r = spark.read.format("arrow").load(dir)
      .filter(col("o_orderstatus") === "NO_SUCH_STATUS")
      .agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("mn"))
      .collect()(0)
    assert(!r.isNullAt(0) && r.getLong(0) == 0L,
      s"COUNT over zero partitions must be 0, got $r")
    assert(r.isNullAt(1))
  }

  test("not-equal filters keep SQL null semantics on partition values") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("arrowpart3").toString
    Seq((1L, "a"), (2L, null.asInstanceOf[String]), (3L, "b"))
      .toDF("id", "tag")
      .write.format("arrow").partitionBy("tag").mode("overwrite").save(d)
    // `tag =!= "a"` arrives as Not(EqualTo): three-valued logic says a
    // NULL tag is unknown, not true — the row must be excluded, which
    // is why NOT is never claimed as an exact pushed filter
    val got = spark.read.format("arrow").load(d)
      .filter(col("tag") =!= "a")
      .select(col("id")).collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(3L), s"wrong null semantics: ${got.toSeq}")
  }

  test("unicode partition values round-trip byte-exactly") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("arrowpart4").toString
    val vals = Seq("€5", "naïve", "日本語", "emoji🙂", "plain")
    vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "tag")
      .write.format("arrow").partitionBy("tag").mode("overwrite").save(d)
    val back = spark.read.format("arrow").load(d)
      .select(col("tag")).collect().map(_.getString(0)).sorted
    assert(back.toSeq == vals.sorted, s"corrupted values: ${back.toSeq}")
    // equality filter on a multi-byte value matches its partition
    assert(spark.read.format("arrow").load(d)
      .filter(col("tag") === "€5").count() == 1)
  }

  test("long partition values infer as longs; special strings escape") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("arrowpart2").toString
    val df = Seq(
      (1L, 10L, "a b/c=d"), (2L, 10L, "plain"), (3L, 20L, "a b/c=d"),
      (4L, 20L, null.asInstanceOf[String]))
      .toDF("id", "bucket", "tag")
    df.write.format("arrow").partitionBy("bucket", "tag")
      .mode("overwrite").save(d)
    val back = spark.read.format("arrow").load(d)
    assert(back.schema("bucket").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(back.schema("tag").dataType ==
      org.apache.spark.sql.types.StringType)
    val a = df.select(col("id"), col("bucket"), col("tag"))
    val b = back.select(col("id"), col("bucket"), col("tag"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"round-trip mismatch:\n${b.collect().mkString("\n")}")
    // range filter on the long partition column prunes files
    val hi = back.filter(col("bucket") >= 20)
    assert(hi.count() == 2)
    assert(back.filter(col("tag").isNull).count() == 1)
  }

  test("optimizeWrite clusters rows: one file per partition value") {
    def fileCounts(d: String): Map[String, Int] =
      new java.io.File(d).listFiles().filter(_.isDirectory).map { sub =>
        sub.getName -> sub.listFiles().count(_.getName.endsWith(".arrow"))
      }.toMap
    val src = Tables.orders(spark, TestSession.Sf)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .repartition(8) // many tasks all carrying every status value
    val plain = java.nio.file.Files.createTempDirectory("arrowow0").toString
    src.write.format("arrow").partitionBy("o_orderstatus")
      .mode("overwrite").save(plain)
    assert(fileCounts(plain).values.max > 1,
      "without clustering, every task writes into every live partition")
    val opt = java.nio.file.Files.createTempDirectory("arrowow1").toString
    src.write.format("arrow").partitionBy("o_orderstatus")
      .option("optimizeWrite", "true").mode("overwrite").save(opt)
    assert(fileCounts(opt).values.max == 1,
      s"clustered write must land one file per value, got " +
        s"${fileCounts(opt)}")
    // and the data is identical either way
    val a = spark.read.format("arrow").load(plain)
    val b = spark.read.format("arrow").load(opt)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
