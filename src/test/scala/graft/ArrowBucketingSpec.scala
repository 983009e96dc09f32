package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.{ArrowDataSource, GraftBucket, GraftCatalog}

/** Bucketed layout for the ARROW source — the storage-partitioned-join
  * twin of [[BucketingSpec]] (parquet `bucketBy`): both tables written
  * with the same `bucket(n, key)` layout, read through the graft
  * catalog (Catalyst resolves non-identity transforms only via a
  * FunctionCatalog), joined with NO shuffle exchange on either side. */
class ArrowBucketingSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSession.spark
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s
  }

  private def tmpDir(): String =
    Files.createTempDirectory("arrow_bucket").toString

  private def tbl(dir: String) = spark.table(s"graft.arrow.`$dir`")

  test("bucketed arrow tables join without a shuffle and match the plain join") {
    val li = Tables.load(spark, TestSession.Sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, TestSession.Sf, "orders")
      .select("o_orderkey", "o_orderpriority")
    val liDir = tmpDir(); val oDir = tmpDir()
    li.write.format("arrow").option("bucketBy", "l_orderkey")
      .option("numBuckets", "8").mode("overwrite").save(liDir)
    o.write.format("arrow").option("bucketBy", "o_orderkey")
      .option("numBuckets", "8").mode("overwrite").save(oDir)

    val prev = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled",
      "spark.sql.sources.v2.bucketing.enabled")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")

      val joined = tbl(liDir).join(tbl(oDir),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"bucketed arrow join still shuffles:\n$plan")

      val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, "bucketed join changed the answer")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("one bucketed side: Spark shuffles the other side with the V2 bucket function") {
    // v2.bucketing.shuffle lets Spark hash the UNBUCKETED side with our
    // GraftBucketBound ScalarFunction to match the bucketed side's
    // layout — one exchange instead of two, and an end-to-end execution
    // of the function itself (SPJ alone only compares canonical names)
    val li = Tables.load(spark, TestSession.Sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, TestSession.Sf, "orders")
      .select("o_orderkey", "o_orderpriority")
    val liDir = tmpDir(); val oDir = tmpDir()
    li.write.format("arrow").option("bucketBy", "l_orderkey")
      .option("numBuckets", "8").mode("overwrite").save(liDir)
    o.write.format("arrow").mode("overwrite").save(oDir) // NOT bucketed

    val prev = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled",
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.shuffle.enabled")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")

      val joined = tbl(liDir).join(tbl(oDir),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      val exchanges = "Exchange ".r.findAllIn(joinPart).length
      assert(exchanges == 1,
        s"expected exactly one exchange (probe side only), got $exchanges:\n$plan")

      val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected,
        "V2-function shuffle mis-routed rows (hash drift between " +
          "writer layout and ScalarFunction)")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("writer stamps every file footer with its bucket layout") {
    val dir = tmpDir()
    Tables.load(spark, TestSession.Sf, "nation")
      .select("n_nationkey", "n_name")
      .write.format("arrow").option("bucketBy", "n_nationkey")
      .option("numBuckets", "4").mode("overwrite").save(dir)
    val stamps = ArrowDataSource.visibleIpcFiles(dir)
      .map(f => ArrowDataSource.footerInfo(f).bucket)
    assert(stamps.nonEmpty && stamps.forall(_.isDefined))
    assert(stamps.flatten.map(s => (s._1, s._2)).distinct ==
      Seq(("n_nationkey", 4)), s"stamps: $stamps")
    // routing is the shared hash: every row in a file hashes to its id
    val back = spark.read.format("arrow").load(dir)
    assert(back.count() ==
      Tables.load(spark, TestSession.Sf, "nation").count())
  }

  test("bucket routing matches the V2 function Spark would evaluate") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val f = new GraftBucketFunctionAccess().bound(
      org.apache.spark.sql.types.LongType)
    for (v <- Seq(0L, 1L, -7L, 42L, 123456789L)) {
      val viaFn = f.produceResult(
        new GenericInternalRow(Array[Any](8, v)))
      val direct = GraftBucket.idOf(org.apache.spark.sql.types.LongType,
        new GenericInternalRow(Array[Any](0L, v)), 1, 8)
      assert(viaFn == direct, s"function/layout hash drift at $v")
      assert(viaFn >= 0 && viaFn < 8)
    }
  }

  test("bucket stamps survive the dictionary-encode rewrite (layouts compose)") {
    // ArrowOptimize copies footer metadata verbatim, so an OPTIMIZE'd
    // bucketed directory keeps its layout: dictionary compression and
    // exchange-free joins are independent storage properties
    val dir = tmpDir(); val opt = tmpDir()
    Tables.load(spark, TestSession.Sf, "orders")
      .select("o_orderkey", "o_orderpriority")
      .write.format("arrow").option("bucketBy", "o_orderkey")
      .option("numBuckets", "4").mode("overwrite").save(dir)
    graft.sources.arrow.ArrowOptimize.dictionaryEncode(
      spark, dir, opt, codec = Some("zstd"))
    val stamps = ArrowDataSource.visibleIpcFiles(opt)
      .map(f => ArrowDataSource.footerInfo(f).bucket)
    assert(stamps.nonEmpty && stamps.forall(_.isDefined),
      s"rewrite dropped bucket stamps: $stamps")
    assert(stamps.flatten.map(s => (s._1, s._2)).distinct ==
      Seq(("o_orderkey", 4)))
    // and the rewritten table still answers exactly
    assert(spark.read.format("arrow").load(opt).count() ==
      Tables.load(spark, TestSession.Sf, "orders").count())
  }

  test("a plain (unbucketed) directory reports no key-grouped partitioning") {
    val dir = tmpDir()
    Tables.load(spark, TestSession.Sf, "region")
      .write.format("arrow").mode("overwrite").save(dir)
    val stamps = ArrowDataSource.visibleIpcFiles(dir)
      .map(f => ArrowDataSource.footerInfo(f).bucket)
    assert(stamps.forall(_.isEmpty))
    // and reading through the catalog still answers correctly
    assert(tbl(dir).count() ==
      Tables.load(spark, TestSession.Sf, "region").count())
  }
}

/** Test access to the bound bucket function (bind is the public path). */
class GraftBucketFunctionAccess {
  def bound(keyType: org.apache.spark.sql.types.DataType) =
    new graft.sources.arrow.GraftBucketFunction().bind(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_0",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("_1", keyType))))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions
        .ScalarFunction[Integer]]
}
