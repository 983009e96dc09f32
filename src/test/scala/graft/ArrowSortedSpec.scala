package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.{ArrowDataSource, GraftCatalog}

/** Sorted layout (`option("sortBy", col)`) + reported V2 ordering:
  * the writer VERIFIES rows arrive ascending NULLS FIRST and stamps
  * the footer; [[graft.sources.arrow.ArrowScan]] reports the unanimous
  * stamp as its output ordering. Combined with the bucketed layout,
  * an equi-join plans sort-merge with NEITHER exchanges NOR sorts —
  * the write pays ordering once, every later join rides it free.
  */
class ArrowSortedSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSession.spark
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s
  }

  private def tmpDir(): String =
    Files.createTempDirectory("arrow_sort").toString

  private def tbl(dir: String) = spark.table(s"graft.arrow.`$dir`")

  // physical Sort nodes below the join (the SortMergeJoin node name
  // itself contains "Sort", so match the operator rendering "Sort [")
  private def sortNodesIn(planPart: String): Int =
    "Sort \\[".r.findAllIn(planPart).length

  test("bucketed+sorted join: no exchange AND no sort on either side") {
    val li = Tables.load(spark, TestSession.Sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, TestSession.Sf, "orders")
      .select("o_orderkey", "o_orderpriority")
    val liDir = tmpDir(); val oDir = tmpDir()
    // one task, key-ascending stream: the bucket router hands each
    // sub-file an ascending subsequence, so every file earns the stamp
    li.repartition(1).sortWithinPartitions("l_orderkey")
      .write.format("arrow").option("bucketBy", "l_orderkey")
      .option("numBuckets", "8").option("sortBy", "l_orderkey")
      .mode("overwrite").save(liDir)
    o.repartition(1).sortWithinPartitions("o_orderkey")
      .write.format("arrow").option("bucketBy", "o_orderkey")
      .option("numBuckets", "8").option("sortBy", "o_orderkey")
      .mode("overwrite").save(oDir)

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
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"bucketed+sorted join still shuffles:\n$plan")
      assert(sortNodesIn(joinPart) == 0,
        s"bucketed+sorted join still sorts:\n$plan")

      val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val got = joined.collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == expected, "sort elimination changed the answer")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("bucketed WITHOUT sortBy keeps the sorts (control)") {
    val o = Tables.load(spark, TestSession.Sf, "orders")
      .select("o_orderkey", "o_totalprice")
    val aDir = tmpDir(); val bDir = tmpDir()
    o.write.format("arrow").option("bucketBy", "o_orderkey")
      .option("numBuckets", "4").mode("overwrite").save(aDir)
    o.write.format("arrow").option("bucketBy", "o_orderkey")
      .option("numBuckets", "4").mode("overwrite").save(bDir)
    val prev = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled",
      "spark.sql.sources.v2.bucketing.enabled")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val joined = tbl(aDir).as("a").join(tbl(bDir).as("b"),
        col("a.o_orderkey") === col("b.o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(sortNodesIn(joinPart) == 2,
        s"unsorted buckets must still sort both sides:\n$plan")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("the writer verifies, not trusts: unsorted input earns no stamp") {
    val dir = tmpDir()
    // o_custkey is NOT ascending when streamed in o_orderkey order
    Tables.load(spark, TestSession.Sf, "orders")
      .select("o_orderkey", "o_custkey").repartition(1)
      .sortWithinPartitions("o_orderkey")
      .write.format("arrow").option("sortBy", "o_custkey")
      .mode("overwrite").save(dir)
    val stamps = ArrowDataSource.visibleIpcFiles(dir)
      .map(f => ArrowDataSource.footerInfo(f).sort)
    assert(stamps.nonEmpty && stamps.forall(_.isEmpty),
      s"unsorted data must not be stamped sorted: $stamps")
    // and the read stays exact
    assert(spark.read.format("arrow").load(dir).count() ==
      Tables.load(spark, TestSession.Sf, "orders").count())
  }

  test("sorted flat files are stamped and the scan reports the order") {
    val dir = tmpDir()
    Tables.load(spark, TestSession.Sf, "orders")
      .select("o_orderkey", "o_totalprice").repartition(4)
      .sortWithinPartitions("o_orderkey")
      .write.format("arrow").option("sortBy", "o_orderkey")
      .mode("overwrite").save(dir)
    val stamps = ArrowDataSource.visibleIpcFiles(dir)
      .map(f => ArrowDataSource.footerInfo(f).sort)
    assert(stamps.nonEmpty && stamps.forall(_.contains("o_orderkey")),
      s"stamps: $stamps")
    val df = spark.read.format("arrow").load(dir)
    assert(df.queryExecution.executedPlan.toString
      .contains("sorted=[o_orderkey]"),
      s"scan does not report the order:\n" +
        s"${df.queryExecution.executedPlan}")
    assert(df.count() ==
      Tables.load(spark, TestSession.Sf, "orders").count())
  }

  test("a RENAMED sort column keeps the reported order under its " +
      "logical name") {
    val dir = tmpDir()
    Tables.load(spark, TestSession.Sf, "orders")
      .select("o_orderkey", "o_totalprice").repartition(2)
      .sortWithinPartitions("o_orderkey")
      .write.format("arrow").option("sortBy", "o_orderkey")
      .mode("overwrite").save(dir)
    ArrowDataSource.initTableLog(dir)
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.arrow.GraftCatalog].getName)
    spark.sql(s"CALL graft.system.rename_column(path => '$dir', " +
      "old_name => 'o_orderkey', new_name => 'okey')").collect()
    val df = spark.read.format("arrow").load(dir)
    assert(df.queryExecution.executedPlan.toString
      .contains("sorted=[okey]"),
      s"renamed sort column lost its ordering claim:\n" +
        s"${df.queryExecution.executedPlan}")
    assert(df.count() ==
      Tables.load(spark, TestSession.Sf, "orders").count())
  }

  test("NULLS FIRST discipline: null after a value voids the stamp") {
    import spark.implicits._
    val okDir = tmpDir(); val badDir = tmpDir()
    Seq[(java.lang.Long, String)]((null, "a"), (null, "b"), (1L, "c"),
      (5L, "d")).toDF("v", "s").coalesce(1)
      .write.format("arrow").option("sortBy", "v")
      .mode("overwrite").save(okDir)
    Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"), (5L, "c"))
      .toDF("v", "s").coalesce(1)
      .write.format("arrow").option("sortBy", "v")
      .mode("overwrite").save(badDir)
    assert(ArrowDataSource.visibleIpcFiles(okDir)
      .forall(f => ArrowDataSource.footerInfo(f).sort.contains("v")))
    assert(ArrowDataSource.visibleIpcFiles(badDir)
      .forall(f => ArrowDataSource.footerInfo(f).sort.isEmpty))
  }

  test("unknown or unsupported sortBy columns fail fast") {
    val df = Tables.load(spark, TestSession.Sf, "region")
    val e1 = intercept[org.apache.spark.SparkException] {
      df.write.format("arrow").option("sortBy", "nope")
        .mode("overwrite").save(tmpDir())
    }
    assert(e1.getMessage != null)
    val e2 = intercept[org.apache.spark.SparkException] {
      Tables.load(spark, TestSession.Sf, "orders")
        .select("o_orderkey", "o_totalprice")
        .write.format("arrow").option("sortBy", "o_totalprice") // double
        .mode("overwrite").save(tmpDir())
    }
    assert(e2.getMessage != null)
  }
}
