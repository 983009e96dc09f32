package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.ArrowDataSource

/** Aggregate pushdown on the Arrow DSv2: global MIN/MAX/COUNT are
  * answered from the footer statistics the writer persists (zone maps
  * + row/null counts) without loading a single data batch — the Arrow
  * analogue of the parquet footer-stat path (AggPushdownSpec). The
  * no-data-read claim is pinned with the process-wide
  * [[ArrowDataSource.recordBatchesLoaded]] counter, not by plan
  * inspection alone.
  */
class ArrowAggPushdownSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("arrowagg").toString
    Tables.orders(spark, TestSession.Sf)
      .write.format("arrow").option("batchRows", 250)
      .mode("overwrite").save(d)
    d
  }

  // string check: the scan sits under AdaptiveSparkPlanExec, which
  // plan.collect does not descend into
  private def pushedTo(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("graft-arrow-agg")

  test("min/max/count come from the footer — no data batch is read") {
    val expected = Tables.orders(spark, TestSession.Sf)
      .agg(min(col("o_orderkey")), max(col("o_orderkey")),
        min(col("o_orderdate")), count(lit(1)),
        count(col("o_orderstatus")))
      .collect()(0)
    val pushed = spark.read.format("arrow").load(dir)
      .agg(min(col("o_orderkey")), max(col("o_orderkey")),
        min(col("o_orderdate")), count(lit(1)),
        count(col("o_orderstatus")))
    assert(pushedTo(pushed),
      s"aggregate was not pushed:\n${pushed.queryExecution.executedPlan}")
    val before = ArrowDataSource.recordBatchesLoaded.get()
    val r = pushed.collect()(0)
    assert(ArrowDataSource.recordBatchesLoaded.get() == before,
      "pushed aggregate loaded data batches")
    assert(r == expected, s"$r != $expected")
  }

  test("STRING min/max answer from footer string bounds — zero data " +
      "batches; over-long values refuse conservatively") {
    import spark.implicits._
    val expected = Tables.orders(spark, TestSession.Sf)
      .agg(min(col("o_orderpriority")), max(col("o_orderpriority")),
        min(col("o_orderstatus")), max(col("o_orderstatus")))
      .collect()(0)
    val pushed = spark.read.format("arrow").load(dir)
      .agg(min(col("o_orderpriority")), max(col("o_orderpriority")),
        min(col("o_orderstatus")), max(col("o_orderstatus")))
    assert(pushedTo(pushed),
      s"string aggregate was not pushed:\n${pushed.queryExecution.executedPlan}")
    val before = ArrowDataSource.recordBatchesLoaded.get()
    val r = pushed.collect()(0)
    assert(ArrowDataSource.recordBatchesLoaded.get() == before,
      "pushed string aggregate loaded data batches")
    assert(r == expected, s"$r != $expected")
    // a column with >64-byte values has no recorded bounds for those
    // batches: the push must REFUSE (fall back to a real scan) rather
    // than return a wrong extremum
    val d2 = java.nio.file.Files.createTempDirectory("arrowaggstr").toString
    Seq((1L, "zz_" + ("y" * 100)), (2L, "aa"))
      .toDF("id", "s")
      .coalesce(1)
      .write.format("arrow").option("batchRows", 1)
      .mode("overwrite").save(d2)
    val longAgg = spark.read.format("arrow").load(d2)
      .agg(min(col("s")), max(col("s")))
    val r2 = longAgg.collect()(0)
    assert(r2.getString(0) == "aa" && r2.getString(1).startsWith("zz_"),
      s"wrong extrema under over-long values: $r2")
  }

  test("a filtered aggregate does NOT push and stays exact") {
    val q = spark.read.format("arrow").load(dir)
      .filter(col("o_orderkey") <= 500)
      .agg(max(col("o_orderkey")).as("mx"), count(lit(1)).as("n"))
    assert(!pushedTo(q),
      "stats describe the unfiltered file; filtered agg must not push")
    val r = q.collect()(0)
    val e = Tables.orders(spark, TestSession.Sf)
      .filter(col("o_orderkey") <= 500)
      .agg(max(col("o_orderkey")), count(lit(1))).collect()(0)
    assert(r == e)
  }

  test("grouped and unsupported aggregates fall back to the full scan") {
    val grouped = spark.read.format("arrow").load(dir)
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    assert(!pushedTo(grouped))
    // double min/max is excluded by design (NaN poisoning)
    val dbl = spark.read.format("arrow").load(dir)
      .agg(min(col("o_totalprice")).as("mn"))
    assert(!pushedTo(dbl))
    assert(dbl.collect()(0).getDouble(0) ==
      Tables.orders(spark, TestSession.Sf)
        .agg(min(col("o_totalprice"))).collect()(0).getDouble(0))
  }

  test("GROUP BY a partition column pushes down — grouped, footer-only") {
    val d = java.nio.file.Files.createTempDirectory("arrowagggrp").toString
    Tables.orders(spark, TestSession.Sf)
      .select(col("o_orderkey"), col("o_orderstatus"))
      .write.format("arrow").partitionBy("o_orderstatus")
      .option("batchRows", 250).mode("overwrite").save(d)
    val q = spark.read.format("arrow").load(d)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("mn"),
        max(col("o_orderkey")).as("mx"))
      .orderBy(col("o_orderstatus"))
    assert(pushedTo(q),
      s"grouped agg on a partition column was not pushed:\n" +
        s"${q.queryExecution.executedPlan}")
    val before = ArrowDataSource.recordBatchesLoaded.get()
    val r = q.collect()
    assert(ArrowDataSource.recordBatchesLoaded.get() == before,
      "grouped pushed aggregate loaded data batches")
    val e = Tables.orders(spark, TestSession.Sf)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("mn"),
        max(col("o_orderkey")).as("mx"))
      .orderBy(col("o_orderstatus")).collect()
    assert(r.toSeq == e.toSeq, s"${r.toSeq} != ${e.toSeq}")
  }

  test("grouped pushdown composes with a partition filter") {
    val d = java.nio.file.Files.createTempDirectory("arrowagggrpf").toString
    Tables.orders(spark, TestSession.Sf)
      .select(col("o_orderkey"), col("o_orderstatus"))
      .write.format("arrow").partitionBy("o_orderstatus")
      .mode("overwrite").save(d)
    val q = spark.read.format("arrow").load(d)
      .filter(col("o_orderstatus").isin("F", "P"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
    assert(pushedTo(q))
    val e = Tables.orders(spark, TestSession.Sf)
      .filter(col("o_orderstatus").isin("F", "P"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus")).collect()
    assert(q.collect().toSeq == e.toSeq)
  }

  test("count(col) subtracts real nulls; all-null batches keep min null") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("arrowaggnull").toString
    // batch 0: nulls only; batch 1: values — batchRows=3 splits them
    val df = Seq[(java.lang.Long, String)](
      (null, "a"), (null, "b"), (null, "c"),
      (7L, "d"), (11L, null), (5L, "f"))
      .toDF("v", "s").coalesce(1)
    df.write.format("arrow").option("batchRows", 3)
      .mode("overwrite").save(d)
    val pushed = spark.read.format("arrow").load(d)
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
        count(col("v")).as("nv"), count(col("s")).as("ns"),
        count(lit(1)).as("n"))
    assert(pushedTo(pushed))
    val before = ArrowDataSource.recordBatchesLoaded.get()
    val r = pushed.collect()(0)
    assert(ArrowDataSource.recordBatchesLoaded.get() == before)
    assert(r.getLong(0) == 5L && r.getLong(1) == 11L)
    assert(r.getLong(2) == 3L, "count(v) must ignore the 3 nulls")
    assert(r.getLong(3) == 5L, "count(s) must ignore the 1 null")
    assert(r.getLong(4) == 6L)
  }
}
