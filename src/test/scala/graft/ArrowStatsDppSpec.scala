package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.arrow.ArrowDataSource

/** Planning statistics and runtime (dynamic) partition pruning on the
  * Arrow DSv2 — the two planner integrations that make the custom
  * source a first-class join citizen:
  *
  *  - `SupportsReportStatistics` feeds footer-derived size/row-count
  *    into Catalyst, so an Arrow-backed dimension broadcasts instead
  *    of defaulting to the "unknown size" shuffle join;
  *  - `SupportsRuntimeFiltering` accepts the build side's actual
  *    partition-key values at execution, pruning whole fact files the
  *    way parquet's DPP does (DppSpec is the parquet twin).
  */
class ArrowStatsDppSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("footer statistics make an arrow dimension broadcastable") {
    val dim = java.nio.file.Files.createTempDirectory("astat_dim").toString
    Tables.customer(spark, TestSession.Sf)
      .select(col("c_custkey"), col("c_nationkey"))
      .write.format("arrow").mode("overwrite").save(dim)
    val rel = spark.read.format("arrow").load(dim)
    val stats = rel.queryExecution.optimizedPlan.stats
    val exact = Tables.customer(spark, TestSession.Sf).count()
    assert(stats.rowCount.contains(BigInt(exact)),
      s"row count not reported: ${stats.rowCount} vs $exact")
    assert(stats.sizeInBytes > 0 &&
      stats.sizeInBytes < 10L * 1024 * 1024,
      s"unusable size estimate: ${stats.sizeInBytes}")
    // and the planner acts on it: fact join dim → broadcast hash join
    val q = Tables.orders(spark, TestSession.Sf)
      .join(rel, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"arrow dim not broadcast:\n$plan")
    assert(q.collect().map(_.getLong(1)).sum ==
      Tables.orders(spark, TestSession.Sf).count())
  }

  test("footer column statistics reach catalyst attribute stats") {
    val dim = java.nio.file.Files.createTempDirectory("acol_dim").toString
    Tables.orders(spark, TestSession.Sf)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.format("arrow").mode("overwrite").save(dim)
    val rel = spark.read.format("arrow").load(dim)
    val stats = rel.queryExecution.optimizedPlan.stats
    val byName = stats.attributeStats.toSeq
      .map { case (a, s) => a.name -> s }.toMap
    assert(byName.contains("o_orderkey"),
      s"no column stats surfaced: ${stats.attributeStats}")
    val key = byName("o_orderkey")
    val exact = Tables.orders(spark, TestSession.Sf)
      .agg(min(col("o_orderkey")), max(col("o_orderkey")),
        count(lit(1))).collect()(0)
    assert(key.nullCount.contains(BigInt(0)), s"nullCount: $key")
    assert(key.min.contains(exact.getLong(0)), s"min: $key")
    assert(key.max.contains(exact.getLong(1)), s"max: $key")
  }

  test("runtime filters prune partitioned arrow files like parquet DPP") {
    val fact = java.nio.file.Files.createTempDirectory("adpp_fact").toString
    Tables.orders(spark, TestSession.Sf)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .write.format("arrow").partitionBy("o_orderstatus")
      .mode("overwrite").save(fact)
    // dim filtered on a NON-key column, so the selected partition keys
    // are unknowable before runtime (a key filter would be propagated
    // statically — see DppSpec)
    val dimDir = java.nio.file.Files.createTempDirectory("adpp_dim").toString
    Tables.orders(spark, TestSession.Sf)
      .select(col("o_orderstatus").as("st")).distinct()
      .withColumn("label", concat(lit("status_"), col("st")))
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("label") === "status_F")

    val q = spark.read.format("arrow").load(fact)
      .join(dim, col("o_orderstatus") === col("st"))
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no runtime filter planted on the arrow scan:\n$plan")
    val before = ArrowDataSource.recordBatchesLoaded.get()
    val got = q.collect()
    val dppBatches = ArrowDataSource.recordBatchesLoaded.get() - before

    // the baseline must dodge the aggregate pushdown (COUNT alone is
    // answered from footers and reads zero batches — the metadata
    // path working as designed), so sum a data column
    val b2 = ArrowDataSource.recordBatchesLoaded.get()
    val full = spark.read.format("arrow").load(fact)
      .agg(sum(col("o_totalprice"))).collect()(0).getDouble(0)
    val fullBatches = ArrowDataSource.recordBatchesLoaded.get() - b2

    assert(got.length ==
      Tables.orders(spark, TestSession.Sf)
        .filter(col("o_orderstatus") === "F").count())
    assert(full > 0)
    assert(dppBatches < fullBatches,
      s"runtime filter read as much as a full scan: " +
        s"$dppBatches vs $fullBatches")
  }
}
