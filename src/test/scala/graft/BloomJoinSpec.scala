package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime Bloom-filter join pruning, both forms:
  *
  *  - the explicit sketch-broadcast pattern declared as
  *    `join_bloom_prefilter` (exact vs the plain join — the filter may
  *    only drop rows the join would drop anyway);
  *  - Spark's native `InjectRuntimeFilter`, whose size thresholds
  *    target multi-GB scans and so never fire on the fixtures — the
  *    spec lowers them (in this suite only) and asserts the
  *    bloom_filter subquery actually lands in the optimized plan, i.e.
  *    the scale path exists and is one conf away.
  */
class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("explicit bloom pre-filter returns exactly the plain join result") {
    val dir = TestSession.Sf
    val expected = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir)
          .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val got = queries.JoinQueries.bloomPrefilterJoin(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expected)
    assert(got.values.sum > 0)
  }

  test("the declared pre-filter is codegen-native, not a Scala UDF") {
    val q = queries.JoinQueries.bloomPrefilterJoin(spark, TestSession.Sf)
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.toLowerCase.contains("might_contain"),
      s"no native might_contain in plan:\n$plan")
    assert(!plan.contains("UDF"),
      s"probe-side test fell back to a Scala UDF:\n$plan")
  }

  test("bloom filter drops non-joining fact rows before the shuffle") {
    val dir = TestSession.Sf
    val dim = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val n = math.max(dim.count(), 64L)
    val bf = dim.stat.bloomFilter("c_custkey", n, 0.01)
    val keys = Tables.orders(spark, dir).select(col("o_custkey"))
      .collect().map(_.getLong(0))
    val joinable = dim.collect().map(_.getLong(0)).toSet
    val kept = keys.count(bf.mightContain)
    // no false negatives: every joinable key passes
    assert(keys.filter(joinable).forall(bf.mightContain))
    // real pruning: the pass-through fraction tracks the dim selectivity
    // (1% fpp on top of the true match rate)
    assert(kept < keys.length)
    assert(kept >= keys.count(joinable))
  }

  test("native InjectRuntimeFilter plants a bloom subquery once thresholds allow") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force a shuffle join: broadcast joins skip runtime filters
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dir = TestSession.Sf
      val dim = Tables.customer(spark, dir)
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val q = Tables.orders(spark, dir)
        .join(dim, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val plan = q.queryExecution.optimizedPlan.toString().toLowerCase
      assert(plan.contains("bloomfilter") || plan.contains("might_contain"),
        s"no runtime bloom filter in plan:\n$plan")
      assert(q.collect().map(_.getLong(1)).sum > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
