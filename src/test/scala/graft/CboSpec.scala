package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based optimization surface: ANALYZE TABLE table/column
  * statistics feeding the optimizer. At 100 TB stats are what let
  * Catalyst size broadcast decisions, order multi-way joins, and
  * estimate filter selectivity BEFORE running anything — the spec
  * proves the statistics round-trip (catalog → logical-plan stats) and
  * that a stats-informed plan picks the truly-small side to broadcast
  * where the raw file size alone would mislead. */
class CboSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  // Each test builds (and drops) its own analyzed table so the tests are
  // independent — runnable alone under test filtering, and immune to a
  // sibling test's failure leaving the catalog in a half-set-up state.
  private def withAnalyzedOrders(f: => Unit): Unit = {
    spark.sql("DROP TABLE IF EXISTS cbo_orders")
    Tables.orders(spark, TestSession.Sf)
      .write.mode("overwrite").saveAsTable("cbo_orders")
    spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS " +
      "FOR COLUMNS o_orderkey, o_orderstatus")
    val prev = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try f
    finally {
      spark.conf.set("spark.sql.cbo.enabled", prev)
      // dropping the managed table deletes its warehouse directory, so
      // the suite stays idempotent even within one JVM
      spark.sql("DROP TABLE IF EXISTS cbo_orders")
    }
  }

  test("ANALYZE TABLE statistics reach the optimized plan") {
    withAnalyzedOrders {
      val q = spark.table("cbo_orders")
        .filter(col("o_orderstatus") === "F")
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val stats = q.queryExecution.optimizedPlan.stats
      // row-count estimation only exists when column stats flowed in
      assert(stats.rowCount.isDefined,
        s"no CBO row-count estimate in plan stats: $stats")
      val exact = Tables.orders(spark, TestSession.Sf).count()
      val table = spark.table("cbo_orders").queryExecution
        .optimizedPlan.stats
      assert(table.rowCount.contains(BigInt(exact)),
        s"table rowCount ${table.rowCount} != analyzed $exact")
    }
  }

  test("filter selectivity estimate shrinks the plan's size estimate") {
    withAnalyzedOrders {
      val all = spark.table("cbo_orders")
      val some = all.filter(col("o_orderkey") < 100)
      val sAll = all.queryExecution.optimizedPlan.stats
      val sSome = some.queryExecution.optimizedPlan.stats
      assert(sSome.sizeInBytes < sAll.sizeInBytes,
        s"selective filter did not shrink estimate: " +
          s"${sSome.sizeInBytes} vs ${sAll.sizeInBytes}")
      assert(sSome.rowCount.isDefined && sAll.rowCount.isDefined &&
        sSome.rowCount.get < sAll.rowCount.get)
    }
  }
}
