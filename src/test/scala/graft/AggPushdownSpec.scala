package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parquet aggregate pushdown (MIN/MAX/COUNT answered from footer
  * statistics — a metadata-only scan): at 100 TB this is the
  * difference between reading every row and reading row-group stats.
  * Needs the DSv2 parquet path (`useV1SourceList` without parquet) and
  * `spark.sql.parquet.aggregatePushdown=true`; both set only inside
  * this spec so the declared-query surface keeps its default planning.
  */
class AggPushdownSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("min/max/count are answered from parquet footer statistics") {
    val dir = s"${TestSession.Sf}/lineitem.parquet"
    val plain = spark.read.parquet(dir)
      .agg(min(col("l_quantity")).as("mn"), max(col("l_quantity")).as("mx"),
        count(lit(1)).as("n"))
      .collect()(0)
    val prevV1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.sources.useV1SourceList",
      prevV1.split(",").filterNot(_.trim == "parquet").mkString(","))
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      val pushed = spark.read.parquet(dir)
        .agg(min(col("l_quantity")).as("mn"), max(col("l_quantity")).as("mx"),
          count(lit(1)).as("n"))
      val planStr = pushed.queryExecution.optimizedPlan.toString +
        pushed.queryExecution.executedPlan.toString
      assert(planStr.contains("PushedAggregation"),
        s"no PushedAggregation in plan:\n$planStr")
      val r = pushed.collect()(0)
      assert(r.getDouble(0) == plain.getDouble(0))
      assert(r.getDouble(1) == plain.getDouble(1))
      assert(r.getLong(2) == plain.getLong(2))
    } finally {
      spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
    }
  }
}
