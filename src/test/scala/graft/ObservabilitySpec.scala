package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Query observability: `observe()` metrics ride the query (collected
  * on the driver as accumulator-style aggregates, no extra pass over
  * the data) — the mechanism for row-count / quality gauges on 100 TB
  * pipelines where a separate count() would double the scan. */
class ObservabilitySpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("observe() collects row and sum metrics during the main action") {
    val obs = Observation("orders_metrics")
    val df = Tables.orders(spark, TestSession.Sf)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
      .filter(col("o_orderstatus") === "F")
    val filtered = df.count()
    val metrics = obs.get
    val total = Tables.orders(spark, TestSession.Sf).count()
    assert(metrics("n_rows") == total,
      s"observed ${metrics("n_rows")} of $total")
    assert(metrics("sum_price").asInstanceOf[Double] > 0.0)
    assert(filtered < total)
  }
}
