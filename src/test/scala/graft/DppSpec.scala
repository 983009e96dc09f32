package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition pruning: when a partitioned fact joins a FILTERED
  * dim on the partition column, Spark plants a dynamic-pruning
  * subquery so only the dim-selected partition directories are read —
  * the runtime analogue of the static pruning partitioned_write_prune
  * demonstrates. At 100 TB this is what keeps a star join from
  * scanning every date/status directory of the fact table. */
class DppSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private lazy val factDir: String = {
    val d = java.nio.file.Files.createTempDirectory("dpp_fact").toString
    Tables.orders(spark, TestSession.Sf)
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(d)
    d
  }

  test("filtered dim join plants a dynamic-pruning subquery on the fact scan") {
    val fact = spark.read.parquet(factDir)
    // dim as its own parquet table, FILTERED ON A NON-KEY COLUMN: a
    // filter on the join key itself is transitively inferred onto the
    // fact side as a STATIC partition filter (constraint propagation —
    // no DPP needed); only when the selected key values are unknowable
    // until runtime does the dynamic-pruning subquery appear
    val dimDir = java.nio.file.Files.createTempDirectory("dpp_dim").toString
    Tables.orders(spark, TestSession.Sf)
      .select(col("o_orderstatus").as("st")).distinct()
      .withColumn("label", concat(lit("status_"), col("st")))
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("label") === "status_F")
    val q = fact.join(dim, col("o_orderstatus") === col("st"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n$plan")
    // and the result equals the statically-filtered computation
    val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = Tables.orders(spark, TestSession.Sf)
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }
}
