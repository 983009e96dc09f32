package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Top level: encoders cannot be derived for classes nested in a test. */
final case class OrderLite(o_orderkey: Long, o_orderstatus: String,
    o_totalprice: Double)

/** Typed Dataset API on the batch side (SURVEY.md §1.2: `Dataset[T]`
  * with case-class Encoders where type safety helps): groupByKey +
  * mapGroups / reduceGroups agree with the untyped aggregations. */
class TypedApiSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("groupByKey.mapGroups matches the DataFrame groupBy aggregation") {
    import spark.implicits._
    val ds = Tables.orders(spark, TestSession.Sf)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .as[OrderLite]
    val typed = ds.groupByKey(_.o_orderstatus)
      .mapGroups { (status, rows) =>
        var n = 0L
        var maxPrice = Double.MinValue
        rows.foreach { r => n += 1; if (r.o_totalprice > maxPrice) maxPrice = r.o_totalprice }
        (status, n, maxPrice)
      }
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    val untyped = Tables.orders(spark, TestSession.Sf)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), max(col("o_totalprice")).as("mx"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(typed == untyped)
  }

  test("cogroup merges two keyed datasets in one pass per key") {
    import spark.implicits._
    val orders = Tables.orders(spark, TestSession.Sf)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .as[OrderLite]
      .groupByKey(_.o_orderkey)
    val lines = Tables.lineitem(spark, TestSession.Sf)
      .select(col("l_orderkey"), col("l_quantity"))
      .as[(Long, Double)]
      .groupByKey(_._1)
    // per order: line count + total quantity, orders with no lines kept
    // (cogroup is a full outer join shape — both sides stream per key,
    // co-partitioned on one shuffle each, never materialized whole)
    val merged = orders.cogroup(lines) { (key, os, ls) =>
      val hasOrder = os.nonEmpty
      var n = 0L; var qty = 0.0
      ls.foreach { l => n += 1; qty += l._2 }
      if (hasOrder) Iterator.single((key, n, qty)) else Iterator.empty
    }.collect().map(t => t._1 -> ((t._2, math.round(t._3)))).toMap
    val expected = Tables.orders(spark, TestSession.Sf)
      .join(Tables.lineitem(spark, TestSession.Sf),
        col("o_orderkey") === col("l_orderkey"), "left_outer")
      .groupBy(col("o_orderkey"))
      .agg(count(col("l_orderkey")).as("n"),
        coalesce(sum(col("l_quantity")), lit(0.0)).as("qty"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), math.round(r.getDouble(2)))))
      .toMap
    assert(merged == expected)
  }

  test("reduceGroups folds to the per-key maximum") {
    import spark.implicits._
    val ds = Tables.orders(spark, TestSession.Sf)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .as[OrderLite]
    val reduced = ds.groupByKey(_.o_orderstatus)
      .reduceGroups((a, b) => if (a.o_totalprice >= b.o_totalprice) a else b)
      .collect().map { case (k, v) => k -> v.o_totalprice }.toMap
    val expected = Tables.orders(spark, TestSession.Sf)
      .groupBy(col("o_orderstatus")).agg(max(col("o_totalprice")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(reduced == expected)
  }
}
