package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The remaining TPC-H query shapes (Q2/Q6/Q9/Q11/Q13/Q15/Q16/Q17/Q18/
  * Q19/Q20/Q21/Q22), adapted to the fixture star schema — together with
  * [[TpchQueries]] this covers all 22 classic shapes. The fixtures have
  * no partsupp table and omit several TPC-H columns
  * (ps_supplycost/availqty, l_shipmode, l_receiptdate, p_container,
  * c_phone — FIXTURES.md), so the partsupp-derived queries use the
  * lineitem part↔supplier relation as the part-supplier catalog and the
  * waiting/phone predicates use fixture analogues (l_returnflag='R' as
  * the late marker, c_name digits as the country code). Every query
  * keeps its defining TPC-H plan shape: Q2's correlated min, Q13's
  * outer-join distribution, Q15's view + scalar max, Q17's correlated
  * avg, Q18's having-in, Q21's exists/not-exists pair, Q22's
  * anti-join + scalar avg.
  *
  * Plan shape at scale: dims broadcast (part/supplier/nation/region and
  * every scalar aggregate); the only repeated-fact shuffles are
  * per-key pre-aggregations (orderkey/partkey/suppkey), which
  * partial-aggregate map-side before exchanging; Q21's self-joins hash
  * on orderkey once each for the semi and anti sides.
  */
object TpchDeepQueries {
  type Q = (SparkSession, String) => DataFrame

  private def rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Q2-style: for every STANDARD small part, the minimum-unit-cost
    * supplier within one region. The part↔supplier cost catalog is
    * derived from lineitem (min unit price ever charged); the
    * correlated min becomes a per-part agg joined back on equality. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val suppRegion = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)
        .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name"))
    val ps = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
      .join(broadcast(suppRegion), col("l_suppkey") === col("s_suppkey"))
    val minCost = ps.groupBy(col("l_partkey").as("mpk"))
      .agg(min(col("cost")).as("mincost"))
    val p = Tables.part(spark, dir)
      .filter(col("p_type") === "STANDARD" && col("p_size") < 25)
      .select(col("p_partkey"))
    ps.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(minCost,
        col("l_partkey") === col("mpk") && col("cost") === col("mincost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  /** Q6-style forecast revenue: one tight scan-filter-agg — the query
    * whose whole cost is the scan, so pushdown shows up directly. */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 4)
        .as("revenue"))

  /** Q9-style product-type profit by nation and order year; the
    * supply-cost term uses the part's retail price (no ps_supplycost in
    * the fixtures). */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).filter(col("p_name").like("%gear%"))
      .select(col("p_partkey"), col("p_retailprice"))
    val sn = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val amount = rev - lit(0.5) * col("p_retailprice") * col("l_quantity")
    Tables.lineitem(spark, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
      .agg(dsum(amount, 4).as("sum_profit"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  /** Q11-style important stock: parts whose value (shipped by one
    * nation's suppliers) exceeds a fraction of that nation's total —
    * grouped agg + scalar-subquery threshold. */
  def q11ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    val natSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .filter(col("n_name") === "NATION_13")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val base = Tables.lineitem(spark, dir)
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
    val total = base.agg(dsum(col("l_extendedprice"), 4).as("tv"))
    base.groupBy(col("l_partkey").as("ps_partkey"))
      .agg(dsum(col("l_extendedprice"), 4).as("part_value"))
      .crossJoin(broadcast(total))
      .filter(col("part_value") > lit(0.001) * col("tv"))
      .select(col("ps_partkey"), col("part_value"))
      .orderBy(col("part_value").desc, col("ps_partkey"))
  }

  /** Q13-style customer order-count distribution: LEFT join with the
    * filter in the join condition (not WHERE — customers with zero
    * qualifying orders must survive with c_count = 0). */
  def q13CustomerDistribution(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "5-LOW")
    Tables.customer(spark, dir)
      .join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q15-style top supplier: quarterly revenue view + scalar MAX — the
    * supplier(s) achieving the maximum revenue. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val revenue = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(dsum(rev, 4).as("total_revenue"))
    val maxRev = revenue.agg(max(col("total_revenue")).as("mr"))
    revenue.crossJoin(broadcast(maxRev))
      .filter(col("total_revenue") === col("mr"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("supplier_no") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** Q16-style parts/supplier relationship: distinct supplier count per
    * (brand, type, size) bucket, excluding low-balance suppliers via
    * anti join (the NOT IN subquery). */
  def q16PartsSupplier(spark: SparkSession, dir: String): DataFrame = {
    val excluded = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 500).select(col("s_suppkey"))
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    Tables.lineitem(spark, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** Q17-style small-quantity revenue: lines under 20% of their part's
    * average quantity (the correlated avg becomes a per-part agg joined
    * back), total extended price over 7 years. */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val partAvg = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey").as("apk"))
      .agg(davg(col("l_quantity"), 4).as("avg_qty"))
    val p = Tables.part(spark, dir).filter(col("p_brand") === "Brand#3")
      .select(col("p_partkey"))
    Tables.lineitem(spark, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(partAvg, col("l_partkey") === col("apk"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(round(dsum(col("l_extendedprice"), 4) / lit(7.0), 4)
        .as("avg_yearly"))
  }

  /** Q18-style large-volume customers: orders whose total quantity
    * clears a threshold (HAVING over a fact pre-agg), joined back to
    * orders + customer for the report. */
  def q18LargeVolume(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity"), 4).as("sum_qty"))
      .filter(col("sum_qty") > 250)
    big.join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Q19-style discounted revenue: three disjunctive (brand, size band,
    * quantity band) arms evaluated in one scan — the classic
    * multi-predicate OR that must stay a single pass. */
  def q19DiscountedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    Tables.lineitem(spark, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
      .agg(dsum(rev, 4).as("revenue"))
  }

  /** Q20-style part promotion: suppliers who shipped more than 30% of a
    * red part's 1996 volume (the availqty>half-shipped predicate,
    * re-expressed over the lineitem catalog). */
  def q20PartPromotion(spark: SparkSession, dir: String): DataFrame = {
    val redParts = Tables.part(spark, dir)
      .filter(col("p_name").like("red%")).select(col("p_partkey"))
    val base = Tables.lineitem(spark, dir)
      .filter(year(col("l_shipdate")) === 1996)
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
    val perSupplierPart = base
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(dsum(col("l_quantity"), 4).as("sq"))
    val perPart = base
      .groupBy(col("l_partkey").as("tpk"))
      .agg(dsum(col("l_quantity"), 4).as("tq"))
    perSupplierPart
      .join(perPart, col("l_partkey") === col("tpk"))
      .filter(col("sq") > lit(0.3) * col("tq"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name")).distinct()
      .orderBy(col("s_suppkey"))
  }

  /** Q21-style suppliers who kept orders waiting: R-flagged lines in
    * finished multi-supplier orders where this supplier is the ONLY one
    * flagged — the exists (semi) / not-exists (anti) self-join pair. */
  def q21SuppliersWaiting(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"))
    val l1 = l.filter(col("l_returnflag") === "R")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"))
    val others = l.select(col("l_orderkey").as("k2"),
      col("l_suppkey").as("s2"))
    val othersR = l.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
    l1.join(others,
        col("l_orderkey") === col("k2") && col("s2") =!= col("l_suppkey"),
        "left_semi")
      .join(othersR,
        col("l_orderkey") === col("k3") && col("s3") =!= col("l_suppkey"),
        "left_anti")
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  /** Q22-style global sales opportunity: above-average-balance
    * customers with no recent orders, grouped by the country-code
    * analogue (trailing digits of c_name — the fixtures have no
    * c_phone). Scalar-avg subquery + anti join. */
  def q22GlobalSales(spark: SparkSession, dir: String): DataFrame = {
    val avgBal = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 0.0)
      .agg(davg(col("c_acctbal"), 4).as("a"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    Tables.customer(spark, dir)
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("a"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(substring(col("c_name"), 17, 2).as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        dsum(col("c_acctbal"), 4).as("totacctbal"))
      .orderBy(col("cntrycode"))
  }

  val defs: Map[String, Q] = Map(
    "q2_min_cost_supplier" -> (q2MinCostSupplier _),
    "q6_forecast_revenue" -> (q6ForecastRevenue _),
    "q9_product_profit" -> (q9ProductProfit _),
    "q11_important_stock" -> (q11ImportantStock _),
    "q13_customer_distribution" -> (q13CustomerDistribution _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q16_parts_supplier" -> (q16PartsSupplier _),
    "q17_small_qty_revenue" -> (q17SmallQtyRevenue _),
    "q18_large_volume" -> (q18LargeVolume _),
    "q19_discounted_revenue" -> (q19DiscountedRevenue _),
    "q20_part_promotion" -> (q20PartPromotion _),
    "q21_suppliers_waiting" -> (q21SuppliersWaiting _),
    "q22_global_sales" -> (q22GlobalSales _))

  private val revSql =
    "CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE)"

  val sql: Map[String, String] = Map(
    "q2_min_cost_supplier" ->
      """WITH ps AS (SELECT l_partkey, l_suppkey,
        |  MIN(l_extendedprice/l_quantity) AS cost FROM lineitem GROUP BY 1,2),
        |psr AS (SELECT l_partkey, s_acctbal, s_name, n_name, cost FROM ps
        |  JOIN supplier ON l_suppkey=s_suppkey
        |  JOIN nation ON s_nationkey=n_nationkey
        |  JOIN region ON n_regionkey=r_regionkey
        |  WHERE r_name='ASIA'),
        |mc AS (SELECT l_partkey AS mpk, MIN(cost) AS mincost
        |  FROM psr GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, p_partkey, cost
        |FROM psr JOIN part ON l_partkey=p_partkey
        |JOIN mc ON mpk=l_partkey AND cost=mincost
        |WHERE p_type='STANDARD' AND p_size < 25
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        | AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        | AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) - 0.5*p_retailprice*l_quantity
        |   AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey=p_partkey
        |JOIN supplier ON l_suppkey=s_suppkey
        |JOIN orders ON l_orderkey=o_orderkey
        |JOIN nation ON s_nationkey=n_nationkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY n_name, o_year ORDER BY n_name, o_year DESC""".stripMargin,
    "q11_important_stock" ->
      """SELECT l_partkey AS ps_partkey,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS part_value
        |FROM lineitem JOIN supplier ON l_suppkey=s_suppkey
        |JOIN nation ON s_nationkey=n_nationkey
        |WHERE n_name='NATION_13'
        |GROUP BY 1
        |HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) >
        | 0.001*(SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |  FROM lineitem JOIN supplier ON l_suppkey=s_suppkey
        |  JOIN nation ON s_nationkey=n_nationkey WHERE n_name='NATION_13')
        |ORDER BY part_value DESC, ps_partkey""".stripMargin,
    "q13_customer_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        | SELECT c_custkey, COUNT(o_orderkey) AS c_count
        | FROM customer LEFT JOIN orders
        |  ON c_custkey=o_custkey AND o_orderpriority <> '5-LOW'
        | GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH rev AS (SELECT l_suppkey AS supplier_no,
         | $revSql AS total_revenue
         | FROM lineitem
         | WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         | GROUP BY 1)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN rev ON s_suppkey=supplier_no
         |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,
    "q16_parts_supplier" ->
      """SELECT p_brand, p_type, p_size,
        | COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey=p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        | AND p_size IN (1,4,7,10,13,16,19,22)
        | AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 500)
        |GROUP BY 1,2,3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q17_small_qty_revenue" ->
      """WITH pa AS (SELECT l_partkey AS apk,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)/COUNT(*) AS avg_qty
        | FROM lineitem GROUP BY 1)
        |SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)/7.0, 4)
        | AS avg_yearly
        |FROM lineitem JOIN part ON l_partkey=p_partkey
        |JOIN pa ON l_partkey=apk
        |WHERE p_brand='Brand#3' AND l_quantity < 0.2*avg_qty""".stripMargin,
    "q18_large_volume" ->
      """WITH big AS (SELECT l_orderkey,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        | FROM lineitem GROUP BY 1)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
        |FROM big JOIN orders ON l_orderkey=o_orderkey
        |JOIN customer ON o_custkey=c_custkey
        |WHERE sum_qty > 250
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q19_discounted_revenue" ->
      s"""SELECT $revSql AS revenue
         |FROM lineitem JOIN part ON l_partkey=p_partkey
         |WHERE (p_brand='Brand#1' AND p_size BETWEEN 1 AND 5
         |    AND l_quantity BETWEEN 1 AND 11)
         | OR (p_brand='Brand#2' AND p_size BETWEEN 1 AND 10
         |    AND l_quantity BETWEEN 10 AND 20)
         | OR (p_brand='Brand#3' AND p_size BETWEEN 1 AND 15
         |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q20_part_promotion" ->
      """WITH sp AS (SELECT l_suppkey, l_partkey,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sq
        |  FROM lineitem JOIN part ON l_partkey=p_partkey
        |  WHERE p_name LIKE 'red%' AND year(l_shipdate)=1996 GROUP BY 1,2),
        |pt AS (SELECT l_partkey AS tpk,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS tq
        |  FROM lineitem JOIN part ON l_partkey=p_partkey
        |  WHERE p_name LIKE 'red%' AND year(l_shipdate)=1996 GROUP BY 1)
        |SELECT DISTINCT s_suppkey, s_name FROM supplier
        |JOIN sp ON s_suppkey=l_suppkey JOIN pt ON l_partkey=tpk
        |WHERE sq > 0.3*tq ORDER BY s_suppkey""".stripMargin,
    "q21_suppliers_waiting" ->
      """WITH l1 AS (SELECT l_orderkey, l_suppkey FROM lineitem l1
        | JOIN orders ON l_orderkey=o_orderkey
        | WHERE l_returnflag='R' AND o_orderstatus='F'
        | AND EXISTS (SELECT 1 FROM lineitem l2
        |   WHERE l2.l_orderkey=l1.l_orderkey AND l2.l_suppkey<>l1.l_suppkey)
        | AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |   WHERE l3.l_orderkey=l1.l_orderkey AND l3.l_suppkey<>l1.l_suppkey
        |   AND l3.l_returnflag='R'))
        |SELECT s_name, COUNT(*) AS numwait
        |FROM l1 JOIN supplier ON l_suppkey=s_suppkey
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin,
    "q22_global_sales" ->
      """WITH avgbal AS (SELECT
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)/COUNT(*) AS a
        | FROM customer WHERE c_acctbal > 0.0)
        |SELECT substring(c_name, 17, 2) AS cntrycode, COUNT(*) AS numcust,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
        |FROM customer, avgbal WHERE c_acctbal > a
        |AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey
        |  AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin)
}
