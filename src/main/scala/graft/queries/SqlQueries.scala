package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** SQL-API surface (SURVEY.md §3/§4): queries declared as SQL text over
  * registered views, exercising Catalyst's subquery decorrelation
  * (correlated scalar + EXISTS rewrites to joins — free via the SQL
  * API), explicit GROUPING SETS, plus a hand-salted two-phase
  * aggregation — the standard skew-defeating shape at 100 TB, with the
  * plain GROUP BY as its oracle (identical results by construction).
  */
object SqlQueries {
  type Q = (SparkSession, String) => DataFrame

  private def withViews(spark: SparkSession, dir: String,
      names: String*): Unit =
    names.foreach {
      case "events" =>
        Tables.events(spark, dir).createOrReplaceTempView("events")
      case n => Tables.load(spark, dir, n).createOrReplaceTempView(n)
    }

  /** Correlated scalar subquery: customers above their nation's mean
    * balance. Catalyst decorrelates to an aggregate + join. */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir, "customer")
    spark.sql(
      """SELECT c_custkey, c_nationkey FROM customer c1
        |WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = c1.c_nationkey)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Correlated EXISTS: parts that ship in quantity ≥ 49 somewhere. */
  def existsSubquery(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir, "part", "lineitem")
    spark.sql(
      """SELECT p_partkey, p_brand FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_partkey = p_partkey AND l_quantity >= 49)
        |ORDER BY p_partkey""".stripMargin)
  }

  /** Explicit GROUPING SETS (beyond rollup/cube). */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir, "orders")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        | COUNT(*) AS n,
        | CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
        | CAST(GROUPING(o_orderpriority) AS INT) AS g_pr
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_st, g_pr, o_orderstatus ASC NULLS FIRST,
        | o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** Salted two-phase aggregation: partials on (key, salt) spread a hot
    * key over 16 reducers; the final combine groups the 16 partials.
    * Decimal partials keep it bit-equal to the one-phase oracle. */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("salt", pmod(hash(col("l_orderkey")), lit(16)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(
        sum(col("l_quantity").cast(DecimalType(18, 2))).as("pq"),
        count(lit(1)).as("pn"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("pq")).cast(DoubleType).as("sum_qty"),
        sum(col("pn")).as("n"))
      .orderBy(col("l_returnflag"))

  private val havingSql =
    """SELECT l_partkey, COUNT(*) AS n,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem GROUP BY l_partkey
      |HAVING COUNT(*) >= 40
      |ORDER BY l_partkey""".stripMargin

  /** HAVING — post-aggregation predicate (Catalyst plans it as a
    * filter above the final HashAggregate, evaluated before any data
    * leaves the reducers). */
  def havingQ(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir, "lineitem")
    spark.sql(havingSql)
  }

  // The global rank used to be `RANK() OVER (ORDER BY bal DESC)` over
  // the 25-row per-nation pre-aggregate — benign at any scale, but an
  // empty window partition spec makes WindowExec WARN on every bench
  // run (and a constant PARTITION BY folds away before execution), so
  // the one harmless site buried real single-partition regressions in
  // the logs. Restated as RANK's definition — 1 + count of strictly
  // greater — over a self-join of the tiny CTE, which also exercises
  // the CTE-referenced-twice reuse path the scaladoc advertises.
  private val cteSql =
    """WITH nat_bal AS (
      |  SELECT c_nationkey, COUNT(*) AS n_cust,
      |   CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
      |  FROM customer GROUP BY c_nationkey),
      |ranked AS (
      |  SELECT a.c_nationkey, a.n_cust, a.bal,
      |   CAST(1 + COUNT(CASE WHEN b.bal > a.bal THEN 1 END) AS INT) AS r
      |  FROM nat_bal a CROSS JOIN nat_bal b
      |  GROUP BY a.c_nationkey, a.n_cust, a.bal)
      |SELECT c_nationkey, n_cust, bal, r FROM ranked
      |WHERE r <= 10 ORDER BY r, c_nationkey""".stripMargin

  /** WITH / common table expressions chained through an aggregation and
    * a self-join global rank — the CTE is referenced twice, so Catalyst
    * exercises its reuse-vs-inline choice on a real diamond shape. */
  def cteQ(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir, "customer")
    spark.sql(cteSql)
  }

  private val recursiveSql =
    """WITH RECURSIVE spine(m) AS (
      |  SELECT TIMESTAMP '1995-01-01 00:00:00'
      |  UNION ALL
      |  SELECT m + INTERVAL 1 MONTH FROM spine
      |  WHERE m < TIMESTAMP '2001-08-01 00:00:00')
      |SELECT m AS month_start, COUNT(o_orderkey) AS n_orders
      |FROM spine LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
      |GROUP BY m ORDER BY m""".stripMargin

  /** Recursive CTE (Spark 4 WITH RECURSIVE): generate a month spine by
    * recursion and left-join order counts onto it — months with zero
    * orders survive with n_orders = 0. The recursion depth (80 months)
    * sits well under Spark's cteRecursionLevelLimit; the identical SQL
    * text runs on DuckDB as the oracle. At scale the spine is a tiny
    * driver-built relation broadcast against the fact aggregation. */
  def recursiveCte(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir, "orders")
    spark.sql(recursiveSql)
  }

  private val lateralSql =
    """SELECT c_custkey, o_orderkey, o_totalprice
      |FROM customer,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
      |         WHERE o_custkey = c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2)
      |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin

  /** LATERAL correlated subquery: top-2 orders per customer — the
    * per-row dependent subquery Catalyst decorrelates into a ranked
    * join (DuckDB runs the identical text). */
  def lateralQ(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir, "customer", "orders")
    spark.sql(lateralSql)
  }

  /** Ordered string aggregation (listagg WITHIN GROUP) over the
    * distinct priority set per status, plus exact median. Spark's
    * listagg and DuckDB's ordered string_agg differ only in spelling;
    * the distinct subframe keeps the element list engine-agnostic, and
    * median interpolation differences are absorbed by round(4). */
  def listaggMedian(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir, "orders")
    spark.sql(
      """WITH p AS (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders),
        |agg AS (SELECT o_orderstatus,
        |  listagg(o_orderpriority, ',')
        |    WITHIN GROUP (ORDER BY o_orderpriority) AS prios
        | FROM p GROUP BY o_orderstatus),
        |m AS (SELECT o_orderstatus,
        |  round(median(o_totalprice), 4) AS med_price,
        |  COUNT(*) AS n FROM orders GROUP BY o_orderstatus)
        |SELECT o_orderstatus, prios, med_price, n
        |FROM agg JOIN m USING(o_orderstatus)
        |ORDER BY o_orderstatus""".stripMargin)
  }

  /** The SQL PIVOT clause (distinct from the DataFrame pivot of
    * `pivot_wide`): per-status order counts and exact price sums
    * pivoted across the five priorities — Catalyst rewrites the clause
    * into the same conditional aggregation the oracle states. */
  def pivotSql(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir, "orders")
    spark.sql(
      """SELECT * FROM (
        |  SELECT o_orderstatus, o_orderpriority,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
        |  FROM orders)
        |PIVOT (COUNT(*) AS n, CAST(SUM(p) AS DOUBLE) AS sum_price
        |  FOR o_orderpriority IN (
        |    '1-URGENT' AS urgent, '2-HIGH' AS high, '3-MEDIUM' AS medium,
        |    '4-NOT SPECIFIED' AS notspec, '5-LOW' AS low))
        |ORDER BY o_orderstatus""".stripMargin)
  }

  val defs: Map[String, Q] = Map(
    "sql_pivot" -> (pivotSql _),
    "sql_recursive_cte" -> (recursiveCte _),
    "sql_lateral" -> (lateralQ _),
    "agg_listagg_median" -> (listaggMedian _),
    "sql_scalar_subquery" -> (scalarSubquery _),
    "sql_exists_subquery" -> (existsSubquery _),
    "sql_grouping_sets" -> (groupingSets _),
    "sql_having" -> (havingQ _),
    "sql_cte" -> (cteQ _),
    "skew_salted_agg" -> (saltedAgg _))

  val sql: Map[String, String] = Map(
    "sql_pivot" ->
      """SELECT o_orderstatus,
        | COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS urgent_n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |   FILTER (o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_sum_price,
        | COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS high_n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |   FILTER (o_orderpriority = '2-HIGH') AS DOUBLE) AS high_sum_price,
        | COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS medium_n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |   FILTER (o_orderpriority = '3-MEDIUM') AS DOUBLE) AS medium_sum_price,
        | COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS notspec_n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |   FILTER (o_orderpriority = '4-NOT SPECIFIED') AS DOUBLE) AS notspec_sum_price,
        | COUNT(*) FILTER (o_orderpriority = '5-LOW') AS low_n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |   FILTER (o_orderpriority = '5-LOW') AS DOUBLE) AS low_sum_price
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "sql_recursive_cte" -> recursiveSql,
    "sql_lateral" -> lateralSql,
    "agg_listagg_median" ->
      """WITH p AS (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders),
        |agg AS (SELECT o_orderstatus,
        |  string_agg(o_orderpriority, ',' ORDER BY o_orderpriority) AS prios
        | FROM p GROUP BY o_orderstatus),
        |m AS (SELECT o_orderstatus,
        |  round(median(o_totalprice), 4) AS med_price,
        |  COUNT(*) AS n FROM orders GROUP BY o_orderstatus)
        |SELECT o_orderstatus, prios, med_price, n
        |FROM agg JOIN m USING(o_orderstatus)
        |ORDER BY o_orderstatus""".stripMargin,
    "sql_scalar_subquery" ->
      """SELECT c_custkey, c_nationkey FROM customer c1
        |WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = c1.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,
    "sql_exists_subquery" ->
      """SELECT p_partkey, p_brand FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_partkey = p_partkey AND l_quantity >= 49)
        |ORDER BY p_partkey""".stripMargin,
    "sql_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        | COUNT(*) AS n,
        | CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
        | CAST(GROUPING(o_orderpriority) AS INT) AS g_pr
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_st, g_pr, o_orderstatus ASC NULLS FIRST,
        | o_orderpriority ASC NULLS FIRST""".stripMargin,
    "sql_having" -> havingSql,
    "sql_cte" -> cteSql,
    "skew_salted_agg" ->
      """SELECT l_returnflag,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
