package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Window-function surface (SURVEY.md §2b "Window functions"): ranking,
  * analytic lag/lead/first/last, row frames, range frames, per-group
  * top-k.
  *
  * Scale notes: every window here partitions by a key (nation / user /
  * brand) so the sort is per-partition after one hash exchange — no
  * global sort, no single-reducer window. Ordering keys are made total
  * (tiebreak on a unique id) so results are deterministic under any
  * partitioning.
  */
object WindowQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Ranking family: suppliers ranked by balance within their nation. */
  def rankQ(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.supplier(spark, dir)
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal").desc, col("s_suppkey").asc)
    s.select(
        col("s_suppkey"), col("s_nationkey"), col("s_acctbal"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"))
      .orderBy(col("s_suppkey"))
  }

  /** Analytic family over each user's event timeline. lag/lead move raw
    * doubles (no arithmetic) so values hash exactly. */
  def lagLeadQ(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    e.select(
        col("event_id"), col("user_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        first(col("event_type")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("first_type"))
      .orderBy(col("event_id"))
  }

  /** Running total per customer: rows-frame cumulative sum, exact via
    * per-element decimal cast (summation order then cannot matter). */
  def runningSumQ(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast(DoubleType).as("running_spend"),
        count(lit(1)).over(w).as("nth_order"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Range frame over event time: per user, events in the trailing hour
    * (inclusive), keyed on epoch seconds. */
  def rangeFrameQ(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("epoch_s", unix_timestamp(col("ts")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("epoch_s").asc)
      .rangeBetween(-3600L, 0L)
    e.select(
        col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_trailing_1h"))
      .orderBy(col("event_id"))
  }

  /** Per-group top-k: 3 priciest parts per brand (rn filter — the
    * standard shuffle-once top-k; at scale this beats a global sort
    * because each brand's heap lives in one task). */
  def topKPerGroupQ(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
    p.select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("p_brand"), col("rn"))
  }

  /** The same per-group top-k through the CUSTOM whole-operator
    * (graft.operators.TopKPerGroup: logical node → injected
    * SparkStrategy → bounded-heap partial/final SparkPlans). The map
    * side cuts every partition to ≤ k rows per group BEFORE the
    * shuffle — the window formulation above ships and fully sorts every
    * group. Tie-free ordering (unique key suffix) makes it
    * oracle-exact. */
  def topKCustomExec(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    graft.operators.TopKPerGroup(
      src,
      Seq(col("l_returnflag")),
      struct((col("l_extendedprice") * -1).as("neg_price"),
        col("l_orderkey"), col("l_linenumber")),
      descending = false, k = 5)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("rn"))
      .orderBy(col("l_returnflag"), col("rn"))
  }

  /** Distribution window functions: percent_rank / cume_dist (exact
    * small-int ratios → identical doubles in any engine) and nth_value
    * over the full partition frame. */
  def distributionQ(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal").desc, col("s_suppkey").asc)
    val wFull = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        nth_value(col("s_suppkey"), 2).over(wFull).as("second_richest"))
      .orderBy(col("s_suppkey"))
  }

  /** Running DISTINCT count per key — an operator Spark's window
    * functions lack (`countDistinct(...).over(w)` is unsupported),
    * composed from what they have: `size(collect_set(x).over(w))`.
    * Safe exactly when the tracked domain is small and bounded (5
    * priorities here): the per-row set state is O(domain), independent
    * of partition length — at an unbounded domain you'd switch to the
    * sketch rollup (`agg_hll_rollup`) instead, which is why both
    * shapes are declared. */
  def distinctCountQ(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        size(collect_set(col("o_orderpriority")).over(w)).cast("long")
          .as("nd_prio"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  val defs: Map[String, Q] = Map(
    "window_distinct_count" -> (distinctCountQ _),
    "window_rank" -> (rankQ _),
    "window_distribution" -> (distributionQ _),
    "window_lag_lead" -> (lagLeadQ _),
    "window_running_sum" -> (runningSumQ _),
    "window_range_frame" -> (rangeFrameQ _),
    "window_topk_per_group" -> (topKPerGroupQ _),
    "topk_custom_exec" -> (topKCustomExec _))

  val sql: Map[String, String] = Map(
    "window_distinct_count" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | COUNT(DISTINCT o_orderpriority) OVER
        |  (PARTITION BY o_custkey
        |   ORDER BY o_orderdate ASC, o_orderkey ASC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nd_prio
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "window_distribution" ->
      """SELECT s_suppkey, s_nationkey,
        | round(PERCENT_RANK() OVER w, 6) AS pct_rank,
        | round(CUME_DIST() OVER w, 6) AS cume,
        | NTH_VALUE(s_suppkey, 2) OVER
        |  (PARTITION BY s_nationkey
        |   ORDER BY s_acctbal DESC, s_suppkey ASC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |  AS second_richest
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey
        | ORDER BY s_acctbal DESC, s_suppkey ASC)
        |ORDER BY s_suppkey""".stripMargin,
    "window_rank" ->
      """SELECT s_suppkey, s_nationkey, s_acctbal,
        | CAST(ROW_NUMBER() OVER w AS INT) AS rn,
        | CAST(RANK() OVER w AS INT) AS rnk,
        | CAST(DENSE_RANK() OVER w AS INT) AS drnk,
        | CAST(NTILE(4) OVER w AS INT) AS quartile
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey
        | ORDER BY s_acctbal DESC, s_suppkey ASC)
        |ORDER BY s_suppkey""".stripMargin,
    "window_lag_lead" ->
      """SELECT event_id, user_id, value,
        | LAG(value, 1) OVER w AS prev_value,
        | LEAD(value, 1) OVER w AS next_value,
        | FIRST_VALUE(event_type) OVER
        |  (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |ORDER BY event_id""".stripMargin,
    "window_running_sum" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_spend,
        | COUNT(*) OVER w AS nth_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        | ORDER BY o_orderdate ASC, o_orderkey ASC
        | ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "window_range_frame" ->
      """SELECT event_id, user_id, COUNT(*) OVER w AS n_trailing_1h
        |FROM (SELECT *, epoch_ms(ts) // 1000 AS epoch_s FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s ASC
        | RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "window_topk_per_group" ->
      """SELECT p_brand, p_partkey, p_retailprice, rn FROM (
        | SELECT p_brand, p_partkey, p_retailprice,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
        |   ORDER BY p_retailprice DESC, p_partkey ASC) AS INT) AS rn
        | FROM part)
        |WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin,
    "topk_custom_exec" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rn FROM (
        | SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |   ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS INT) AS rn
        | FROM lineitem)
        |WHERE rn <= 5 ORDER BY l_returnflag, rn""".stripMargin)
}
