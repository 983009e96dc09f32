package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Projection / filter / distinct / sort / limit / set-operation surface
  * (SURVEY.md §2b). These shapes exist to prove pushdown: the filters and
  * projections here reach the parquet scan (PushedFilters / ReadSchema in
  * `.explain("formatted")`), so at 100 TB the scan reads only the needed
  * columns and row groups.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Projection with computed columns + rename; filter pushed to scan. */
  def scanProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") <= 80)
      .select(
        col("l_orderkey").as("okey"),
        col("l_linenumber").as("line"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("net_price"),
        col("l_returnflag"))
      .orderBy(col("okey"), col("line"))

  /** Compound predicates: IN, BETWEEN, LIKE, AND/OR mixtures. */
  def filterPredicates(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(
        col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          (col("o_totalprice").between(10000.0, 150000.0) ||
            col("o_orderstatus") === "F") &&
          col("o_orderpriority").like("%-%"))
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** IS NULL / null-safe predicates: lag introduces genuine nulls, then
    * filter on them (fixtures themselves are null-free). */
  def filterNulls(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull)
      .select(col("event_id"), col("user_id"))
      .orderBy(col("event_id"))
  }

  /** Distinct projection. */
  def distinctProjection(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Multi-key total sort, mixed direction. */
  def sortMulti(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_brand"), col("p_retailprice"), col("p_partkey"))
      .orderBy(col("p_brand").asc, col("p_retailprice").desc,
        col("p_partkey").asc)

  /** Global top-k: plans as TakeOrderedAndProject (per-partition heaps +
    * k-merge on the driver — no global sort, the shape that survives
    * 100 TB). Tie-broken to a total order. */
  def topK(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      .limit(25)

  private def urgent(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
  private def pricey(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 150000.0).select(col("o_orderkey"))

  /** UNION ALL (bag semantics; duplicates survive). */
  def unionAll(spark: SparkSession, dir: String): DataFrame =
    urgent(spark, dir).unionAll(pricey(spark, dir))
      .orderBy(col("o_orderkey"))

  /** UNION DISTINCT. */
  def unionDistinct(spark: SparkSession, dir: String): DataFrame =
    urgent(spark, dir).union(pricey(spark, dir)).distinct()
      .orderBy(col("o_orderkey"))

  /** INTERSECT (distinct semantics). */
  def intersectQ(spark: SparkSession, dir: String): DataFrame =
    urgent(spark, dir).intersect(pricey(spark, dir))
      .orderBy(col("o_orderkey"))

  /** EXCEPT (distinct semantics). */
  def exceptQ(spark: SparkSession, dir: String): DataFrame =
    urgent(spark, dir).except(pricey(spark, dir))
      .orderBy(col("o_orderkey"))

  /** EXCEPT ALL (bag semantics) on returnflag multiset per status. */
  def exceptAllQ(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_quantity") >= 25).select(col("l_orderkey"))
      .exceptAll(li.filter(col("l_quantity") >= 40).select(col("l_orderkey")))
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("l_orderkey"))
  }

  /** INTERSECT ALL (bag semantics): each orderkey survives min(m, n) times
    * across the two filtered multisets. Spark plans this as one aggregate
    * computing both multiplicities plus a generator replaying min(m, n)
    * copies — a single shuffle on the compared row, same scale shape as
    * EXCEPT ALL. */
  def intersectAllQ(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_quantity") >= 25).select(col("l_orderkey"))
      .intersectAll(li.filter(col("l_quantity") >= 40).select(col("l_orderkey")))
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("l_orderkey"))
  }

  /** 2-D SKYLINE (pareto frontier): the parts no other part beats on
    * BOTH (cheaper-or-equal price, larger-or-equal size, strictly
    * better in one). No O(n²) dominance self-join: for two dimensions
    * the skyline is one sorted prefix-max pass — a part survives iff
    * its size equals its price's best AND strictly exceeds every
    * strictly-cheaper price's best. Distributed shape (the
    * `pipeline_shard_pack` prefix pattern): hash-agg to per-price
    * bests (the only corpus-wide pass), range-bucket the DISTINCT
    * prices, per-bucket maxima prefix-fold on the driver (B longs),
    * broadcast offsets, and the within-bucket running max is a
    * partitioned window — no single-partition global window even when
    * distinct prices reach the millions. The oracle is an INDEPENDENT
    * formulation (NOT EXISTS dominance), so the hash match proves the
    * prefix-max algebra, not just restates it. */
  def skylinePareto(spark: SparkSession, dir: String): DataFrame =
    skylineOf(Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size")))

  /** The two-phase prefix-max skyline over a `(p_partkey,
    * p_retailprice, p_size)` frame — `private[graft]` so the spec can
    * pin it against brute-force dominance on synthetic frontiers
    * (ties, duplicates, bucket boundaries). */
  private[graft] def skylineOf(p: DataFrame): DataFrame = {
    val spark = p.sparkSession
    // per-price best size: the only pass over the full table
    val best = p.groupBy(col("p_retailprice"))
      .agg(max(col("p_size")).as("bs"))
    val bounds = best.agg(min(col("p_retailprice")),
      max(col("p_retailprice")), count(lit(1))).collect()(0)
    if (bounds.isNullAt(0))
      return p.limit(0)
    val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
    // Each bucket is ONE window partition, so B scales with the
    // distinct-price count (already computed by the bounds agg):
    // ~32k prices per bucket bounds the per-task sort at any corpus
    // size, the floor of 16 keeps small inputs spread across cores,
    // and the 64k cap keeps the driver prefix-fold and the broadcast
    // offset frame at B longs — trivially small either way.
    val Buckets = math.max(16, math.min(65536,
      ((bounds.getLong(2) + 32767) / 32768).toInt))
    val span = math.max((hi - lo) / Buckets, 1e-9)
    val bucketed = best.withColumn("bkt",
      least(floor((col("p_retailprice") - lit(lo)) / lit(span)),
        lit(Buckets - 1L)).cast("long"))
    // driver prefix-max over B bucket maxima: rmoff(bkt) = best size
    // among all strictly-cheaper buckets
    val bucketMax = bucketed.groupBy(col("bkt"))
      .agg(max(col("bs")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val offsets = (0 until Buckets).scanLeft(Int.MinValue)(
      (acc, b) => math.max(acc, bucketMax.getOrElse(b.toLong, Int.MinValue)))
    import spark.implicits._
    val offDf = broadcast((0 until Buckets)
      .map(b => (b.toLong, offsets(b))).toDF("bkt", "rmoff"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bkt")).orderBy(col("p_retailprice"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val rm = bucketed.join(offDf, "bkt")
      .withColumn("rm", greatest(
        coalesce(max(col("bs")).over(w), lit(Int.MinValue)),
        col("rmoff")))
    p.join(rm, "p_retailprice")
      .filter(col("p_size") === col("bs") && col("p_size") > col("rm"))
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .orderBy(col("p_retailprice"), col("p_partkey"))
  }

  val defs: Map[String, Q] = Map(
    "skyline_pareto" -> (skylinePareto _),
    "scan_project" -> (scanProject _),
    "filter_predicates" -> (filterPredicates _),
    "filter_nulls" -> (filterNulls _),
    "distinct_projection" -> (distinctProjection _),
    "sort_multi" -> (sortMulti _),
    "topk" -> (topK _),
    "set_union_all" -> (unionAll _),
    "set_union_distinct" -> (unionDistinct _),
    "set_intersect" -> (intersectQ _),
    "set_except" -> (exceptQ _),
    "set_except_all" -> (exceptAllQ _),
    "set_intersect_all" -> (intersectAllQ _))

  val sql: Map[String, String] = Map(
    "skyline_pareto" ->
      """SELECT p_partkey, p_retailprice, p_size FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice
        |    AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice
        |         OR q.p_size > p.p_size))
        |ORDER BY p_retailprice, p_partkey""".stripMargin,
    "scan_project" ->
      """SELECT l_orderkey AS okey, l_linenumber AS line,
        | l_extendedprice*(1.0-l_discount) AS net_price, l_returnflag
        |FROM lineitem WHERE l_orderkey <= 80
        |ORDER BY okey, line""".stripMargin,
    "filter_predicates" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        | AND (o_totalprice BETWEEN 10000.0 AND 150000.0 OR o_orderstatus = 'F')
        | AND o_orderpriority LIKE '%-%'
        |ORDER BY o_orderkey""".stripMargin,
    "filter_nulls" ->
      """SELECT event_id, user_id FROM (
        | SELECT event_id, user_id,
        |  LAG(event_type, 1) OVER (PARTITION BY user_id
        |   ORDER BY ts ASC, event_id ASC) AS prev_type
        | FROM events)
        |WHERE prev_type IS NULL ORDER BY event_id""".stripMargin,
    "distinct_projection" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "sort_multi" ->
      """SELECT p_brand, p_retailprice, p_partkey FROM part
        |ORDER BY p_brand ASC, p_retailprice DESC, p_partkey ASC""".stripMargin,
    "topk" ->
      """SELECT l_extendedprice, l_orderkey, l_linenumber FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 25""".stripMargin,
    "set_union_all" ->
      """SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION ALL
        |SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0
        |ORDER BY o_orderkey""".stripMargin,
    "set_union_distinct" ->
      """SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION
        |SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0
        |ORDER BY o_orderkey""".stripMargin,
    "set_intersect" ->
      """SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0
        |ORDER BY o_orderkey""".stripMargin,
    "set_except" ->
      """SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |EXCEPT
        |SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0
        |ORDER BY o_orderkey""".stripMargin,
    "set_except_all" ->
      """SELECT l_orderkey, COUNT(*) AS n FROM (
        | SELECT l_orderkey FROM lineitem WHERE l_quantity >= 25
        | EXCEPT ALL
        | SELECT l_orderkey FROM lineitem WHERE l_quantity >= 40)
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "set_intersect_all" ->
      """SELECT l_orderkey, COUNT(*) AS n FROM (
        | SELECT l_orderkey FROM lineitem WHERE l_quantity >= 25
        | INTERSECT ALL
        | SELECT l_orderkey FROM lineitem WHERE l_quantity >= 40)
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)
}
