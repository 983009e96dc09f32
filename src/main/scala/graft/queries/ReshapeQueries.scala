package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Reshaping / layout operators (SURVEY.md §2b extensions): pivot
  * (long→wide), unpivot (wide→long), generator (explode) aggregation,
  * deterministic sampling, and partition-pruned storage layout.
  *
  * Scale notes (100 TB): pivot uses an EXPLICIT value list — without it
  * Spark runs an extra distinct scan over the fact table just to learn
  * the columns, and an unbounded value set would build an unbounded-width
  * row. Unpivot is a generator (no shuffle). The sample is a
  * multiplicative-hash systematic sample — pushed to the scan as a
  * deterministic filter, no RNG state per task, reproducible across
  * retries (Spark's `sample()` is seed+partition dependent and not
  * portable across engines, so it is exercised in ScalaTest instead).
  * The partitioned write demonstrates directory-partition pruning: the
  * read-back filter on the partition column prunes at planning time —
  * at 100 TB this is the difference between scanning one status
  * directory and all of them.
  */
object ReshapeQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Knuth multiplicative hash of a non-negative long key into
    * [0, 2^32) — the ONE definition behind every deterministic-sampling
    * query here, mirrored literally in each oracle SQL string.
    * Overflow-safe form (round-16 verdict #3): the key is folded mod
    * 2³¹ BEFORE the multiply (2³¹ · 2654435761 < Long.MAX), so key
    * domains past ~3.5e9 — where the bare key·A product wraps silently
    * in Spark and ERRORS in the DuckDB oracle — keep the two engines
    * in lockstep. Same idiom as AggQueries' quantile-sketch hash. */
  private def knuthHash(c: Column): Column =
    c % 2147483648L * 2654435761L % 4294967296L

  private val Priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val PrioAlias =
    Seq("p_urgent", "p_high", "p_medium", "p_notspec", "p_low")

  /** Pivot: order totals long→wide, one column per priority class.
    * Explicit pivot values; exact decimal sums cast back to double. */
  def pivotWide(spark: SparkSession, dir: String): DataFrame = {
    val piv = Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", Priorities)
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))))
    piv.select(col("o_orderstatus") +:
        Priorities.zip(PrioAlias).map { case (v, a) =>
          col(v).cast("double").as(a)
        }: _*)
      .orderBy(col("o_orderstatus"))
  }

  /** Unpivot: part metrics wide→long (melt). */
  def unpivotLong(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_partkey") <= 2000)
      .unpivot(
        Array(col("p_partkey")),
        Array(col("p_size").cast("double").as("p_size"),
          col("p_retailprice")),
        "metric", "value")
      .orderBy(col("p_partkey"), col("metric"))

  /** Generator aggregation: explode the corpus to words, global top-20
    * by frequency (deterministic tiebreak on the word). */
  def explodeTokens(spark: SparkSession, dir: String): DataFrame =
    fanOut(Tables.documents(spark, dir))
      .select(explode(words(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(20)

  /** Deterministic 5% systematic sample via Knuth multiplicative
    * hashing on the key — pure integer arithmetic, identical in any
    * engine, pushed down to the scan as a plain filter. */
  def sampleHash(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(knuthHash(col("o_orderkey")) % 20 === 0)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_sampled"),
        dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus"))

  /** Stratified deterministic sample (`sampleBy` analogue): a different
    * sampling rate per stratum — urgent orders kept at 20%, the rest at
    * 2% — via the same multiplicative-hash filter, so the stratum rates
    * are exact-deterministic and the filter still pushes to the scan. */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val h = knuthHash(col("o_orderkey")) % 100
    Tables.orders(spark, dir)
      .filter(
        (col("o_orderpriority") === "1-URGENT" && h < 20) ||
          (col("o_orderpriority") =!= "1-URGENT" && h < 2))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_sampled"),
        dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** Hive-style partitioned layout: write orders partitioned by status,
    * read back with a partition filter (pruned at planning time — only
    * the o_orderstatus=F directory is listed), aggregate. The oracle
    * computes the same aggregate from the unpartitioned source, so a
    * hash match proves the layout round-trip is lossless. */
  def partitionedWritePrune(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.Scratch.dir("po", dir)
    graft.Fixtures.once(out) {
      Tables.orders(spark, dir)
        .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    }
    spark.read.parquet(out)
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** Z-order (Morton) layout key: interleave the low 16 bits of two
    * scan keys so range filters on EITHER key touch few key ranges —
    * the multi-dimensional clustering trick behind Delta/Iceberg
    * Z-ORDER. At 100 TB you sort-write by zkey and data-skip on file
    * min/max; here the declared query proves the key arithmetic and
    * shows per-prefix locality (each 10-bit-prefix bucket covers a bounded
    * slice of BOTH dimensions). Pure bit arithmetic → identical in any
    * engine; the oracle SQL is generated from the same term template. */
  def layoutZorder(spark: SparkSession, dir: String): DataFrame = {
    val ck = col("o_custkey").bitwiseAND(65535L)
    val ok = col("o_orderkey").bitwiseAND(65535L)
    val zkey = (0 until 16).map { i =>
      shiftleft(shiftright(ck, i).bitwiseAND(1L), 2 * i) +
        shiftleft(shiftright(ok, i).bitwiseAND(1L), 2 * i + 1)
    }.reduce(_ + _)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), zkey.as("zkey"))
      .groupBy(shiftright(col("zkey"), 22).as("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("o_custkey")).as("min_ck"), max(col("o_custkey")).as("max_ck"),
        min(col("o_orderkey")).as("min_ok"), max(col("o_orderkey")).as("max_ok"))
      .orderBy(col("z_bucket"))
  }

  /** Class rebalancing: downsample every language class to the size of
    * the smallest one — the exact deterministic form of the
    * majority-class downsampling a training mix needs. Each row gets a
    * multiplicative-hash rank within its class (a deterministic
    * shuffle-order, so the kept subset is a uniform, reproducible
    * pick) and classes keep their first `min(class size)` rows. One
    * window shuffle on the class key + a 1-row broadcast target; the
    * per-class selection streams at any scale. Output proves the exact
    * selection (sum of kept ids), not just the kept counts. */
  def sampleRebalance(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    val target = d.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("t"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("hk"), col("doc_id"))
    d.withColumn("hk", knuthHash(col("doc_id")))
      .withColumn("rk", row_number().over(w))
      .crossJoin(broadcast(target))
      .filter(col("rk") <= col("t"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("sum_ids"))
      .orderBy(col("lang"))
  }

  val defs: Map[String, Q] = Map(
    "sample_rebalance" -> (sampleRebalance _),
    "layout_zorder" -> (layoutZorder _),
    "pivot_wide" -> (pivotWide _),
    "unpivot_long" -> (unpivotLong _),
    "explode_tokens" -> (explodeTokens _),
    "sample_hash" -> (sampleHash _),
    "sample_stratified" -> (sampleStratified _),
    "partitioned_write_prune" -> (partitionedWritePrune _))

  private def prioCase(v: String, a: String): String =
    s"""CAST(SUM(CASE WHEN o_orderpriority = '$v'
       |   THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS $a""".stripMargin

  private val zkeySql = (0 until 16).map { i =>
    s"((((o_custkey & 65535) >> $i) & 1) << ${2 * i}) + " +
      s"((((o_orderkey & 65535) >> $i) & 1) << ${2 * i + 1})"
  }.mkString(" + ")

  val sql: Map[String, String] = Map(
    "sample_rebalance" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY doc_id % 2147483648 * 2654435761 % 4294967296, doc_id) AS rk
        |  FROM documents),
        |t AS (SELECT MIN(n) AS t FROM
        |  (SELECT COUNT(*) AS n FROM documents GROUP BY lang))
        |SELECT lang, COUNT(*) AS n_kept,
        | CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        |FROM r, t WHERE rk <= t
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "layout_zorder" ->
      s"""SELECT CAST(($zkeySql) >> 22 AS BIGINT) AS z_bucket,
         | COUNT(*) AS n,
         | MIN(o_custkey) AS min_ck, MAX(o_custkey) AS max_ck,
         | MIN(o_orderkey) AS min_ok, MAX(o_orderkey) AS max_ok
         |FROM orders GROUP BY z_bucket ORDER BY z_bucket""".stripMargin,
    "pivot_wide" ->
      s"""SELECT o_orderstatus,
         | ${Priorities.zip(PrioAlias).map { case (v, a) => prioCase(v, a) }.mkString(",\n ")}
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "unpivot_long" ->
      """SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
        |FROM part WHERE p_partkey <= 2000
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
        |FROM part WHERE p_partkey <= 2000
        |ORDER BY p_partkey, metric""".stripMargin,
    "explode_tokens" ->
      """SELECT word, COUNT(*) AS n
        |FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> ''
        |GROUP BY word ORDER BY n DESC, word ASC LIMIT 20""".stripMargin,
    "sample_hash" ->
      """SELECT o_orderstatus, COUNT(*) AS n_sampled,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE o_orderkey % 2147483648 * 2654435761 % 4294967296 % 20 = 0
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "sample_stratified" ->
      """SELECT o_orderpriority, COUNT(*) AS n_sampled,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE (o_orderpriority = '1-URGENT'
        |        AND o_orderkey % 2147483648 * 2654435761 % 4294967296 % 100 < 20)
        |   OR (o_orderpriority <> '1-URGENT'
        |        AND o_orderkey % 2147483648 * 2654435761 % 4294967296 % 100 < 2)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "partitioned_write_prune" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
}
