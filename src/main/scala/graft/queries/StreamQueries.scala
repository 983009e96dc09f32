package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-mode declarations of the streaming windows (Spark guarantees
  * batch/stream semantic parity for time-window aggregations, so the
  * DuckDB oracle checks the streaming semantics; the readStream
  * execution of the same transforms is exercised in StreamingSpec).
  */
object StreamQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Tumbling 1-hour windows per event type. */
  def tumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"),
        col("sum_value"))
      .orderBy(col("w_start"), col("event_type"))

  /** Sliding 1-hour window, 15-minute slide, per event type. */
  def sliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))
      .orderBy(col("w_start"), col("event_type"))

  /** 30-minute-gap session windows per user (oracle: gaps-and-islands —
    * a new session starts when the gap to the previous event is ≥ the
    * timeout, matching session_window's [ts, ts+gap) merge rule). */
  def sessions(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("session_start"), col("user_id"), col("n"),
        col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** DYNAMIC-gap session windows (per-event timeout: purchase 60 min,
    * click 15, else 30 — the engagement-dependent sessionization
    * shape), declared through the EXACT transform StreamingSpec runs
    * on micro-batches. Oracle: running-MAX gaps-and-islands — a new
    * session starts when ts reaches the max (ts+gap) of every prior
    * event, which is session_window's merge-on-overlap rule (the
    * previous event's gap alone is NOT enough once gaps vary). */
  def sessionsDynamic(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingOps.sessionCountsDynamic(
        Tables.events(spark, dir), withWatermark = false)
      .orderBy(col("user_id"), col("session_start"))

  /** Stream-stream interval join (purchases × same-user clicks in the
    * preceding hour), declared through the EXACT transform the
    * streaming path runs ([[graft.streaming.StreamingOps.clickPurchaseJoin]]
    * — `withWatermark` is a no-op on batch inputs), so the DuckDB
    * oracle checks the very code StreamingSpec executes on
    * micro-batches. The time-bounded condition is what lets streaming
    * evict click state at the watermark; on batch, Catalyst plans the
    * equi-key shuffle join with the range residual. */
  def streamJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    graft.streaming.StreamingOps.clickPurchaseJoin(
        e.filter(col("event_type") === "click"),
        e.filter(col("event_type") === "purchase"))
      .orderBy(col("purchase_id"), col("click_id"))
  }

  /** Stream-static dimension enrichment, declared through the EXACT
    * transform the streaming path runs
    * ([[graft.streaming.StreamingOps.customerEnrich]]) so the DuckDB
    * oracle checks the code StreamingSpec executes on micro-batches. */
  def streamEnrich(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingOps.customerEnrich(
        Tables.events(spark, dir), Tables.customer(spark, dir))
      .orderBy(col("nation"))

  /** LEFT OUTER variant of [[streamJoin]], declared through the EXACT
    * transform the streaming path runs
    * ([[graft.streaming.StreamingOps.clickPurchaseLeftJoin]]): purchases
    * with no same-user click in the preceding hour survive with a NULL
    * click_id — in streaming they emit once the watermark proves no
    * match can arrive (StreamingSpec drives that progression). Nulls
    * sort FIRST on both sides (Spark's asc default, restated NULLS FIRST
    * in DuckDB). */
  def streamJoinOuter(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    graft.streaming.StreamingOps.clickPurchaseLeftJoin(
        e.filter(col("event_type") === "click"),
        e.filter(col("event_type") === "purchase"))
      .orderBy(col("purchase_id"), col("click_id").asc_nulls_first)
  }

  /** FULL OUTER variant: unmatched purchases AND unmatched clicks both
    * survive null-padded (watermark-released in streaming). */
  def streamJoinFull(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    graft.streaming.StreamingOps.clickPurchaseFullJoin(
        e.filter(col("event_type") === "click"),
        e.filter(col("event_type") === "purchase"))
      .orderBy(col("purchase_id").asc_nulls_first,
        col("click_id").asc_nulls_first)
  }

  /** Exactly-once repair of an at-least-once feed, declared through
    * the EXACT transform the streaming path runs
    * ([[graft.streaming.StreamingOps.dedupWithinWatermark]] —
    * StreamingSpec drives it on micro-batches with RocksDB state):
    * a re-delivered slice (every 10th event appended again) must be
    * collapsed by the event_id dedup, so the per-type aggregate
    * equals the clean feed's — which is exactly what the oracle
    * computes. In streaming, state is bounded by the watermark
    * horizon, not the stream length. */
  def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val redelivered = e.unionAll(e.filter(col("event_id") % 10 === 0))
    graft.streaming.StreamingOps.dedupWithinWatermark(redelivered)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
  }

  val defs: Map[String, Q] = Map(
    "stream_tumbling" -> (tumbling _),
    "stream_dedup" -> (streamDedup _),
    "stream_sliding" -> (sliding _),
    "stream_sessions" -> (sessions _),
    "stream_sessions_dynamic" -> (sessionsDynamic _),
    "stream_join" -> (streamJoin _),
    "stream_join_outer" -> (streamJoinOuter _),
    "stream_join_full" -> (streamJoinFull _),
    "stream_enrich" -> (streamEnrich _))

  val sql: Map[String, String] = Map(
    // the dedup must exactly cancel the injected re-delivery, so the
    // oracle is the CLEAN feed's aggregate
    "stream_dedup" ->
      """SELECT event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    "stream_tumbling" ->
      """SELECT CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS w_start,
        | event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "stream_sliding" ->
      """SELECT CAST(time_bucket(INTERVAL 15 MINUTE, ts)
        |   - k.i * INTERVAL 15 MINUTE AS TIMESTAMP) AS w_start,
        | event_type, COUNT(*) AS n
        |FROM events, UNNEST(range(0, 4)) AS k(i)
        |GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "stream_sessions" ->
      """WITH marked AS (
        | SELECT user_id, ts, value,
        |  CASE WHEN LAG(ts) OVER w IS NULL
        |        OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
        |       THEN 1 ELSE 0 END AS new_s
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |numbered AS (
        | SELECT user_id, ts, value,
        |  SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        | FROM marked)
        |SELECT CAST(MIN(ts) AS TIMESTAMP) AS session_start, user_id,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM numbered GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "stream_sessions_dynamic" ->
      """WITH g AS (
        | SELECT user_id, event_id, ts,
        |  CASE event_type WHEN 'purchase' THEN 60
        |   WHEN 'click' THEN 15 ELSE 30 END AS gap_min
        | FROM events),
        |marked AS (
        | SELECT user_id, event_id, ts,
        |  MAX(ts + gap_min * INTERVAL 1 MINUTE) OVER
        |   (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        | FROM g),
        |flagged AS (
        | SELECT user_id, event_id, ts,
        |  CASE WHEN prev_end IS NULL OR ts >= prev_end
        |   THEN 1 ELSE 0 END AS new_s
        | FROM marked),
        |numbered AS (
        | SELECT user_id, ts,
        |  SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        | FROM flagged)
        |SELECT CAST(MIN(ts) AS TIMESTAMP) AS session_start, user_id,
        | COUNT(*) AS n
        |FROM numbered GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "stream_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        | p.user_id AS user_id
        |FROM events p JOIN events c
        | ON p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.user_id = p.user_id
        | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
        |ORDER BY purchase_id, click_id""".stripMargin,
    "stream_join_outer" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        | p.user_id AS user_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        | ON c.user_id = p.user_id
        | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
        |ORDER BY purchase_id, click_id NULLS FIRST""".stripMargin,
    "stream_join_full" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        | COALESCE(p.user_id, c.user_id) AS user_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
        | ON c.user_id = p.user_id
        | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
        |ORDER BY purchase_id NULLS FIRST, click_id NULLS FIRST""".stripMargin,
    "stream_enrich" ->
      """SELECT c_nationkey AS nation, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1 ORDER BY nation""".stripMargin)
}
