package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product-analytics composites over the events stream: ordered funnel
  * progression and cohort retention — the two workhorse query shapes
  * of any event-analytics engine, declared on the same operators the
  * rest of the surface uses (per-key min aggregates, equi joins,
  * distinct, hash agg).
  *
  * Scale design (100 TB): every stage is keyed on user_id, so the
  * whole funnel is per-key aggregates + co-partitioned joins — one
  * shuffle key throughout, no window over the raw stream, no global
  * state. Cohort retention is (user, week) distinct + one hash agg on
  * the (cohort, offset) pair whose cardinality is weeks², independent
  * of data size.
  */
object FunnelQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Ordered signup → click → purchase funnel: a user advances a stage
    * only with an event at-or-after their previous stage's first
    * event. Emits one row per stage with how many users reached it. */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    def firstAfter(evType: String, prev: DataFrame, prevTs: String,
        outTs: String): DataFrame =
      ev.filter(col("event_type") === evType)
        .join(prev, "user_id")
        .filter(col("ts") >= col(prevTs))
        .groupBy(col("user_id")).agg(min(col("ts")).as(outTs))
    val s = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
    val c = firstAfter("click", s, "s_ts", "c_ts")
    val p = firstAfter("purchase", c.select("user_id", "c_ts"), "c_ts",
      "p_ts")
    def stage(df: DataFrame, ord: Int, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(ord).as("stage_ord"), lit(name).as("stage"),
          col("n_users"))
    stage(s, 1, "signup")
      .unionByName(stage(c, 2, "click_after_signup"))
      .unionByName(stage(p, 3, "purchase_after_click"))
      .orderBy(col("stage_ord"))
  }

  /** Weekly cohort retention: users cohorted by their first-ever event
    * week; one row per (cohort week, week offset) with the distinct
    * users active that week. */
  def retentionCohort(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val active = ev.distinct()
    val cohorts = active.groupBy(col("user_id"))
      .agg(min(col("wk")).as("cohort_week"))
    active.join(cohorts, "user_id")
      .select(col("cohort_week"),
        expr("datediff(wk, cohort_week) DIV 7").cast("int")
          .as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Gap-based batch sessionization: a new session starts when a
    * user's inter-event gap exceeds 30 minutes (the streaming
    * `session_window`'s batch twin, spelled as lag + running sum — the
    * canonical SQL idiom). One window shuffle on user_id, running
    * state is a single counter per row; the output folds to a
    * sessions-per-user histogram so the result stays tiny and
    * hash-stable at any event volume. */
  def eventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gap = col("ts").cast("long") -
      lag(col("ts").cast("long"), 1).over(w)
    val perUser = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("is_new",
        when(gap.isNull || gap > 1800L, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("is_new")).as("n_sessions"),
        count(lit(1)).as("n_events"))
    perUser.groupBy(col("n_sessions"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("n_events")).as("n_events"))
      .orderBy(col("n_sessions"))
  }

  /** LAST-TOUCH channel attribution — marketing analytics' workhorse:
    * each purchase's value credits the channel of the user's most
    * recent click within the preceding hour, else 'direct'. Channel is
    * a deterministic function of the click id (id mod 3), so the whole
    * pipeline restates in SQL. The join-free union-and-carry shape
    * (tag both event kinds, ONE per-user ordered pass carrying the
    * last click's ts and id forward) is linear in events per user —
    * the purchase×clicks join it replaces is quadratic in the hot
    * users a 100 TB clickstream always has. */
  def eventsAttribution(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("tag").asc, col("event_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        when(col("event_type") === "click", 0).otherwise(1).as("tag"))
      .withColumn("lc_ts",
        max(when(col("tag") === 0, col("ts"))).over(w))
      .withColumn("lc_id",
        last(when(col("tag") === 0, col("event_id")), ignoreNulls = true)
          .over(w))
      .filter(col("tag") === 1)
      .withColumn("channel",
        when(col("lc_ts").isNotNull &&
          col("lc_ts") >= col("ts") - expr("INTERVAL 1 HOUR"),
          element_at(array(lit("search"), lit("social"), lit("email")),
            (pmod(col("lc_id"), lit(3)) + 1).cast("int")))
          .otherwise(lit("direct")))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        dsum(col("value")).as("attributed_value"))
      .orderBy(col("channel"))
  }

  /** Traffic anomaly detection: hourly event counts per type, each
    * hour z-scored against its type's own hourly distribution, hours
    * with |z| ≥ 2 flagged. The statistics are INTEGER-EXACT up to one
    * final deterministic float step: counts and squared-count sums
    * are exact longs, variance is the exact integer rational
    * (n·Σc² − (Σc)²)/n² cast to double once, and sqrt is IEEE
    * correctly-rounded (unlike ln/pow, both engines MUST agree) — so
    * the z-scores hash-match. Scale: two hash aggregations (hourly,
    * then per-type) and a |types|-row broadcast back onto the hourly
    * frame; the corpus is read once. */
  def eventsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    // persisted: hourly feeds BOTH join sides (stats build + probe),
    // and Spark does no cross-join-side CSE — without the persist the
    // corpus scan and first aggregation would run twice
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"))
      .persist()
    val stats = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        sum(col("n_events")).as("s1"),
        sum(col("n_events") * col("n_events")).as("s2"))
      .select(col("event_type"),
        (col("s1").cast("double") / col("n_hours")).as("mean"),
        sqrt((col("n_hours") * col("s2") - col("s1") * col("s1"))
          .cast("double") / (col("n_hours") * col("n_hours"))).as("std"))
    hourly.join(broadcast(stats), "event_type")
      .select(col("event_type"), col("hour"), col("n_events"),
        round((col("n_events").cast("double") - col("mean")) / col("std"),
          4).as("z"))
      .filter(abs(col("z")) >= 2.0)
      .orderBy(col("event_type"), col("hour"))
  }

  /** Ordered SEQUENCE-PATTERN detection (the MATCH_RECOGNIZE workhorse
    * case): per user, count completed view→click→purchase chains
    * where each step follows the previous within 24 hours. The
    * naive formulation is a cubic three-way self-join; this is the
    * linear carry-forward shape instead — ONE per-user ordered pass
    * carries (a) the latest view's time and (b) the latest QUALIFIED
    * click's time (a click within the window of a view) via ignore-nulls
    * last() windows, and purchases test the carried state. Both
    * window passes share one (user_id) partitioning → one shuffle end
    * to end, state is two longs per row: at 100 TB the cost is the
    * per-user sort, same as sessionization. Frames are explicit ROWS
    * (not RANGE) so engine tie semantics can't differ. */
  def eventsPattern(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts"), col("ts").cast("long").as("sec"))
    val s1 = ev.withColumn("lv",
      last(when(col("event_type") === "view", col("sec")),
        ignoreNulls = true).over(w))
    val s2 = s1.withColumn("lqc",
      last(when(col("event_type") === "click" &&
          col("sec") - col("lv") <= 86400L, col("sec")),
        ignoreNulls = true).over(w))
    s2.filter(col("event_type") === "purchase" &&
        col("lqc").isNotNull && col("sec") - col("lqc") <= 86400L)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_chains"))
      .orderBy(col("user_id"))
  }

  /** Behavior PATH ANALYSIS: the frequency of every ordered 3-step
    * event-type sequence (trigram) across user streams — the Markov
    * transition table product analytics builds to find dominant
    * journeys and dead ends. Two lead() taps over ONE per-user window
    * partitioning (same single-shuffle shape as sessionization), then
    * a hash aggregate whose cardinality is |types|³ — independent of
    * data volume, the right output shape at any scale. Explicit
    * (ts, event_id) ordering keeps engine tie semantics identical. */
  def eventsTrigrams(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type").as("s1"))
      .withColumn("s2", lead(col("s1"), 1).over(w))
      .withColumn("s3", lead(col("s1"), 2).over(w))
      .filter(col("s2").isNotNull && col("s3").isNotNull)
      .groupBy(col("s1"), col("s2"), col("s3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("s1"), col("s2"), col("s3"))
  }

  /** First-order Markov transition matrix over the event-type
    * alphabet: per-user (ts, event_id)-ordered bigrams roll up to
    * global transition counts, and each row normalizes to a
    * probability in integer PARTS-PER-MILLION (`div`, exact in both
    * engines — no float division in the compared plan). The scale
    * shape: one lag window partitioned BY USER (the same bounded
    * partitions every sessionization query uses), then a groupBy on an
    * alphabet-sized key — the transition matrix itself is |types|²
    * rows, so the normalizing window is metadata-sized no matter how
    * many events feed it. */
  def eventsMarkov(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wu = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val counts = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type").as("s1"))
      .withColumn("s2", lead(col("s1"), 1).over(wu))
      .filter(col("s2").isNotNull)
      .groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("n"))
    markovPpm(counts)
  }

  /** ppm normalization of a `(s1, s2, n)` transition-count frame.
    * `n * 1000000` is computed through DECIMAL(38,0), not LongType:
    * under non-ANSI semantics a Long product silently wraps past
    * ~9.2e12 events in one transition pair — real headroom risk at
    * 100 TB. `div` on the decimal product still returns BIGINT, so
    * the compared schema (and the DuckDB oracle) are unchanged.
    * Split out so FunnelSpec can pin the no-wrap behavior with a
    * synthetic count far past 2³¹. */
  private[graft] def markovPpm(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    counts
      .withColumn("row_total",
        sum(col("n")).over(Window.partitionBy(col("s1"))))
      .select(col("s1"), col("s2"), col("n"),
        expr("cast(n as decimal(38,0)) * 1000000 div row_total")
          .as("p_ppm"))
      .orderBy(col("s1"), col("s2"))
  }

  val defs: Map[String, Q] = Map(
    "events_markov" -> (eventsMarkov _),
    "events_pattern" -> (eventsPattern _),
    "events_trigrams" -> (eventsTrigrams _),
    "events_attribution" -> (eventsAttribution _),
    "events_anomaly" -> (eventsAnomaly _),
    "events_funnel" -> (eventsFunnel _),
    "events_sessionize" -> (eventsSessionize _),
    "retention_cohort" -> (retentionCohort _))

  val sql: Map[String, String] = Map(
    "events_markov" ->
      """WITH s AS (SELECT user_id, event_type AS s1,
        |  lead(event_type, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS s2
        | FROM events),
        |c AS (SELECT s1, s2, COUNT(*) AS n FROM s
        | WHERE s2 IS NOT NULL GROUP BY s1, s2)
        |SELECT s1, s2, n,
        | CAST(n * 1000000 // SUM(n) OVER (PARTITION BY s1) AS BIGINT)
        |   AS p_ppm
        |FROM c ORDER BY s1, s2""".stripMargin,
    "events_trigrams" ->
      """WITH s AS (SELECT user_id, event_type AS s1,
        |  lead(event_type, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS s2,
        |  lead(event_type, 2) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS s3
        | FROM events)
        |SELECT s1, s2, s3, COUNT(*) AS n FROM s
        |WHERE s2 IS NOT NULL AND s3 IS NOT NULL
        |GROUP BY s1, s2, s3 ORDER BY s1, s2, s3""".stripMargin,
    "events_pattern" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, ts,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |s1 AS (SELECT *, last_value(
        |  CASE WHEN event_type = 'view' THEN sec END IGNORE NULLS)
        |  OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lv
        | FROM ev),
        |s2 AS (SELECT *, last_value(
        |  CASE WHEN event_type = 'click' AND sec - lv <= 86400
        |    THEN sec END IGNORE NULLS)
        |  OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lqc
        | FROM s1)
        |SELECT user_id, COUNT(*) AS n_chains FROM s2
        |WHERE event_type = 'purchase' AND lqc IS NOT NULL
        |  AND sec - lqc <= 86400
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "events_anomaly" ->
      """WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hour,
        |  COUNT(*) AS n_events FROM events GROUP BY 1, 2),
        |stats AS (SELECT event_type, COUNT(*) AS n_hours,
        |  SUM(n_events) AS s1, SUM(n_events * n_events) AS s2
        | FROM hourly GROUP BY 1),
        |st AS (SELECT event_type,
        |  CAST(s1 AS DOUBLE) / n_hours AS mean,
        |  sqrt(CAST(n_hours * s2 - s1 * s1 AS DOUBLE)
        |    / (n_hours * n_hours)) AS std
        | FROM stats),
        |z AS (SELECT h.event_type, h.hour, h.n_events,
        |  round((CAST(h.n_events AS DOUBLE) - mean) / std, 4) AS z
        | FROM hourly h JOIN st USING (event_type))
        |SELECT event_type, hour, n_events, z FROM z WHERE abs(z) >= 2
        |ORDER BY event_type, hour""".stripMargin,
    "events_attribution" ->
      """WITH e AS (SELECT event_id, user_id, ts, value,
        |  CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS tag
        | FROM events WHERE event_type IN ('click', 'purchase')),
        |c AS (SELECT *,
        |  max(CASE WHEN tag = 0 THEN ts END) OVER w AS lc_ts,
        |  last_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
        |    OVER w AS lc_id
        | FROM e
        | WINDOW w AS (PARTITION BY user_id
        |   ORDER BY ts, tag, event_id ROWS UNBOUNDED PRECEDING)),
        |p AS (SELECT value,
        |  CASE WHEN lc_ts IS NOT NULL
        |    AND lc_ts >= ts - INTERVAL 1 HOUR THEN
        |    CASE CAST(lc_id % 3 AS INT) WHEN 0 THEN 'search'
        |      WHEN 1 THEN 'social' ELSE 'email' END
        |  ELSE 'direct' END AS channel
        | FROM c WHERE tag = 1)
        |SELECT channel, COUNT(*) AS n_purchases,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |   AS attributed_value
        |FROM p GROUP BY channel ORDER BY channel""".stripMargin,
    "events_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id,
        |   CAST(floor(epoch(ts)) AS BIGINT) -
        |   lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER
        |     (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events),
        |pu AS (
        |  SELECT user_id,
        |   CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
        |     AS BIGINT) AS n_sessions,
        |   COUNT(*) AS n_events
        |  FROM g GROUP BY user_id)
        |SELECT n_sessions, COUNT(*) AS n_users, CAST(SUM(n_events) AS BIGINT) AS n_events
        |FROM pu GROUP BY n_sessions ORDER BY n_sessions""".stripMargin,
    "events_funnel" ->
      """WITH s AS (
        |  SELECT user_id, MIN(ts) AS s_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, MIN(e.ts) AS c_ts
        |  FROM events e JOIN s ON e.user_id = s.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= s.s_ts
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, MIN(e.ts) AS p_ts
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
        |  GROUP BY e.user_id)
        |SELECT CAST(1 AS INT) AS stage_ord, 'signup' AS stage,
        |  COUNT(*) AS n_users FROM s
        |UNION ALL SELECT 2, 'click_after_signup', COUNT(*) FROM c
        |UNION ALL SELECT 3, 'purchase_after_click', COUNT(*) FROM p
        |ORDER BY stage_ord""".stripMargin,
    "retention_cohort" ->
      """WITH active AS (
        |  SELECT DISTINCT user_id,
        |   CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
        |  FROM events),
        |cohorts AS (
        |  SELECT user_id, MIN(wk) AS cohort_week
        |  FROM active GROUP BY user_id)
        |SELECT c.cohort_week,
        | CAST(datediff('day', c.cohort_week, a.wk) // 7 AS INT)
        |   AS week_offset,
        | COUNT(*) AS n_active
        |FROM active a JOIN cohorts c ON a.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin)
}
