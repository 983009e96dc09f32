package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling (SURVEY.md §2b extensions): hourly resample
  * with gap-fill and forward-fill over the events stream.
  *
  * Scale notes (100 TB): the resample is one hash aggregation on
  * (user, hour); the dense grid is generated per user from its own
  * [min, max] span (a `sequence` + `explode` — a generator, no shuffle,
  * and no cross join against a global calendar, which would explode
  * output for short-lived users); the fill join is keyed on
  * (user, hour) so it co-partitions with the aggregation; forward-fill
  * is a running `last(ignoreNulls)` window per user — single shuffle
  * on user, linear scan within partitions.
  */
object TimeseriesQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Hourly event counts + value sums per user (user_id < 20), gaps in
    * each user's own active span emitted with n_events = 0 and the
    * value forward-filled from the last active hour. */
  def tsGapfill(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .filter(col("user_id") < 20)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hr"),
        col("value"))
    val hourly = e.groupBy(col("user_id"), col("hr"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
    val grid = hourly.groupBy(col("user_id"))
      .agg(min(col("hr")).as("hmin"), max(col("hr")).as("hmax"))
      .select(col("user_id"),
        explode(sequence(col("hmin"), col("hmax"),
          expr("INTERVAL 1 HOUR"))).as("hr"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hr"), "left")
      .select(col("user_id"), col("hr"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("sum_value"), ignoreNulls = true).over(w).as("ffill_value"))
      .orderBy(col("user_id"), col("hr"))
  }

  /** Hourly grid per user (same grid as [[tsGapfill]]) with gap hours
    * LINEARLY INTERPOLATED between the neighboring observed hours —
    * the resample mode forward-fill can't express. Previous/next
    * observation value+time come from two frame-bounded
    * `last/first(ignoreNulls)` windows over ONE partitioning (user),
    * so the whole query is a single shuffle; interior gap rows always
    * have both neighbors because each user's grid spans its own
    * [min, max] observed hours.
    *
    * The interpolation itself is FIXED-POINT: hourly sums are exact
    * cents (the column has 2 decimals), the lerp numerator/denominator
    * are integer cents·ms, and one integer round-half-up
    * (`floor((20n + d) / 2d)`, exact in any engine — floats would land
    * on rounding boundaries: an hour grid makes dyadic fractions like
    * 23/32 common, and e.g. value 23.2403125 rounds differently as a
    * double in Spark vs DuckDB) yields milli-units; int64 holds the
    * products for cent sums × millisecond gaps up to ~10⁴ years. The
    * floor is spelled sign-safely — `(n - pmod(n, d)) / d` with the
    * pmod built from two `%` — because Spark's `DIV` truncates toward
    * zero while DuckDB's `//` floors: they differ by one on negative
    * numerators (possible when hourly sums go negative), but n−pmod is
    * exactly divisible so truncate==floor and both engines agree for
    * any sign. The final /1000.0 is a single IEEE division of
    * identical integers — identical doubles on every engine. */
  def tsInterpolate(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .filter(col("user_id") < 20)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hr"),
        col("value"))
    val hourly = e.groupBy(col("user_id"), col("hr"))
      .agg((sum(col("value").cast(org.apache.spark.sql.types
        .DecimalType(18, 2))) * 100).cast("long").as("obs_c"))
    val grid = hourly.groupBy(col("user_id"))
      .agg(min(col("hr")).as("hmin"), max(col("hr")).as("hmax"))
      .select(col("user_id"),
        explode(sequence(col("hmin"), col("hmax"),
          expr("INTERVAL 1 HOUR"))).as("hr"))
    val wb = Window.partitionBy(col("user_id")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("user_id")).orderBy(col("hr"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsT = when(col("obs_c").isNotNull, unix_millis(col("hr")))
    grid.join(hourly, Seq("user_id", "hr"), "left")
      .select(col("user_id"), col("hr"), col("obs_c"),
        unix_millis(col("hr")).as("t"),
        last(col("obs_c"), ignoreNulls = true).over(wb).as("pv"),
        last(obsT, ignoreNulls = true).over(wb).as("pt"),
        first(col("obs_c"), ignoreNulls = true).over(wf).as("nv"),
        first(obsT, ignoreNulls = true).over(wf).as("nt"))
      // den is nullif-guarded: on observed rows pt=t=nt so the raw
      // denominator is 0, and an eager %0 would error under ANSI —
      // null propagates harmlessly instead (the CASE takes the
      // observed branch anyway).
      .select(col("user_id"), col("hr"), col("obs_c"),
        expr("20 * (pv * (nt - t) + nv * (t - pt)) + (nt - pt)").as("num"),
        expr("nullif(2 * (nt - pt), 0)").as("den"))
      .select(col("user_id"), col("hr"),
        (when(col("obs_c").isNotNull, col("obs_c") * 10)
          .otherwise(expr("(num - ((num % den) + den) % den) DIV den"))
          .cast("double") / 1000.0).as("v_interp"))
      .orderBy(col("user_id"), col("hr"))
  }

  /** OHLC resampling: per (user, hour) candlesticks — open/close are
    * the values of the bucket's FIRST/LAST event with a total
    * (ts, event_id) tie-break so ties cannot flap between engines,
    * taken via lexicographic struct min/max inside the ONE hash
    * aggregation (no per-bucket window pass, no second shuffle). The
    * values pass through untouched (no arithmetic) so doubles compare
    * bit-exactly. */
  def tsOhlc(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hour"),
        col("ts"), col("event_id"), col("value"))
      .groupBy(col("user_id"), col("hour"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("close"),
        count(lit(1)).as("n"))
      .orderBy(col("user_id"), col("hour"))

  /** Truncated-kernel EWMA (α = 1/2, 8 taps): the exponentially
    * weighted moving average every monitoring/trading pipeline runs,
    * spelled as a FIXED 8-term lag sum so it is engine-exact — the
    * recursive form y_t = αx_t + (1-α)y_{t-1} carries unbounded
    * history (and float state) across rows, while the truncated
    * kernel's weights 2⁻¹…2⁻⁸ are exactly representable doubles and
    * the remaining mass (2⁻⁸) is below the 6-dp output rounding. The
    * taps are written in the SAME order on both engines, so even the
    * association is identical. One per-user window shuffle; per-row
    * state is 8 lags — constant, at any scale. */
  def tsEwma(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val x = col("value").cast("double")
    // k-th tap: weight 2^-(k+1); rows with fewer than 8 predecessors
    // renormalize over the taps present (coalesce each lag to the
    // current value would bias — instead divide by the present mass)
    val taps = (0 until 8).map { k =>
      val xv = if (k == 0) x else lag(x, k).over(w)
      (xv * lit(math.pow(0.5, k + 1)),
        when(if (k == 0) x.isNotNull
        else lag(x, k).over(w).isNotNull,
          lit(math.pow(0.5, k + 1))).otherwise(lit(0.0)))
    }
    val num = taps.map(_._1).map(t => coalesce(t, lit(0.0)))
      .reduceLeft(_ + _)
    val mass = taps.map(_._2).reduceLeft(_ + _)
    Tables.events(spark, dir)
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("ewma", round(num / mass, 6))
      .select(col("user_id"), col("event_id"), col("ewma"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val defs: Map[String, Q] = Map(
    "ts_ewma" -> (tsEwma _),
    "ts_ohlc" -> (tsOhlc _),
    "ts_gapfill" -> (tsGapfill _),
    "ts_interpolate" -> (tsInterpolate _))

  /** ts_ewma oracle, generated so the 2⁻ᵏ weights and the tap ORDER
    * are byte-identical with the Spark side (left-associated sums —
    * even float association matches). */
  private val tsEwmaSql: String = {
    val lags = (1 until 8)
      .map(k => s"lag(x, $k) OVER w AS x$k").mkString(", ")
    val num = (0 until 8).map { k =>
      val xv = if (k == 0) "x" else s"x$k"
      s"coalesce($xv * ${math.pow(0.5, k + 1)}, 0)"
    }.mkString(" + ")
    val mass = (0 until 8).map { k =>
      val xv = if (k == 0) "x" else s"x$k"
      s"(CASE WHEN $xv IS NOT NULL THEN ${math.pow(0.5, k + 1)} " +
        "ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH e AS (SELECT user_id, event_id, ts,
       |  CAST(value AS DOUBLE) AS x FROM events WHERE user_id < 20),
       |l AS (SELECT user_id, event_id, x, $lags
       | FROM e WINDOW w AS (PARTITION BY user_id
       |   ORDER BY ts, event_id))
       |SELECT user_id, event_id,
       | round(($num) / ($mass), 6) AS ewma
       |FROM l ORDER BY user_id, event_id""".stripMargin
  }

  val sql: Map[String, String] = Map(
    "ts_ewma" -> tsEwmaSql,
    "ts_ohlc" ->
      """WITH e AS (SELECT user_id,
        |  CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS hour,
        |  ts, event_id, value FROM events),
        |r AS (SELECT *,
        |  ROW_NUMBER() OVER (PARTITION BY user_id, hour
        |    ORDER BY ts, event_id) AS rn_a,
        |  ROW_NUMBER() OVER (PARTITION BY user_id, hour
        |    ORDER BY ts DESC, event_id DESC) AS rn_d FROM e)
        |SELECT user_id, hour,
        | MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
        | MAX(value) AS high, MIN(value) AS low,
        | MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
        | COUNT(*) AS n
        |FROM r GROUP BY user_id, hour
        |ORDER BY user_id, hour""".stripMargin,
    "ts_gapfill" ->
      """WITH hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hr,
        |   COUNT(*) AS n_events,
        |   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |  FROM events WHERE user_id < 20 GROUP BY 1, 2),
        |grid AS (
        |  SELECT user_id, UNNEST(generate_series(min(hr), max(hr),
        |    INTERVAL 1 HOUR)) AS hr
        |  FROM hourly GROUP BY user_id)
        |SELECT g.user_id, g.hr,
        | COALESCE(h.n_events, 0) AS n_events,
        | last_value(h.sum_value IGNORE NULLS) OVER (
        |   PARTITION BY g.user_id ORDER BY g.hr
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_value
        |FROM grid g LEFT JOIN hourly h
        |  ON g.user_id = h.user_id AND g.hr = h.hr
        |ORDER BY g.user_id, g.hr""".stripMargin,
    "ts_interpolate" ->
      """WITH hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hr,
        |   CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS obs_c
        |  FROM events WHERE user_id < 20 GROUP BY 1, 2),
        |grid AS (
        |  SELECT user_id, UNNEST(generate_series(min(hr), max(hr),
        |    INTERVAL 1 HOUR)) AS hr
        |  FROM hourly GROUP BY user_id),
        |j AS (
        |  SELECT g.user_id, g.hr, h.obs_c, epoch_ms(g.hr) AS t,
        |   last_value(h.obs_c IGNORE NULLS) OVER wb AS pv,
        |   last_value(CASE WHEN h.obs_c IS NOT NULL
        |     THEN epoch_ms(g.hr) END IGNORE NULLS) OVER wb AS pt,
        |   first_value(h.obs_c IGNORE NULLS) OVER wf AS nv,
        |   first_value(CASE WHEN h.obs_c IS NOT NULL
        |     THEN epoch_ms(g.hr) END IGNORE NULLS) OVER wf AS nt
        |  FROM grid g LEFT JOIN hourly h
        |    ON g.user_id = h.user_id AND g.hr = h.hr
        |  WINDOW wb AS (PARTITION BY g.user_id ORDER BY g.hr
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wf AS (PARTITION BY g.user_id ORDER BY g.hr
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        |j2 AS (
        |  SELECT user_id, hr, obs_c,
        |   20 * (pv * (nt - t) + nv * (t - pt)) + (nt - pt) AS num,
        |   nullif(2 * (nt - pt), 0) AS den
        |  FROM j)
        |SELECT user_id, hr,
        | CAST(CASE WHEN obs_c IS NOT NULL THEN obs_c * 10
        |      ELSE (num - ((num % den) + den) % den) // den
        |      END AS DOUBLE) / 1000.0 AS v_interp
        |FROM j2 ORDER BY user_id, hr""".stripMargin)
}
