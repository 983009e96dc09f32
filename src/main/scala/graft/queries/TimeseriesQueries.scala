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

  val defs: Map[String, Q] = Map("ts_gapfill" -> (tsGapfill _))

  val sql: Map[String, String] = Map(
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
        |ORDER BY g.user_id, g.hr""".stripMargin)
}
