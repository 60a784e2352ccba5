package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Det._

/** Event-stream analytics over the `events` table (batch side of a streaming
  * pipeline: sessionization, time-bucketed aggregation, per-user pivots).
  *
  * ts is read as exact nanosecond-since-epoch longs (see Verify's
  * nanosAsLong config): all time arithmetic is integer division — exact,
  * engine-independent, and matching DuckDB's epoch_ns(). At scale these are
  * one shuffle by (type, bucket) or user_id respectively; sessionization is
  * the window-lag pattern that Structured Streaming's state store implements
  * incrementally — same semantics, batch form.
  */
object Events {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)
  type Q = (SparkSession, String) => DataFrame

  private val secs = expr("ts div 1000000000")

  val queries: Map[String, Q] = Map(
    // Hourly counts + value sums per event type.
    "ev_hourly" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_type"), col("value"),
          date_add(lit("1970-01-01").cast("date"),
            expr("ts div 1000000000 div 86400").cast("int")).as("day"),
          expr("ts div 1000000000 % 86400 div 3600").cast("int").as("hour"))
        .groupBy(col("event_type"), col("day"), col("hour"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("event_type", "day", "hour")),

    // Sessionization: 30-min inactivity gap starts a new session
    // (lag + cumulative-sum pattern).
    "ev_sessions" -> ((s, d) => {
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("s"), col("event_id"))
      val marked = t(s, d, "events")
        .select(col("user_id"), col("event_id"), secs.as("s"), col("value"))
        .withColumn("prev_s", lag(col("s"), 1).over(wOrd))
        .withColumn("new_sess",
          when(col("prev_s").isNull || col("s") - col("prev_s") > 1800, 1L).otherwise(0L))
      marked
        .withColumn("session_id",
          sum(col("new_sess")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("s")).as("start_s"), max(col("s")).as("end_s"),
          dsum(col("value")).as("sum_value"))
        .orderBy("user_id", "session_id")
    }),

    // Per-user event-type pivot (conditional aggregation form — stable
    // column names regardless of data).
    "ev_user_pivot" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_total"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_click"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n_view"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchase"),
          sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("n_signup"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_error"))
        .orderBy("user_id")),

    // Top event per user by value with rank over exact values.
    "ev_top_value" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
      t(s, d, "events")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("rn"), col("event_id"), col("event_type"), col("value"))
        .orderBy("user_id", "rn")
    })
  )

  val oracle: Map[String, String] = Map(
    "ev_hourly" ->
      """SELECT event_type,
                DATE '1970-01-01' + CAST(epoch_ns(ts) // 1000000000 // 86400 AS INTEGER) AS day,
                CAST(epoch_ns(ts) // 1000000000 % 86400 // 3600 AS INTEGER) AS hour,
                count(*) AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2, 3 ORDER BY event_type, day, hour""",
    "ev_sessions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS s, value FROM events),
              m AS (SELECT user_id, event_id, s, value,
                           lag(s, 1) OVER (PARTITION BY user_id ORDER BY s, event_id) AS prev_s
                    FROM e),
              mk AS (SELECT user_id, event_id, s, value,
                            CASE WHEN prev_s IS NULL OR s - prev_s > 1800 THEN 1 ELSE 0 END AS new_sess
                     FROM m),
              sess AS (SELECT user_id, event_id, s, value,
                              CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY s, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
                       FROM mk)
         SELECT user_id, session_id, count(*) AS n_events,
                min(s) AS start_s, max(s) AS end_s,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM sess GROUP BY 1, 2 ORDER BY user_id, session_id""",
    "ev_user_pivot" ->
      """SELECT user_id, count(*) AS n_total,
                CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
                CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
                CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
                CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
         FROM events GROUP BY 1 ORDER BY user_id""",
    "ev_top_value" ->
      """SELECT user_id, rn, event_id, event_type, value FROM (
           SELECT user_id, event_id, event_type, value,
                  CAST(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS rn
           FROM events) t
         WHERE rn <= 3 ORDER BY user_id, rn"""
  )
}
