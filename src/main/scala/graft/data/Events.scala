package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Det._

/** Event-stream analytics over the `events` table (batch side of a streaming
  * pipeline: sessionization, time-bucketed aggregation, per-user pivots).
  *
  * ts arrives as exact nanosecond-since-epoch longs (Tables.normalizeTs
  * converts timestamp-typed revisions of the column): all time arithmetic is
  * integer division — exact, engine-independent, and matching DuckDB's
  * epoch_ns(). At scale these are
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
      // (r11 probe note: widening this window's exchange to the core count
      // was tried and measured WORSE at 32 cores — 0.29 vs 0.22 s median —
      // the narrow tiny-regime shuffle width already wins on scheduling.)
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

    // Sessionization via Spark's NATIVE session_window operator (the same
    // 30-min-gap semantics as ev_sessions' lag+cumsum form, executed by the
    // dedicated merging-session-window aggregation instead): one user_id
    // shuffle, sessions merged within partitions — the operator Structured
    // Streaming shares for watermark-evicted session state. Boundary pinned
    // by probe + EventsSpec: an event at EXACTLY gap distance merges, so a
    // new session starts only when gap > 1800s — identical to ev_sessions.
    // Microsecond precision end-to-end; output truncates to whole seconds
    // only for engine-neutral hashing (start_us % 1e6 == 0 in this data).
    "ev_session_window" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), timestamp_micros(expr("ts div 1000")).as("ts_ts"),
          col("value"))
      ev.groupBy(col("user_id"), session_window(col("ts_ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"),
          expr("unix_micros(session_window.start) div 1000000").as("start_s"),
          expr("unix_micros(session_window.end) div 1000000").as("end_s"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "start_s")
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

    // Exact discrete quantiles per event type, computed by rank selection
    // (row_number + count over the group, pick rn = ceil(p*n)) — closed-form
    // arithmetic the oracle mirrors exactly, so the result is hash-checked
    // (built-in `percentile`/quantile_cont interpolate in engine-specific
    // float order and can't be hash-compared). Exact quantiles sort each
    // group through one window partition: right for bounded-cardinality
    // groups; at 100 TB per-group volumes use ev_approx_stats' sketch path.
    "ev_quantiles" -> ((s, d) => {
      // asc_nulls_last: DuckDB's ORDER BY default is NULLS LAST while
      // Spark's is NULLS FIRST — the fixture has no null values today, but
      // the rank arithmetic must not silently diverge the day it does.
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").asc_nulls_last, col("event_id"))
      val ranked = t(s, d, "events")
        .select(col("event_type"), col("event_id"), col("value"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      ranked.groupBy(col("event_type"))
        .agg(
          max(when(col("rn") === ceil(col("n") * lit(0.5)), col("value"))).as("p50"),
          max(when(col("rn") === ceil(col("n") * lit(0.9)), col("value"))).as("p90"),
          max(when(col("rn") === ceil(col("n") * lit(0.99)), col("value"))).as("p99"),
          max(col("n")).as("n"))
        .orderBy("event_type")
    }),

    // Sketch-based statistics — the 100 TB path for cardinality and
    // quantiles: HyperLogLog++ (approx_count_distinct) and KLL-style
    // percentile_approx are mergeable partial aggregates (map-side combine,
    // one small-state shuffle, no per-group sort). Engine-defined sketches →
    // rows-only check; EventsSpec bounds the error against the exact values.
    "ev_approx_stats" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("ap50"),
          percentile_approx(col("value"), lit(0.99), lit(10000)).as("ap99"),
          count(lit(1)).as("n"))
        .orderBy("event_type")),

    // As-of join: each click event picks up the user's most recent purchase
    // at or before it (classic trades⋈quotes time-series lookup). Spark has
    // no ASOF JOIN operator; a range-join formulation explodes to
    // O(clicks × purchases) per user before aggregation. This is the
    // scale-safe composition: tag both sides, union, and run ONE running
    // last_value(ignoreNulls) window per user — a single user_id shuffle
    // and a linear merge pass, never a pair blowup (the same merge an
    // engine's dedicated ASOF operator does internally). Purchases are
    // pre-aggregated to one row per (user, second) so the match value is
    // deterministic on both engines; ref rows sort before probes at equal
    // timestamps (side 0 < 1), making the match inclusive (ref.s ≤ probe.s).
    "ev_asof" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_id"), secs.as("s"),
          col("event_type"), col("value"))
      val probe = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("s"), col("value"),
          lit(1).as("side"), lit(null).cast("double").as("ref_value"))
      val ref = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("s"))
        .agg(max(col("value")).as("ref_value"))
        .select(col("user_id"), lit(null).cast("long").as("event_id"),
          col("s"), lit(null).cast("double").as("value"),
          lit(0).as("side"), col("ref_value"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("s"), col("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      probe.unionByName(ref)
        .withColumn("asof_s", last(when(col("side") === 0, col("s")), ignoreNulls = true).over(w))
        .withColumn("asof_value", last(when(col("side") === 0, col("ref_value")), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("user_id"), col("event_id"), col("s"), col("value"),
          col("asof_s"), col("asof_value"))
        .orderBy("user_id", "event_id")
    }),

    // Funnel analysis: per user, the ordered view → click → purchase
    // progression (each step's timestamp must be strictly after the
    // previous step's FIRST qualifying timestamp — the standard strict-
    // order funnel). Because (user_id, ts) pairs are unique at ns
    // resolution, the cascade reduces to three conditional min-aggregates:
    // t1 = min view ts; t2 = min click ts > t1; t3 = min purchase ts > t2.
    // Every aggregate and join is keyed on user_id — one hash partitioning
    // reused end-to-end, the aggregated sides shrink to ≤1 row per user
    // (AQE broadcasts them), and nothing is ever per-pair. At 100 TB this
    // is the scale-safe funnel: no per-user event collection, no window
    // sort over the raw stream.
    "ev_funnel" -> ((s, d) => {
      val e = t(s, d, "events").select(col("user_id"), col("event_type"), col("ts"))
      val t1 = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val t2 = e.filter(col("event_type") === "click")
        .join(t1, Seq("user_id")).filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val t3 = e.filter(col("event_type") === "purchase")
        .join(t2, Seq("user_id")).filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      t1.join(t2, Seq("user_id"), "left").join(t3, Seq("user_id"), "left")
        .select(col("user_id"),
          (lit(1L) + col("t2").isNotNull.cast("long") +
            col("t3").isNotNull.cast("long")).as("depth"),
          col("t1"), coalesce(col("t2"), lit(-1L)).as("t2"),
          coalesce(col("t3"), lit(-1L)).as("t3"))
        .orderBy("user_id")
    }),

    // Cohort retention: users grouped by first-active day; for each
    // (cohort_day, week offset) the count of distinct users active that
    // week. Two shuffles total (user_id for first-touch, then the cohort
    // grid — whose cardinality is days × weeks, tiny at any corpus size).
    "ev_retention" -> ((s, d) => {
      val day = expr("ts div 1000000000 div 86400").cast("long")
      val e = t(s, d, "events").select(col("user_id"), day.as("day")).distinct()
      val first = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      e.join(first, Seq("user_id"))
        .select(col("user_id"), col("cohort_day"),
          floor((col("day") - col("cohort_day")) / 7).as("wk"))
        .distinct()
        .groupBy(col("cohort_day"), col("wk"))
        .agg(count(lit(1)).as("n_users"))
        .select(date_add(lit("1970-01-01").cast("date"),
          col("cohort_day").cast("int")).as("cohort_date"),
          col("wk"), col("n_users"))
        .orderBy("cohort_date", "wk")
    }),

    // Top event per user by value with rank over exact values.
    "ev_top_value" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
      t(s, d, "events")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("rn"), col("event_id"), col("event_type"), col("value"))
        .orderBy("user_id", "rn")
    }),

    // Time-series resample: gap-filled hourly series per event type (the
    // dense grid a forecasting/monitoring consumer needs — missing hours
    // become explicit zeros). The grid is generated per type from its own
    // [min,max] hour span via sequence+explode — |types|·|hours| rows, tiny
    // relative to the event stream at any scale — then left-joined to the
    // aggregated hourly counts; the raw stream shuffles exactly once (the
    // hourly groupBy with map-side combine).
    "ev_resample" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("event_type"),
        expr("ts div 1000000000 div 3600").as("h"), col("value"))
      val hourly = ev.groupBy("event_type", "h")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      val grid = ev.groupBy("event_type")
        .agg(min("h").as("h0"), max("h").as("h1"))
        .select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("h"))
      grid.join(hourly, Seq("event_type", "h"), "left")
        .select(col("event_type"), col("h"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
        .orderBy("event_type", "h")
    }),

    // Unpivot (wide → long): melt the per-user event-type count matrix back
    // to (user_id, metric, n) rows — Spark's native unpivot/melt operator
    // (a generate stage, no shuffle beyond the pivot's own aggregation).
    "ev_unpivot" -> ((s, d) => {
      val wide = t(s, d, "events").groupBy("user_id")
        .pivot("event_type", Seq("view", "click", "purchase"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("view", "click", "purchase"))
      wide.unpivot(
          Array(col("user_id")),
          Array(col("view"), col("click"), col("purchase")),
          "metric", "n")
        .orderBy("user_id", "metric")
    })
  )

  val oracle: Map[String, String] = Map(
    "ev_resample" ->
      """WITH e AS (SELECT event_type, epoch_ns(ts) // 1000000000 // 3600 AS h, value FROM events),
              hourly AS (SELECT event_type, h, count(*) AS n,
                                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
                         FROM e GROUP BY 1, 2),
              mm AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM e GROUP BY 1),
              grid AS (SELECT event_type, unnest(generate_series(h0, h1)) AS h FROM mm)
         SELECT g.event_type, g.h,
                CAST(coalesce(hourly.n, 0) AS BIGINT) AS n,
                coalesce(hourly.sum_value, 0.0) AS sum_value
         FROM grid g LEFT JOIN hourly ON g.event_type = hourly.event_type AND g.h = hourly.h
         ORDER BY g.event_type, g.h""",
    "ev_unpivot" ->
      """WITH wide AS (SELECT user_id,
                count(*) FILTER (WHERE event_type = 'view') AS n_view,
                count(*) FILTER (WHERE event_type = 'click') AS n_click,
                count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase
              FROM events GROUP BY user_id)
         SELECT user_id, metric, n FROM (
           SELECT user_id, 'view' AS metric, n_view AS n FROM wide
           UNION ALL SELECT user_id, 'click', n_click FROM wide
           UNION ALL SELECT user_id, 'purchase', n_purchase FROM wide) u
         ORDER BY user_id, metric""",
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
    "ev_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS ts FROM events),
              t1 AS (SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
              t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e JOIN t1 ON e.user_id = t1.user_id
                     WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY 1),
              t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e JOIN t2 ON e.user_id = t2.user_id
                     WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY 1)
         SELECT t1.user_id,
                CAST(1 + CAST(t2.t2 IS NOT NULL AS INTEGER) + CAST(t3.t3 IS NOT NULL AS INTEGER) AS BIGINT) AS depth,
                t1.t1 AS t1, coalesce(t2.t2, -1) AS t2, coalesce(t3.t3, -1) AS t3
         FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
                 LEFT JOIN t3 ON t1.user_id = t3.user_id
         ORDER BY t1.user_id""",
    "ev_retention" ->
      """WITH e AS (SELECT DISTINCT user_id, epoch_ns(ts) // 1000000000 // 86400 AS day FROM events),
              f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1),
              a AS (SELECT DISTINCT e.user_id, f.cohort_day, (e.day - f.cohort_day) // 7 AS wk
                    FROM e JOIN f ON e.user_id = f.user_id)
         SELECT DATE '1970-01-01' + CAST(cohort_day AS INTEGER) AS cohort_date, wk,
                CAST(count(*) AS BIGINT) AS n_users
         FROM a GROUP BY 1, 2 ORDER BY cohort_date, wk""",
    "ev_session_window" ->
      // independent sessionization at microsecond precision: new session when
      // gap > 30 min (Spark's session_window merges an event at exactly gap
      // distance — pinned by EventsSpec); window end = last event + gap;
      // floor-divide to seconds exactly like the Spark side's `div`
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, value FROM events),
              m AS (SELECT user_id, us, value,
                           lag(us, 1) OVER (PARTITION BY user_id ORDER BY us) AS prev_us
                    FROM e),
              mk AS (SELECT user_id, us, value,
                            CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
                     FROM m),
              sess AS (SELECT user_id, us, value,
                              sum(new_sess) OVER (PARTITION BY user_id ORDER BY us
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                       FROM mk)
         SELECT user_id,
                min(us) // 1000000 AS start_s,
                (max(us) + 1800000000) // 1000000 AS end_s,
                count(*) AS n_events,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM sess GROUP BY user_id, sid ORDER BY user_id, start_s""",
    "ev_user_pivot" ->
      """SELECT user_id, count(*) AS n_total,
                CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
                CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
                CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
                CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
         FROM events GROUP BY 1 ORDER BY user_id""",
    "ev_quantiles" ->
      // mirrors the rank-selection arithmetic exactly (same IEEE ceil(n*p));
      // ties in value don't matter: any row in the tie range has the value
      """WITH r AS (SELECT event_type, value,
                           row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
                           count(*) OVER (PARTITION BY event_type) AS n
                    FROM events)
         SELECT event_type,
                max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN value END) AS p50,
                max(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN value END) AS p90,
                max(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT) THEN value END) AS p99,
                max(n) AS n
         FROM r GROUP BY event_type ORDER BY event_type""",
    "ev_asof" ->
      // DuckDB's native ASOF LEFT JOIN — the independent implementation of
      // the same semantics (match = greatest ref.s with ref.s <= probe.s).
      """WITH probe AS (SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS s, value
                        FROM events WHERE event_type = 'click'),
              ref AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS s, max(value) AS ref_value
                      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
         SELECT p.user_id, p.event_id, p.s, p.value, r.s AS asof_s, r.ref_value AS asof_value
         FROM probe p ASOF LEFT JOIN ref r ON p.user_id = r.user_id AND p.s >= r.s
         ORDER BY p.user_id, p.event_id""",
    "ev_top_value" ->
      """SELECT user_id, rn, event_id, event_type, value FROM (
           SELECT user_id, event_id, event_type, value,
                  CAST(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS rn
           FROM events) t
         WHERE rn <= 3 ORDER BY user_id, rn"""
  )
}
