package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Det._

/** Window operator surface (SURVEY §2.1 relalg.window / relalg.rank).
  * Reference: relalg.window RelAlgOps.td:254 (partition_by, order_by, ROWS
  * frames with constant bounds), WindowLowering RA2SO:2193-2550 (partitions via
  * hashmap of buffers, frames via segment-tree view,
  * src/runtime/SegmentTreeView.cpp); window functions limited to aggregates +
  * RANK + ROW_NUMBER (sql_analyzer.cpp:2646). We add lag/lead as part of a
  * complete Spark-native surface.
  *
  * Spark's WindowExec shuffles by partition key then sorts within partitions —
  * the distributed analog of the reference's per-partition sorted views. All
  * window ORDER BYs carry a unique tiebreaker so results are total-ordered and
  * frame contents deterministic; running sums use exact decimal accumulation.
  */
object Windows {
  // scan-path loads (Tables.loadScan): no query in this file joins or
  // aggregates on a bucketed table's bucket key, so the splittable plain
  // layout always wins over the one-task-per-bucket-file bucketed scan
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.loadScan(s, d, n)
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // RANK with deterministic tiebreak (relalg.rank RelAlgOps.td:479).
    "win_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, d, "customer")
        .filter(col("c_custkey") <= 500)
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          rank().over(w).cast("long").as("rnk"))
        .orderBy("c_mktsegment", "rnk")
    }),

    // ROW_NUMBER + top-3-per-group pattern.
    "win_rownum_topn" -> ((s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, d, "customer")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(big(col("c_nationkey")).as("nk"), col("rn"), col("c_custkey"), col("c_acctbal"))
        .orderBy("nk", "rn")
    }),

    // Running sum: ROWS UNBOUNDED PRECEDING .. CURRENT ROW (the reference's
    // default frame with ORDER BY, sql_analyzer.cpp:2426-2434). Exact decimal
    // accumulation keeps both engines bit-identical.
    "win_running_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .filter(col("o_custkey") <= 100)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("o_date"),
          sum(dec2(col("o_totalprice"))).over(w).cast("double").as("running_total"))
        .orderBy("o_custkey", "o_date", "o_orderkey")
    }),

    // Sliding ROWS frame: 2 PRECEDING .. CURRENT ROW moving average
    // (reference frames: constant integer ROWS bounds, RelAlgOps.td:254).
    "win_moving_avg" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
      t(s, d, "orders")
        .filter(col("o_custkey") <= 100)
        .select(col("o_custkey"), col("o_orderkey"),
          (sum(dec2(col("o_totalprice"))).over(w).cast("double") /
            count(lit(1)).over(w)).as("mavg"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // lag/lead (beyond the reference surface; Spark-native completeness).
    "win_lag_days" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .filter(col("o_custkey") <= 100)
        .select(col("o_custkey"), col("o_orderkey"),
          datediff(col("o_orderdate").cast("date"),
            lag(col("o_orderdate"), 1).over(w).cast("date")).cast("long").as("days_since_prev"))
        .select(col("o_custkey"), col("o_orderkey"),
          coalesce(col("days_since_prev"), lit(-1L)).as("days_since_prev"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // RANGE frame over a value domain (beyond the reference surface — its
    // frames are constant-integer ROWS only, RelAlgOps.td:254): 30-day
    // trailing spend per customer. Value-based frames include all peers of
    // the current order value, so the result is deterministic without a
    // tiebreaker; Spark plans this as the same one-shuffle WindowExec.
    "win_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_days"))
        .rangeBetween(-30, Window.currentRow)
      t(s, d, "orders")
        .filter(col("o_custkey") <= 100)
        .withColumn("o_days",
          datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")).cast("long"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_days"),
          sum(dec2(col("o_totalprice"))).over(w).cast("double").as("spend_30d"),
          count(lit(1)).over(w).as("n_30d"))
        .orderBy("o_custkey", "o_days", "o_orderkey")
    }),

    // ntile / lead / first_value — the remaining ranking+navigation surface
    // (beyond the reference's aggregates+rank+row_number, sql_analyzer.cpp:2646).
    "win_ntile_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, d, "customer")
        .filter(col("c_custkey") <= 500)
        .select(col("c_mktsegment"), col("c_custkey"),
          ntile(4).over(w).cast("long").as("quartile"),
          coalesce(lead(col("c_custkey"), 1).over(w), lit(-1L)).as("next_cust"),
          first(col("c_custkey")).over(w).as("top_cust"))
        .orderBy("c_mktsegment", "c_custkey")
    }),

    // Distribution functions: percent_rank / cume_dist / nth_value — exact
    // small-rational doubles (identical across engines), unique tiebreak so
    // frames are deterministic.
    "win_percentiles" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, d, "customer")
        .filter(col("c_custkey") <= 500)
        .select(col("c_mktsegment"), col("c_custkey"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          coalesce(nth_value(col("c_custkey"), 2).over(w), lit(-1L)).as("second_cust"))
        .orderBy("c_mktsegment", "c_custkey")
    }),

    // Whole-partition frame (no ORDER BY): share-of-partition.
    "win_share" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
      t(s, d, "customer")
        .filter(col("c_acctbal") > 0)
        .select(col("c_mktsegment"), col("c_custkey"),
          (dec2(col("c_acctbal")).cast("double") /
            sum(dec2(col("c_acctbal"))).over(w).cast("double")).as("share"))
        .filter(col("c_custkey") <= 300)
        .orderBy("c_mktsegment", "c_custkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "win_rank" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
                CAST(rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rnk
         FROM customer WHERE c_custkey <= 500 ORDER BY c_mktsegment, rnk""",
    "win_rownum_topn" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nk, rn, c_custkey, c_acctbal FROM (
           SELECT c_nationkey, c_custkey, c_acctbal,
                  CAST(row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
           FROM customer) t
         WHERE rn <= 3 ORDER BY nk, rn""",
    "win_running_sum" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                     (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
         FROM orders WHERE o_custkey <= 100 ORDER BY o_custkey, o_date, o_orderkey""",
    "win_moving_avg" ->
      """SELECT o_custkey, o_orderkey,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) /
                count(*) OVER w AS mavg
         FROM orders WHERE o_custkey <= 100
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey, o_orderkey""",
    "win_lag_days" ->
      """SELECT o_custkey, o_orderkey,
                coalesce(CAST(date_diff('day',
                  CAST(lag(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE),
                  CAST(o_orderdate AS DATE)) AS BIGINT), -1) AS days_since_prev
         FROM orders WHERE o_custkey <= 100 ORDER BY o_custkey, o_orderkey""",
    "win_range_frame" ->
      """SELECT o_custkey, o_orderkey, o_days,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS spend_30d,
                count(*) OVER w AS n_30d
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                      CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS o_days
               FROM orders WHERE o_custkey <= 100) t
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_days
                      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey, o_days, o_orderkey""",
    "win_ntile_lead" ->
      """SELECT c_mktsegment, c_custkey,
                CAST(ntile(4) OVER w AS BIGINT) AS quartile,
                coalesce(lead(c_custkey, 1) OVER w, -1) AS next_cust,
                first_value(c_custkey) OVER w AS top_cust
         FROM customer WHERE c_custkey <= 500
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
         ORDER BY c_mktsegment, c_custkey""",
    "win_percentiles" ->
      """SELECT c_mktsegment, c_custkey,
                percent_rank() OVER w AS pr,
                cume_dist() OVER w AS cd,
                coalesce(nth_value(c_custkey, 2) OVER w, -1) AS second_cust
         FROM customer WHERE c_custkey <= 500
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
         ORDER BY c_mktsegment, c_custkey""",
    "win_share" ->
      """SELECT * FROM (
           SELECT c_mktsegment, c_custkey,
                  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) /
                  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) OVER (PARTITION BY c_mktsegment) AS DOUBLE) AS share
           FROM customer WHERE c_acctbal > 0) t
         WHERE c_custkey <= 300 ORDER BY c_mktsegment, c_custkey"""
  )
}
