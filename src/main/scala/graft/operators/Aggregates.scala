package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Det._

/** Aggregation surface (SURVEY §2.1 relalg.aggregation / §2.4).
  * Reference: relalg.aggregation RelAlgOps.td:223, aggrfn enum RelAlgOps.td:71-85
  * (sum,min,max,avg,count,any,stddev_samp,var_samp), DISTINCT-aggregate rewrite
  * sql_mlir_translator.cpp:1512-1514, AVG/STDDEV decomposition
  * sql_analyzer.cpp:1334,2680-2706, ROLLUP expansion
  * sql_mlir_translator.cpp:1699-1766, groupjoin RelAlgOps.td:240.
  *
  * Spark's HashAggregateExec already does the two-phase (partial/final)
  * aggregation the reference builds by hand with thread-local pre-aggregation
  * hash tables (SpecializeParallelPass.cpp:23-105) — at cluster scale the
  * partial agg is the map-side combine that keeps the shuffle small.
  *
  * stddev/var are decomposed into exact decimal sums (like the reference's
  * analyzer decomposition) so the result is bit-identical to the DuckDB oracle
  * regardless of aggregation order.
  */
object Aggregates {
  // scan-path loads (Tables.loadScan): no query in this file joins or
  // aggregates on a bucketed table's bucket key, so the splittable plain
  // layout always wins over the one-task-per-bucket-file bucketed scan
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.loadScan(s, d, n)
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Global (keyless) aggregate — reference subop.simple_state (SubOperatorOps.td:199).
    "agg_global" -> ((s, d) =>
      t(s, d, "lineitem").agg(
        count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sum_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))),

    // HAVING — filter over aggregate.
    "agg_having" -> ((s, d) =>
      t(s, d, "customer")
        .groupBy(big(col("c_nationkey")).as("nk"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 50)
        .orderBy("nk")),

    // Multi-DISTINCT aggregate (expand-based in Spark; reference RA2SO:2561-2609).
    "agg_distinct_count" -> ((s, d) =>
      t(s, d, "orders").agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderpriority")).as("n_prio"))),

    // sum(DISTINCT) — reference rewrites via distinct projection sub-stream.
    "agg_sum_distinct" -> ((s, d) =>
      t(s, d, "lineitem").agg(
        sum_distinct(dec2(col("l_quantity"))).cast("double").as("sum_dq"),
        countDistinct(col("l_quantity")).as("n_dq"))),

    // avg / stddev_samp / var_samp decomposed into exact decimal sums
    // (reference decomposes identically: sql_analyzer.cpp:2680-2706).
    "agg_stats" -> ((s, d) => {
      val g = t(s, d, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(
          count(col("c_acctbal")).as("n"),
          sum(dec2(col("c_acctbal"))).cast("double").as("s"),
          sum(dec4(col("c_acctbal") * col("c_acctbal"))).cast("double").as("s2"))
      g.select(
        col("c_mktsegment"),
        col("n"),
        (col("s") / col("n")).as("avg_bal"),
        ((col("s2") - col("s") * col("s") / col("n")) / (col("n") - 1)).as("var_bal"),
        sqrt((col("s2") - col("s") * col("s") / col("n")) / (col("n") - 1)).as("std_bal"))
        .orderBy("c_mktsegment")
    }),

    // Bivariate statistics: corr / regression slope+intercept via the same
    // exact-decimal moment decomposition as agg_stats (sums are
    // order-independent and engine-identical; the final double formula is
    // evaluated on identical inputs with an identical expression tree, so
    // even corr() — which Spark and DuckDB both implement with
    // non-deterministic-order double accumulation natively — hash-matches).
    "agg_corr_regr" -> ((s, d) => {
      val g = t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(dec2(col("l_quantity"))).cast("double").as("sx"),
          sum(dec2(col("l_extendedprice"))).cast("double").as("sy"),
          sum(dec4(col("l_quantity") * col("l_quantity"))).cast("double").as("sxx"),
          sum(dec4(col("l_extendedprice") * col("l_extendedprice"))).cast("double").as("syy"),
          sum(dec4(col("l_quantity") * col("l_extendedprice"))).cast("double").as("sxy"))
      val cov = col("n") * col("sxy") - col("sx") * col("sy")
      val vx = col("n") * col("sxx") - col("sx") * col("sx")
      val vy = col("n") * col("syy") - col("sy") * col("sy")
      // the final ratios are rounded to fixed digits on BOTH sides: the
      // moment sums are exact, but DuckDB's C++ build contracts a*b - c*d
      // into FMA while the JVM never does — a 1-ulp (~5e-20) divergence
      // that surfaced at sf1 magnitudes. 12 decimals on |corr|≤1 and the
      // slope ≈ 12 significant digits (the ClickBench normalization).
      g.select(col("l_returnflag"), col("n"),
        round(cov / (sqrt(vx) * sqrt(vy)), 12).as("corr_qty_price"),
        round(cov / vx, 12).as("slope"),
        round((col("sy") - cov / vx * col("sx")) / col("n"), 6).as("intercept"))
        .orderBy("l_returnflag")
    }),

    // relalg.aggrfn 'any' (RelAlgOps.td:71-85; AnyAggrFunc RA2SO:1843) —
    // arbitrary-value-per-group; gated on a functionally-determined column so
    // the result is unique and oracle-comparable (min() in the oracle).
    "agg_any_value" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy(big(col("c_nationkey")).as("nk"))
        .agg(any_value(col("n_name")).as("nation_name"), count(lit(1)).as("n"))
        .orderBy("nk")),

    // min/max over strings.
    "agg_minmax_string" -> ((s, d) =>
      t(s, d, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(min(col("c_name")).as("min_name"), max(col("c_name")).as("max_name"))
        .orderBy("c_mktsegment")),

    // relalg.collectionjoin / getlist (RelAlgOps.td:366,515) — nested collection
    // per group, rendered as a deterministic sorted string.
    "agg_collect_list" -> ((s, d) =>
      t(s, d, "orders")
        .filter(col("o_custkey") <= 200)
        .groupBy(col("o_custkey").as("custkey"))
        .agg(concat_ws(",", sort_array(collect_list(col("o_orderkey"))).cast("array<string>")).as("order_ids"),
          count(lit(1)).as("n"))
        .orderBy("custkey")),

    // relalg.groupjoin (RelAlgOps.td:240) — join+aggregate with the
    // reference's eager-aggregation shape: the group key IS the join key and
    // customer is unique per key, so the fact side aggregates BEFORE the
    // join — partial aggregation combines map-side and the join input
    // shrinks from |orders| to |customers|. (Join-then-group pays a full
    // fact-table shuffle of unaggregated rows; measured 3.0s vs 1.6s at
    // sf10.) The inner join drops order-less customers in both forms.
    "agg_groupjoin" -> ((s, d) => {
      val ordAgg = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      // Unconditional shuffle_hash on the aggregate side (the q10 pattern):
      // ordAgg's rows grow with the fact table, so it must never broadcast,
      // and the aggregation's own exchange already partitions it on the join
      // key — the hint makes the join reuse that layout and exchange ONLY
      // customer. Without it the mid-regime was the trap: at sf10 the
      // planner's 2-column estimate of 1.5M customers snuck under the 10 MB
      // threshold and BROADCAST the customer side — a 469 ms single-threaded
      // driver collect+build gap between stages (StageProbe r11 session 3;
      // QTime 1.48 -> 1.24 s median with the hint — the saved driver build
      // is partly offset by the added ~45 MB customer exchange, and the
      // remaining term is that exchange plus the agg itself). At sf100 customer's
      // estimate is over the threshold either way; the hint just pins the
      // same shuffle-hash shape (per-partition ordAgg builds are ~12 MB).
      t(s, d, "customer")
        .join(ordAgg.hint("shuffle_hash"), col("c_custkey") === col("o_custkey"))
        .filter(col("n_orders") >= 15)
        .select(col("c_custkey"), col("c_name"), col("n_orders"), col("total"))
        .orderBy("c_custkey")
    }),

    // ROLLUP + GROUPING (reference grammar parser.y:997-1018, translated by
    // union-of-aggregations expansion; Spark Expand does the same).
    //
    // Formulation: aggregate to the FINEST grouping set first, then roll the
    // tiny partial up. Spark's naive plan runs Expand BEFORE the aggregate —
    // every fact row is replicated once per grouping set (3x the scan feeding
    // the hash aggregate; 45M expanded rows at sf100, measured 1.59 s vs
    // DuckDB 0.17 s). count() is re-aggregable (sum of partial counts), so
    // the (r_name, n_name) base — at most |region|x|nation| = 25 rows — is
    // computed with one ordinary two-phase aggregate and only the 25-row base
    // goes through Expand. Same result, hash-checked against DuckDB's
    // GROUP BY ROLLUP; the coalesce(sum,0) keeps the empty-input grand-total
    // row at n=0 exactly like count(*) would. At 100 TB this is the only
    // rollup shape that works: the expand multiplier applies to 25 rows, not
    // the fact table.
    "agg_rollup" -> ((s, d) => {
      // Aggregate pushdown below the dimension joins: count per c_nationkey
      // FIRST (25 groups out of the 15M-row fact at sf100 — a pruned
      // single-column scan + map-side-combining agg), then broadcast-join the
      // 25-row result to nation⋈region. Joining first (even broadcast) paid
      // a row-at-a-time join + wide-row agg over the whole fact: 0.69 s at
      // sf100 vs DuckDB 0.15. Inner-join-after-agg drops exactly the same
      // unmatched groups an inner-join-before-agg would drop, so the result
      // is identical; nationkey → (n_name, r_name) is functional.
      val base = t(s, d, "customer")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("cnt"))
        .join(graft.Tables.dim(t(s, d, "nation")
            .join(graft.Tables.hashIfSmall(t(s, d, "region")),
              col("n_regionkey") === col("r_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
      base.rollup(col("r_name"), col("n_name"))
        .agg(coalesce(sum(col("cnt")), lit(0L)).as("n"),
          grouping(col("r_name")).cast("int").as("g_r"),
          grouping(col("n_name")).cast("int").as("g_n"))
        .select(coalesce(col("r_name"), lit("(all)")).as("region"),
          coalesce(col("n_name"), lit("(all)")).as("nation"),
          col("n"), col("g_r"), col("g_n"))
        .orderBy("region", "nation")
    }),

    // CUBE (beyond the reference's grammar, which comments CUBE out —
    // parser.y:1060-1068 — but part of a complete Spark-native surface).
    "agg_cube" -> ((s, d) => {
      val j = t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
      j.cube(col("c_mktsegment"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("c_mktsegment"), lit("(all)")).as("segment"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("n"))
        .orderBy("segment", "priority")
    }),

    // GROUPING SETS via the SQL surface.
    "agg_grouping_sets" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("gs_orders")
      s.sql(
        """SELECT coalesce(o_orderstatus, '(all)') AS status,
          |       coalesce(o_orderpriority, '(all)') AS priority,
          |       count(*) AS n
          |FROM gs_orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY status, priority""".stripMargin)
    })
  )

  val oracle: Map[String, String] = Map(
    "agg_global" ->
      "SELECT count(*) AS n, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price FROM lineitem",
    "agg_having" ->
      "SELECT CAST(c_nationkey AS BIGINT) AS nk, count(*) AS n FROM customer GROUP BY 1 HAVING count(*) >= 50 ORDER BY nk",
    "agg_distinct_count" ->
      "SELECT count(DISTINCT o_custkey) AS n_cust, count(DISTINCT o_orderpriority) AS n_prio FROM orders",
    "agg_sum_distinct" ->
      "SELECT CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_dq, count(DISTINCT l_quantity) AS n_dq FROM lineitem",
    "agg_stats" ->
      """SELECT c_mktsegment, n, s / n AS avg_bal,
                (s2 - s * s / n) / (n - 1) AS var_bal,
                sqrt((s2 - s * s / n) / (n - 1)) AS std_bal
         FROM (SELECT c_mktsegment, count(c_acctbal) AS n,
                      CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS s,
                      CAST(sum(CAST(c_acctbal * c_acctbal AS DECIMAL(24,4))) AS DOUBLE) AS s2
               FROM customer GROUP BY 1) g
         ORDER BY c_mktsegment""",
    "agg_corr_regr" ->
      """SELECT l_returnflag, n,
                round((n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)), 12) AS corr_qty_price,
                round((n*sxy - sx*sy) / (n*sxx - sx*sx), 12) AS slope,
                round((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 6) AS intercept
         FROM (SELECT l_returnflag, count(*) AS n,
                      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                      CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(24,4))) AS DOUBLE) AS sxx,
                      CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(24,4))) AS DOUBLE) AS syy,
                      CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(24,4))) AS DOUBLE) AS sxy
               FROM lineitem GROUP BY 1) g
         ORDER BY l_returnflag""",
    "agg_any_value" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nk, min(n_name) AS nation_name, count(*) AS n
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1 ORDER BY nk""",
    "agg_minmax_string" ->
      "SELECT c_mktsegment, min(c_name) AS min_name, max(c_name) AS max_name FROM customer GROUP BY 1 ORDER BY c_mktsegment",
    "agg_collect_list" ->
      "SELECT o_custkey AS custkey, string_agg(o_orderkey, ',' ORDER BY o_orderkey) AS order_ids, count(*) AS n FROM orders WHERE o_custkey <= 200 GROUP BY 1 ORDER BY custkey",
    "agg_groupjoin" ->
      """SELECT c_custkey, c_name, count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM customer JOIN orders ON c_custkey = o_custkey
         GROUP BY 1, 2 HAVING count(*) >= 15 ORDER BY c_custkey""",
    "agg_rollup" ->
      """SELECT coalesce(r_name, '(all)') AS region, coalesce(n_name, '(all)') AS nation,
                count(*) AS n, CAST(grouping(r_name) AS INTEGER) AS g_r,
                CAST(grouping(n_name) AS INTEGER) AS g_n
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP(r_name, n_name)
         ORDER BY region, nation""",
    "agg_cube" ->
      """SELECT coalesce(c_mktsegment, '(all)') AS segment,
                coalesce(o_orderpriority, '(all)') AS priority, count(*) AS n
         FROM customer JOIN orders ON c_custkey = o_custkey
         GROUP BY CUBE(c_mktsegment, o_orderpriority)
         ORDER BY segment, priority""",
    "agg_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
                coalesce(o_orderpriority, '(all)') AS priority, count(*) AS n
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY status, priority"""
  )
}
