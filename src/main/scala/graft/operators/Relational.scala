package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Det._

/** Core relational operators (SURVEY §2.1), each exposed as a named query with
  * a DuckDB oracle. Reference: the `relalg` dialect,
  * include/lingodb/compiler/Dialect/RelAlg/IR/RelAlgOps.td — scan :120, selection
  * :136, map :155, limit :171, topk :179, crossproduct :195, renaming :207,
  * projection :394, sort :268, joins :289-391, set ops :434-444.
  *
  * Everything is a declarative DataFrame plan: Catalyst pushes the filters into
  * the parquet scan, prunes columns, and picks broadcast vs shuffle join, which
  * replaces LingoDB's Pushdown/ColumnFolding/OptimizeImplementations passes
  * (reference src/compiler/Dialect/RelAlg/Passes.cpp:17-50).
  */
object Relational {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // relalg.const_relation (RelAlgOps.td:108) — inline VALUES relation.
    "rel_const_values" -> ((s, _) => {
      import s.implicits._
      Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("k", "v").orderBy("k")
    }),

    // relalg.basetable + projection (RelAlgOps.td:120,394) — scan with pruning.
    "rel_scan_project" -> ((s, d) =>
      t(s, d, "region")
        .select(big(col("r_regionkey")).as("r_regionkey"), col("r_name"))
        .orderBy("r_regionkey")),

    // relalg.selection (RelAlgOps.td:136) — predicate pushed to parquet scan.
    "rel_filter" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity") >= 45 && col("l_discount") <= 0.02)
        .select(col("l_orderkey"), big(col("l_linenumber")).as("l_linenumber"),
          col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber")),

    // relalg.map (RelAlgOps.td:155) — computed columns.
    "rel_map" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_orderkey") <= 200)
        .select(
          col("l_orderkey"), big(col("l_linenumber")).as("l_linenumber"),
          (money(col("l_extendedprice")) * money(lit(1) - col("l_discount")) * money(lit(1) + col("l_tax")))
            .cast("double").as("charge"),
          (col("l_quantity") * 2).as("qty2"))
        .orderBy("l_orderkey", "l_linenumber")),

    // relalg.limit (RelAlgOps.td:171) — no-order LIMIT; wrapped in a count so
    // the nondeterministic row choice (same in the reference, RA2SO:1589) does
    // not break the hash compare.
    "rel_limit" -> ((s, d) =>
      t(s, d, "customer").limit(50).agg(count(lit(1)).as("n"))),

    // relalg.topk (RelAlgOps.td:179) — Spark plans TakeOrderedAndProject, the
    // same bounded-heap shape as the reference's TopKLowering (RA2SO:1690).
    "rel_topk" -> ((s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"))),

    // relalg.crossproduct (RelAlgOps.td:195).
    "rel_cross" -> ((s, d) =>
      t(s, d, "region").crossJoin(t(s, d, "nation"))
        .select(col("r_name"), col("n_name"))
        .orderBy("r_name", "n_name")),

    // relalg.renaming (RelAlgOps.td:207).
    "rel_rename" -> ((s, d) =>
      t(s, d, "nation")
        .select(big(col("n_nationkey")).as("id"), col("n_name").as("name"))
        .orderBy("id")),

    // relalg.sort (RelAlgOps.td:268) — multi-key total order, asc + desc.
    "rel_sort_multi" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_orderkey") <= 400)
        .select(col("l_orderkey"), big(col("l_linenumber")).as("l_linenumber"),
          col("l_quantity"))
        .orderBy(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber"))),

    // relalg.projection distinct (RelAlgOps.td:394, distinct semantics).
    "rel_distinct" -> ((s, d) =>
      t(s, d, "customer").select(col("c_mktsegment")).distinct().orderBy("c_mktsegment")),

    // relalg.join inner (RelAlgOps.td:289) — equi-join; small side broadcast
    // is Catalyst's choice (AQE), mirroring OptimizeImplementations impl=hash.
    "join_inner" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_orderkey")),

    // relalg.outerjoin (RelAlgOps.td:318) — left outer with null padding,
    // nulls coalesced so both engines agree on ordering.
    "join_left" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 450000),
          col("c_custkey") === col("o_custkey"), "left")
        .filter(col("c_custkey") <= 300)
        .select(col("c_custkey"), coalesce(col("o_orderkey"), lit(-1L)).as("o_key"))
        .orderBy("c_custkey", "o_key")),

    // right outer join — mirror of relalg.outerjoin.
    "join_right" -> ((s, d) =>
      t(s, d, "supplier")
        .join(t(s, d, "nation"), col("s_nationkey") === col("n_nationkey"), "right")
        .select(big(col("n_nationkey")).as("n_nationkey"),
          coalesce(col("s_suppkey"), lit(-1L)).as("s_key"))
        .orderBy("n_nationkey", "s_key")),

    // relalg.fullouterjoin (RelAlgOps.td:335) — asymmetric sides so both null
    // directions are exercised.
    "join_full" -> ((s, d) => {
      val cn = t(s, d, "customer").filter(col("c_nationkey") < 20)
        .groupBy(big(col("c_nationkey")).as("ck")).agg(count(lit(1)).as("n_cust"))
      val sn = t(s, d, "supplier").filter(col("s_nationkey") >= 5)
        .groupBy(big(col("s_nationkey")).as("sk")).agg(count(lit(1)).as("n_supp"))
      cn.join(sn, col("ck") === col("sk"), "full")
        .select(coalesce(col("ck"), col("sk")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nationkey")
    }),

    // relalg.semijoin (RelAlgOps.td:297) — EXISTS as left_semi.
    "join_semi" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 400000).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")),

    // relalg.antisemijoin (RelAlgOps.td:307) — NOT EXISTS as left_anti.
    // The subquery keeps a price predicate so the witness is NON-EMPTY at
    // every SF (every synthetic customer has at least one order; customers
    // whose orders all stay under 300k survive the anti-join).
    "join_anti" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 300000)
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")),

    // Binned range (interval) join — the θ-join shape relalg.join supports
    // with a pure BETWEEN predicate (RelAlgOps.td:289 takes an arbitrary
    // predicate region; the reference evaluates it as a nested loop when no
    // equi-key exists). Spark's default for a keyless θ-join is
    // BroadcastNestedLoopJoin — O(n·m) and broadcast-bound, a scale
    // dead-end. Instead the interval join is rewritten as an EQUI-join on a
    // date bin plus a residual filter: windows are at most 31 days wide,
    // bins are 32 days, so every window overlaps ≤2 bins (explode) and
    // every point lives in exactly 1 bin — each (window, point) pair meets
    // at exactly one bin value, so no post-join dedup is needed. The join
    // hash-partitions on the bin like any equi-join: shuffle-safe at any
    // scale, broadcastable when one side is small (AQE's call).
    // Query: per promo window (a derived closed-form subset of orders),
    // lineitem count + total quantity shipped inside [ws, we).
    "join_range" -> ((s, d) => {
      val binDays = 32
      val epoch = to_date(lit("1970-01-01"))
      val win = t(s, d, "orders").filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey").as("win_id"),
          to_date(col("o_orderdate")).as("ws"),
          date_add(to_date(col("o_orderdate")),
            (col("o_orderkey") % 28 + 3).cast("int")).as("we"))
      val winBins = win.withColumn("bin",
        explode(sequence(
          floor(datediff(col("ws"), epoch) / binDays),
          floor(datediff(date_sub(col("we"), 1), epoch) / binDays))))
      val pts = t(s, d, "lineitem")
        .select(to_date(col("l_shipdate")).as("ls"), col("l_quantity"))
        .withColumn("bin", floor(datediff(col("ls"), epoch) / binDays))
      pts.join(winBins,
          pts("bin") === winBins("bin") &&
            col("ls") >= col("ws") && col("ls") < col("we"))
        .groupBy(col("win_id"))
        .agg(count(lit(1)).as("n_lines"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy("win_id")
    }),

    // relalg.union all/distinct (RelAlgOps.td:434).
    "set_union_all" -> ((s, d) =>
      t(s, d, "customer").select(big(col("c_nationkey")).as("x"))
        .unionAll(t(s, d, "supplier").select(big(col("s_nationkey"))))
        .orderBy("x")),
    "set_union" -> ((s, d) =>
      t(s, d, "customer").select(big(col("c_nationkey")).as("x"))
        .union(t(s, d, "supplier").select(big(col("s_nationkey"))))
        .distinct()
        .orderBy("x")),

    // relalg.intersect / except with ALL bag semantics (RelAlgOps.td:438-444;
    // counting lowering RA2SO:728). Spark intersectAll/exceptAll implement the
    // same min/max-count bag semantics.
    "set_intersect" -> ((s, d) =>
      t(s, d, "customer").filter(col("c_acctbal") > 0).select(big(col("c_nationkey")).as("x"))
        .intersect(t(s, d, "supplier").select(big(col("s_nationkey"))))
        .orderBy("x")),
    "set_intersect_all" -> ((s, d) =>
      t(s, d, "customer").filter(col("c_custkey") <= 500).select(big(col("c_nationkey")).as("x"))
        .intersectAll(t(s, d, "supplier").select(big(col("s_nationkey"))))
        .orderBy("x")),
    // RHS restricted to s_nationkey < 18 so the difference is non-empty:
    // unfiltered, suppliers cover every customer nationkey at gate SFs.
    "set_except" -> ((s, d) =>
      t(s, d, "customer").select(big(col("c_nationkey")).as("x"))
        .except(t(s, d, "supplier").filter(col("s_nationkey") < 18)
          .select(big(col("s_nationkey"))))
        .orderBy("x")),
    "set_except_all" -> ((s, d) =>
      t(s, d, "customer").filter(col("c_custkey") <= 200).select(big(col("c_nationkey")).as("x"))
        .exceptAll(t(s, d, "supplier").select(big(col("s_nationkey"))))
        .orderBy("x")),

    // relalg.count (CountRowsOp, RelAlgOps.td:472).
    "rel_count_star" -> ((s, d) =>
      t(s, d, "lineitem").agg(count(lit(1)).as("n"))),

    // relalg.tmp (RelAlgOps.td:499) — materialize a shared subtree once and
    // read it twice (reference: TmpLowering buffer + N scans; Spark: persist).
    "rel_tmp_reuse" -> ((s, d) => {
      val agg = t(s, d, "customer")
        .groupBy(big(col("c_nationkey")).as("nk")).agg(count(lit(1)).as("n"))
        .persist()
      val big_ = agg.filter(col("n") >= 50)
        .select(col("nk"), col("n"), lit("big").as("side"))
      val small = agg.filter(col("n") < 50)
        .select(col("nk"), col("n"), lit("small").as("side"))
      big_.unionAll(small).orderBy("nk")
    }),

    // relalg.track_tuples (RelAlgOps.td:530) — flow metrics via observe();
    // result rows unchanged, counters surfaced through QueryExecutionListener.
    "rel_observe" -> ((s, d) =>
      t(s, d, "region")
        .observe("graft_metrics", count(lit(1)).as("rows_seen"))
        .select(big(col("r_regionkey")).as("k"), col("r_name"))
        .orderBy("k"))
  )

  val oracle: Map[String, String] = Map(
    "rel_const_values" ->
      "SELECT * FROM (VALUES (CAST(1 AS BIGINT),'one'),(CAST(2 AS BIGINT),'two'),(CAST(3 AS BIGINT),'three')) AS t(k, v) ORDER BY k",
    "rel_scan_project" ->
      "SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "rel_filter" ->
      "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity FROM lineitem WHERE l_quantity >= 45 AND l_discount <= 0.02 ORDER BY l_orderkey, l_linenumber",
    "rel_map" ->
      "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2)) * CAST(1 + l_tax AS DECIMAL(12,2)) AS DOUBLE) AS charge, l_quantity * 2 AS qty2 FROM lineitem WHERE l_orderkey <= 200 ORDER BY l_orderkey, l_linenumber",
    "rel_limit" ->
      "SELECT count(*) AS n FROM (SELECT * FROM customer LIMIT 50) t",
    "rel_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "rel_cross" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name",
    "rel_rename" ->
      "SELECT CAST(n_nationkey AS BIGINT) AS id, n_name AS name FROM nation ORDER BY id",
    "rel_sort_multi" ->
      "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity FROM lineitem WHERE l_orderkey <= 400 ORDER BY l_quantity DESC, l_orderkey, l_linenumber",
    "rel_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    "join_inner" ->
      "SELECT c_custkey, c_name, o_orderkey, o_totalprice FROM customer JOIN orders ON c_custkey = o_custkey WHERE o_totalprice > 300000 ORDER BY o_orderkey",
    "join_left" ->
      "SELECT c_custkey, coalesce(o_orderkey, -1) AS o_key FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o ON c_custkey = o_custkey WHERE c_custkey <= 300 ORDER BY c_custkey, o_key",
    "join_right" ->
      "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, coalesce(s_suppkey, -1) AS s_key FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey ORDER BY n_nationkey, s_key",
    "join_full" ->
      """SELECT coalesce(ck, sk) AS nationkey, coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
         FROM (SELECT CAST(c_nationkey AS BIGINT) AS ck, CAST(count(*) AS BIGINT) AS n_cust FROM customer WHERE c_nationkey < 20 GROUP BY 1) c
         FULL JOIN (SELECT CAST(s_nationkey AS BIGINT) AS sk, CAST(count(*) AS BIGINT) AS n_supp FROM supplier WHERE s_nationkey >= 5 GROUP BY 1) s
         ON ck = sk ORDER BY nationkey""",
    "join_semi" ->
      "SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000) ORDER BY c_custkey",
    "join_anti" ->
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000) ORDER BY c_custkey",
    "set_union_all" ->
      "SELECT x FROM (SELECT CAST(c_nationkey AS BIGINT) AS x FROM customer UNION ALL SELECT CAST(s_nationkey AS BIGINT) FROM supplier) t ORDER BY x",
    "set_union" ->
      "SELECT x FROM (SELECT CAST(c_nationkey AS BIGINT) AS x FROM customer UNION SELECT CAST(s_nationkey AS BIGINT) FROM supplier) t ORDER BY x",
    "set_intersect" ->
      "SELECT x FROM (SELECT CAST(c_nationkey AS BIGINT) AS x FROM customer WHERE c_acctbal > 0 INTERSECT SELECT CAST(s_nationkey AS BIGINT) FROM supplier) t ORDER BY x",
    "set_intersect_all" ->
      "SELECT x FROM (SELECT CAST(c_nationkey AS BIGINT) AS x FROM customer WHERE c_custkey <= 500 INTERSECT ALL SELECT CAST(s_nationkey AS BIGINT) FROM supplier) t ORDER BY x",
    "set_except" ->
      "SELECT x FROM (SELECT CAST(c_nationkey AS BIGINT) AS x FROM customer EXCEPT SELECT CAST(s_nationkey AS BIGINT) FROM supplier WHERE s_nationkey < 18) t ORDER BY x",
    "set_except_all" ->
      "SELECT x FROM (SELECT CAST(c_nationkey AS BIGINT) AS x FROM customer WHERE c_custkey <= 200 EXCEPT ALL SELECT CAST(s_nationkey AS BIGINT) FROM supplier) t ORDER BY x",
    "join_range" ->
      """WITH win AS (SELECT o_orderkey AS win_id,
                             CAST(o_orderdate AS DATE) AS ws,
                             CAST(o_orderdate AS DATE) + CAST((o_orderkey % 28) + 3 AS INTEGER) AS we
                      FROM orders WHERE o_orderkey % 97 = 0)
         SELECT win_id, CAST(count(*) AS BIGINT) AS n_lines, sum(l_quantity) AS sum_qty
         FROM win JOIN lineitem
           ON CAST(l_shipdate AS DATE) >= ws AND CAST(l_shipdate AS DATE) < we
         GROUP BY win_id ORDER BY win_id""",
    "rel_count_star" ->
      "SELECT count(*) AS n FROM lineitem",
    "rel_tmp_reuse" ->
      """WITH a AS (SELECT CAST(c_nationkey AS BIGINT) AS nk, count(*) AS n
                    FROM customer GROUP BY 1)
         SELECT nk, n, 'big' AS side FROM a WHERE n >= 50
         UNION ALL
         SELECT nk, n, 'small' AS side FROM a WHERE n < 50
         ORDER BY nk""",
    "rel_observe" ->
      "SELECT CAST(r_regionkey AS BIGINT) AS k, r_name FROM region ORDER BY k"
  )
}
