package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Det._

/** Subquery surface (SURVEY §2.1 relalg.exists/getscalar/in/markjoin/singlejoin).
  * Reference: ImplicitToExplicitJoins.cpp:50-79 rewrites EXISTS/IN/scalar
  * subqueries into semi/anti/mark/single joins; general decorrelation in
  * Transforms/Unnesting.cpp (Neumann-style unnesting). On Spark the same
  * rewrites exist inside Catalyst (RewritePredicateSubquery,
  * RewriteCorrelatedScalarSubquery); here each shape is also expressed directly
  * in the DataFrame algebra, which is what those rules produce.
  */
object Subqueries {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)
  type Q = (SparkSession, String) => DataFrame

  /** relalg.singlejoin (RelAlgOps.td:350-364): left join guaranteeing ≤1
    * right match per left row — the lowering of a correlated SCALAR
    * subquery. The reference ERRORS at runtime when a subquery row matches
    * more than once (SingleJoinLowering semantics; SQL's "scalar subquery
    * returned more than one row"), and so does this: the right side is
    * aggregated per join key with first(value) + count(*), and each value
    * column is wrapped in a CASE that calls raise_error when the match
    * count exceeds 1 — evaluated only for rows that actually join, so the
    * happy path stays a plain broadcast/shuffle left join (same shape
    * Catalyst's own RewriteCorrelatedScalarSubquery produces). first() is
    * never exposed on the >1 path because that path raises.
    *
    * @param right    the correlated subquery's body, NOT pre-aggregated
    * @param rightKey correlation key column in `right`
    * @param valueCol the single scalar column the subquery yields
    */
  private[graft] def singleJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, valueCol: String): DataFrame = {
    val agg = right.groupBy(col(rightKey)).agg(
      count(lit(1)).as("__match_cnt"),
      first(col(valueCol)).as(valueCol))
    left.join(agg, col(leftKey) === col(rightKey), "left")
      .withColumn(valueCol,
        when(coalesce(col("__match_cnt"), lit(0L)) > 1,
          raise_error(concat(lit("singlejoin: scalar subquery returned more than one row for key "),
            col(rightKey).cast("string"))))
          .otherwise(col(valueCol)))
      .drop("__match_cnt", rightKey)
  }

  val queries: Map[String, Q] = Map(
    // Uncorrelated scalar subquery — threshold from an aggregate
    // (relalg.getscalar RelAlgOps.td:507). Broadcast of a 1-row relation.
    "sub_scalar_uncorr" -> ((s, d) => {
      val thr = t(s, d, "orders").agg((max(col("o_totalprice")) * 0.9).as("thr"))
      t(s, d, "orders").crossJoin(broadcast(thr))
        .filter(col("o_totalprice") > col("thr"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // Correlated scalar subquery = single join (relalg.singlejoin
    // RelAlgOps.td:350): ≤1 match per row, NULL-padded when absent, ERROR
    // on ambiguity (here the aggregated subquery guarantees ≤1 per key, so
    // the assertion is statically dead; SubqueriesSpec has the negative
    // case where it fires).
    "sub_scalar_corr" -> ((s, d) => {
      val mx = t(s, d, "orders")
        .groupBy(col("o_custkey")).agg(max(col("o_totalprice")).as("max_price"))
      singleJoin(t(s, d, "customer"), mx, "c_custkey", "o_custkey", "max_price")
        .select(col("c_custkey"), coalesce(col("max_price"), lit(-1.0)).as("max_price"))
        .orderBy("c_custkey")
    }),

    // IN (subquery) → semi join (relalg.in RelAlgOps.td:523).
    "sub_in" -> ((s, d) =>
      t(s, d, "nation")
        .join(t(s, d, "customer").filter(col("c_acctbal") > 9000)
            .select(col("c_nationkey")),
          col("n_nationkey") === col("c_nationkey"), "left_semi")
        .select(col("n_name"))
        .orderBy("n_name")),

    // Mark join (relalg.markjoin RelAlgOps.td:380): boolean has-match column
    // for EXISTS/IN used as a value rather than a filter.
    "sub_mark" -> ((s, d) => {
      val big_orders = t(s, d, "orders").filter(col("o_totalprice") > 400000)
        .select(col("o_custkey")).distinct().withColumn("m", lit(true))
      t(s, d, "customer")
        .join(big_orders, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), coalesce(col("m"), lit(false)).as("has_big_order"))
        .orderBy("c_custkey")
    }),

    // Correlated EXISTS with an extra non-key conjunct → semi join with
    // compound condition (HashJoinUtils-style key extraction + residual,
    // reference OptimizeImplementations.cpp:21-137).
    "sub_exists_extra" -> ((s, d) =>
      t(s, d, "supplier")
        .join(t(s, d, "lineitem").filter(col("l_quantity") > 49).select(col("l_suppkey")),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy("s_suppkey")),

    // NOT IN over a null-free key set → anti join.
    "sub_not_in" -> ((s, d) =>
      t(s, d, "part")
        .join(t(s, d, "lineitem").filter(col("l_quantity") >= 48).select(col("l_partkey")),
          col("p_partkey") === col("l_partkey"), "left_anti")
        .select(col("p_partkey"), col("p_name"))
        .orderBy("p_partkey"))
  )

  val oracle: Map[String, String] = Map(
    "sub_scalar_uncorr" ->
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > (SELECT max(o_totalprice) * 0.9 FROM orders) ORDER BY o_orderkey",
    "sub_scalar_corr" ->
      "SELECT c_custkey, coalesce((SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey), -1.0) AS max_price FROM customer ORDER BY c_custkey",
    "sub_in" ->
      "SELECT n_name FROM nation WHERE n_nationkey IN (SELECT c_nationkey FROM customer WHERE c_acctbal > 9000) ORDER BY n_name",
    "sub_mark" ->
      "SELECT c_custkey, c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000) AS has_big_order FROM customer ORDER BY c_custkey",
    "sub_exists_extra" ->
      "SELECT s_suppkey, s_name FROM supplier WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity > 49) ORDER BY s_suppkey",
    "sub_not_in" ->
      "SELECT p_partkey, p_name FROM part WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48) ORDER BY p_partkey"
  )
}
