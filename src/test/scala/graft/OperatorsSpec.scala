package graft

import org.apache.spark.sql.functions._

/** Every declared query runs at sf0.001 and returns a sane result; flagship
  * values spot-checked. The value-level gate is the DuckDB oracle compare
  * (tools/oracle_check.py) — these specs guard structure and determinism. */
class OperatorsSpec extends SparkSpec {

  test("every query in the contract runs and has columns") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sf)
        assert(df.columns.nonEmpty)
        df.count() // execute
        None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("flagship q1: 6 groups, counts sum to filtered lineitem") {
    val q1 = operators.TpchLike.q1(spark, sf).collect()
    assert(q1.length == 6)
    val totalOrders = q1.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.load(spark, sf, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("2000-01-01 00:00:00"))).count()
    assert(totalOrders == expected)
  }

  test("rel_count_star matches table size") {
    val n = SparkEntry.queries("rel_count_star")(spark, sf).collect().head.getLong(0)
    assert(n == 6000L)
  }

  test("set ops: intersectAll size bounded by both sides") {
    val n = SparkEntry.queries("set_intersect_all")(spark, sf).count()
    assert(n > 0 && n <= 100) // supplier side has 10 rows at sf0.001 * nations
  }

  test("tpch_q1 is deterministic across runs") {
    val a = operators.TpchLike.q1(spark, sf).collect().map(_.toString).toSeq
    val b = operators.TpchLike.q1(spark, sf).collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("singlejoin raises on >1 match (reference SingleJoinLowering semantics)") {
    import spark.implicits._
    val left = Seq((1L, "x"), (2L, "y")).toDF("k", "lv")
    val unique = Seq((1L, 10.0)).toDF("rk", "rv")
    val dup = Seq((1L, 10.0), (1L, 11.0)).toDF("rk", "rv")
    // happy path: <=1 match per key, NULL-padded when absent
    val ok = operators.Subqueries.singleJoin(left, unique, "k", "rk", "rv")
      .orderBy("k").collect()
    assert(ok.map(r => (r.getLong(0), Option(r.get(2)))).toSeq ==
      Seq((1L, Some(10.0)), (2L, None)))
    // ambiguous scalar subquery: reference errors, so must we
    val e = intercept[Exception] {
      operators.Subqueries.singleJoin(left, dup, "k", "rk", "rv").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("more than one row")), s"wrong error: $e")
  }
}
