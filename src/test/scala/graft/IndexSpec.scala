package graft

import graft.sqlsurface.GraftSql

/** CREATE INDEX as a physical layout (IndexSurface): plan-shape proof that a
  * user-indexed table joins with zero shuffle exchange, plus the
  * correctness-preserving maintenance paths (insert rebuild, re-create
  * invalidation, unique enforcement). The reference analog is the persistent
  * hash index driving index-nested-loop joins
  * (reference src/runtime/LingoDBHashIndex.cpp, src/catalog/IndexCatalogEntry.cpp). */
class IndexSpec extends SparkSpec {

  private def sql(s: String) = GraftSql(spark, s)

  test("indexed join runs with zero shuffle exchange on user tables") {
    // user tables, NOT the ScaleUp-pre-bucketed facts: index both sides of
    // a custkey join and the equi-join must need no Exchange at all
    Tables.registerAll(spark, sf)
    sql("CREATE INDEX cust_pk ON customer(c_custkey)")
    sql("CREATE INDEX ord_cust ON orders(o_custkey)")
    // sf0.001 tables are broadcast-sized; force the shuffle-or-merge path the
    // index exists to serve (at fact scale the planner lands here on its own)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val df = spark.sql(
        """SELECT c_custkey, c_name, o_orderkey
          |FROM customer JOIN orders ON c_custkey = o_custkey""".stripMargin)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"indexed custkey join must be zero-exchange:\n$plan")
      // sanity: the join actually produced rows
      assert(df.count() > 0)
      // and matches the unindexed answer exactly
      val base = Tables.load(spark, sf, "customer").select("c_custkey")
        .join(Tables.load(spark, sf, "orders"),
          org.apache.spark.sql.functions.col("c_custkey") ===
            org.apache.spark.sql.functions.col("o_custkey"))
      assert(df.count() == base.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      sql("DROP INDEX cust_pk")
      sql("DROP INDEX ord_cust")
    }
  }

  test("aggregation on the index key needs no exchange") {
    Tables.registerAll(spark, sf)
    sql("CREATE INDEX ord_cust2 ON orders(o_custkey)")
    try {
      val df = spark.sql(
        "SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"groupBy on the index key must be zero-exchange:\n$plan")
      assert(df.count() > 0)
    } finally sql("DROP INDEX ord_cust2")
  }

  test("insert into an indexed table rebuilds the index (results never stale)") {
    sql("DROP TABLE IF EXISTS idx_t")
    sql("CREATE TABLE idx_t (k INT, v STRING) USING parquet")
    sql("INSERT INTO idx_t VALUES (1, 'a'), (2, 'b')")
    sql("CREATE INDEX idx_t_k ON idx_t(k)")
    assert(spark.sql("SELECT count(*) FROM idx_t").head.getLong(0) == 2)
    sql("INSERT INTO idx_t VALUES (3, 'c')")
    // the read resolves through the index shadow and must see the new row
    assert(spark.sql("SELECT count(*) FROM idx_t").head.getLong(0) == 3)
    assert(spark.sql("SELECT v FROM idx_t WHERE k = 3").head.getString(0) == "c")
    sql("DROP TABLE idx_t")
  }

  test("re-CREATE TABLE discards the old table's indexes") {
    sql("DROP TABLE IF EXISTS idx_r")
    sql("CREATE TABLE idx_r (k INT) USING parquet")
    sql("INSERT INTO idx_r VALUES (1)")
    sql("CREATE INDEX idx_r_k ON idx_r(k)")
    sql("DROP TABLE idx_r")
    sql("CREATE TABLE idx_r (k INT, j INT) USING parquet")
    sql("INSERT INTO idx_r VALUES (7, 8)")
    // stale shadow would still show the 1-row single-column snapshot
    val rows = spark.sql("SELECT k, j FROM idx_r").collect()
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((7, 8)))
    sql("DROP TABLE idx_r")
  }

  test("CREATE UNIQUE INDEX rejects duplicate keys") {
    sql("DROP TABLE IF EXISTS idx_u")
    sql("CREATE TABLE idx_u (k INT) USING parquet")
    sql("INSERT INTO idx_u VALUES (1), (1)")
    val e = intercept[Exception](sql("CREATE UNIQUE INDEX idx_u_k ON idx_u(k)"))
    assert(e.getMessage.contains("duplicate key"), e.getMessage)
    sql("DROP TABLE idx_u")
  }

  test("multi-column index with ASC/DESC modifiers parses (select4.test forms)") {
    sql("DROP TABLE IF EXISTS idx_m")
    sql("CREATE TABLE idx_m (a INT, b INT, c INT) USING parquet")
    sql("INSERT INTO idx_m VALUES (1, 2, 3), (4, 5, 6)")
    sql("CREATE INDEX idx_m_all ON idx_m(a DESC, b ASC, c)")
    assert(spark.sql("SELECT sum(a) FROM idx_m").head.getLong(0) == 5)
    sql("DROP INDEX idx_m_all")
    sql("DROP TABLE idx_m")
  }
}
