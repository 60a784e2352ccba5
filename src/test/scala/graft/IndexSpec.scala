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

  test("temp-view base table survives CREATE INDEX + DROP INDEX") {
    import spark.implicits._
    // Tables.registerAll and COPY-inferred tables are temp views; the index
    // shadow REPLACES a temp view, so un-shadowing must restore the original
    // binding instead of dropping the name entirely
    Seq((1, "x"), (2, "y")).toDF("k", "v").createOrReplaceTempView("idx_tv")
    sql("CREATE INDEX idx_tv_k ON idx_tv(k)")
    assert(spark.table("idx_tv").count() == 2)
    sql("DROP INDEX idx_tv_k")
    assert(spark.table("idx_tv").count() == 2)
    assert(spark.sql("SELECT v FROM idx_tv WHERE k = 1").head.getString(0) == "x")
    spark.catalog.dropTempView("idx_tv")
  }

  test("CREATE UNIQUE INDEX allows NULL keys (NULL != NULL)") {
    sql("DROP TABLE IF EXISTS idx_n")
    sql("CREATE TABLE idx_n (k INT) USING parquet")
    sql("INSERT INTO idx_n VALUES (1), (NULL), (NULL)")
    sql("CREATE UNIQUE INDEX idx_n_k ON idx_n(k)") // must not raise
    assert(spark.sql("SELECT count(*) FROM idx_n").head.getLong(0) == 3)
    sql("DROP INDEX idx_n_k")
    sql("DROP TABLE idx_n")
  }

  test("expression-index and unknown-column forms degrade to no-op") {
    sql("DROP TABLE IF EXISTS idx_e")
    sql("CREATE TABLE idx_e (a INT, b INT) USING parquet")
    sql("INSERT INTO idx_e VALUES (1, 2)")
    sql("CREATE INDEX idx_e_ab ON idx_e(a+b)") // expression: tolerated no-op
    sql("CREATE INDEX idx_e_zz ON idx_e(zz)")  // unknown column: no-op
    assert(spark.sql("SELECT a FROM idx_e").count() == 1)
    sql("DROP TABLE idx_e")
  }

  test("INSERT appends O(delta): snapshot files added, never rewritten") {
    sql("DROP TABLE IF EXISTS idx_a")
    sql("CREATE TABLE idx_a (k INT, v STRING) USING parquet")
    sql("INSERT INTO idx_a VALUES (1, 'a'), (2, 'b')")
    sql("CREATE INDEX idx_a_k ON idx_a(k)")
    val loc = spark.sql("DESCRIBE EXTENDED graft_idx_idx_a_idx_a_k")
      .filter("col_name = 'Location'").head.getString(1)
    val dir = new java.io.File(new java.net.URI(loc))
    def dataFiles = dir.listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified).toMap
    val before = dataFiles
    assert(before.nonEmpty)
    sql("INSERT INTO idx_a VALUES (3, 'c')")
    val after = dataFiles
    // every pre-existing snapshot file untouched (no full-table rewrite job)
    before.foreach { case (n, m) =>
      assert(after.contains(n) && after(n) == m, s"file $n was rewritten")
    }
    assert(after.size > before.size, "append must add delta files")
    // the read resolves through the shadow and must see the new row
    assert(spark.sql("SELECT v FROM idx_a WHERE k = 3").head.getString(0) == "c")
    assert(spark.sql("SELECT count(*) FROM idx_a").head.getLong(0) == 3)
    sql("DROP TABLE idx_a")
  }

  test("UNIQUE index rejects a clashing INSERT before the data lands") {
    sql("DROP TABLE IF EXISTS idx_uc")
    sql("CREATE TABLE idx_uc (k INT) USING parquet")
    sql("INSERT INTO idx_uc VALUES (1), (2)")
    sql("CREATE UNIQUE INDEX idx_uc_k ON idx_uc(k)")
    val e = intercept[Exception](sql("INSERT INTO idx_uc VALUES (2)"))
    assert(e.getMessage.contains("already present"), e.getMessage)
    // pre-write rejection: the base table is unchanged
    assert(spark.sql("SELECT count(*) FROM idx_uc").head.getLong(0) == 2)
    // a non-clashing insert still goes through (NULL key is always legal)
    sql("INSERT INTO idx_uc VALUES (3), (NULL)")
    assert(spark.sql("SELECT count(*) FROM idx_uc").head.getLong(0) == 4)
    sql("DROP TABLE idx_uc")
  }

  test("INSERT OVERWRITE and quoted names trigger index maintenance") {
    sql("DROP TABLE IF EXISTS idx_o")
    sql("CREATE TABLE idx_o (k INT) USING parquet")
    sql("INSERT INTO idx_o VALUES (1), (2)")
    sql("CREATE INDEX idx_o_k ON idx_o(k)")
    sql("INSERT OVERWRITE TABLE idx_o VALUES (9)")
    assert(spark.sql("SELECT k FROM idx_o").collect().map(_.getInt(0)).toSeq == Seq(9))
    sql("INSERT INTO `idx_o` VALUES (10)")
    assert(spark.sql("SELECT count(*) FROM idx_o").head.getLong(0) == 2)
    sql("DROP TABLE idx_o")
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
