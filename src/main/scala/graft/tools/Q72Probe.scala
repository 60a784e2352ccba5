package graft.tools

/** q72 experiment: does CBO join reorder with ANALYZE'd catalog tables fix
  * the item-only catalog_sales x inventory blowup? */
object Q72Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.create(appName = "graft-q72probe",
      extraConf = Map(
        "spark.sql.files.maxPartitionBytes" -> (64L * 1024 * 1024).toString,
        "spark.sql.statistics.histogram.enabled" -> "true"))
    val dataDir = s"${sys.props("java.io.tmpdir")}/graft_tpcds_data_x100"
    val tables = Seq("catalog_sales", "inventory", "warehouse", "item",
      "customer_demographics", "household_demographics", "date_dim",
      "promotion", "catalog_returns")
    val t0 = System.nanoTime()
    tables.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS tpcds_$t")
      val schema = spark.read.parquet(s"$dataDir/$t").schema.toDDL
      spark.sql(s"CREATE TABLE tpcds_$t ($schema) USING parquet LOCATION '$dataDir/$t'")
      spark.sql(s"ANALYZE TABLE tpcds_$t COMPUTE STATISTICS")
    }
    // column stats on the join/filter keys of q72
    spark.sql("ANALYZE TABLE tpcds_catalog_sales COMPUTE STATISTICS FOR COLUMNS cs_item_sk, cs_sold_date_sk, cs_bill_cdemo_sk, cs_bill_hdemo_sk, cs_quantity")
    spark.sql("ANALYZE TABLE tpcds_inventory COMPUTE STATISTICS FOR COLUMNS inv_item_sk, inv_date_sk, inv_quantity_on_hand")
    spark.sql("ANALYZE TABLE tpcds_date_dim COMPUTE STATISTICS FOR COLUMNS d_date_sk, d_week_seq, d_year")
    spark.sql("ANALYZE TABLE tpcds_customer_demographics COMPUTE STATISTICS FOR COLUMNS cd_demo_sk, cd_marital_status")
    spark.sql("ANALYZE TABLE tpcds_household_demographics COMPUTE STATISTICS FOR COLUMNS hd_demo_sk, hd_buy_potential")
    println(f"[q72] analyze took ${(System.nanoTime()-t0)/1e9}%.1f s")
    val sql = graft.tpcds.Tpcds.loadQuery("72")
    val sparkSql = graft.tpcds.Tpcds.sparkSql(sql)
    val df = spark.sql(sparkSql)
    println(df.queryExecution.optimizedPlan.treeString.split("\n")
      .filter(l => l.contains("Join") || l.contains("Relation [cs_") || l.contains("Relation [inv_")).mkString("\n").take(4000))
    val t1 = System.nanoTime()
    df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
    println(f"[q72] exec ${(System.nanoTime()-t1)/1e9}%.1f s with stats+CBO")
    spark.stop()
  }
}
