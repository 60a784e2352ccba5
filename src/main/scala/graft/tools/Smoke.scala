package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-shaped smoke check: builds the flagship query on sf0.001 and prints
  * its row count (the driver's t1 gate is rows > 0). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"ENTRY_ROWS=$n")
    println("SQL_FN_CHECK=" + spark.sql(
      "SELECT erf(1.0) AS e, rolling_hash('abc') AS h").collect().head)
    spark.stop()
  }
}
