package graft.tools

/** Result parity check: the CBO-reordered q72 must return the identical
  * rows the pre-stats plan wrote during the sweep. */
object Q72Check {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.create(appName = "graft-q72check")
    val old = spark.read.parquet("/tmp/tpcds_x100_out/tpcds_q72")
    val now = graft.tpcds.Tpcds.run(spark, "72")
    println(s"old=${old.count()} new=${now.count()} " +
      s"diff=${now.exceptAll(old).count()}+${old.exceptAll(now).count()}")
    spark.stop()
  }
}
