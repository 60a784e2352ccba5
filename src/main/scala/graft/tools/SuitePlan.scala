package graft.tools

/** Print the optimized + physical plan of a suite query at the current
  * generator scale (plan-only; tables must already be materialized). */
object SuitePlan {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.create(appName = "graft-suiteplan",
      extraConf = Map(
        "spark.sql.files.maxPartitionBytes" -> (64L * 1024 * 1024).toString,
        "spark.sql.files.openCostInBytes" -> (4L * 1024 * 1024).toString))
    args.foreach { n =>
      val df = n match {
        case x if x.startsWith("tpcds_q") => graft.tpcds.Tpcds.run(spark, x.stripPrefix("tpcds_q"))
        case x if x.startsWith("job_q") => graft.job.Job.run(spark, x.stripPrefix("job_q"))
        case x if x.startsWith("cb_q") => graft.clickbench.Clickbench.run(spark, x.stripPrefix("cb_q"))
      }
      println(s"===== $n OPTIMIZED =====")
      println(df.queryExecution.optimizedPlan.treeString.take(8000))
      println(s"===== $n PHYSICAL =====")
      println(df.queryExecution.executedPlan.treeString.take(8000))
    }
    spark.stop()
  }
}
