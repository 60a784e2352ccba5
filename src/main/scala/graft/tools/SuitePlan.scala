package graft.tools

/** Print the optimized + physical plan of a suite query at the current
  * generator scale (plan-only; tables must already be materialized).
  * With `exec` as the first arg, each query is executed (1 warmup + 1
  * measured) and the AQE-FINAL plan is printed with per-operator SQL
  * metrics — the only way to see where runtime goes without a UI. */
object SuitePlan {
  def main(args: Array[String]): Unit = {
    val exec = args.headOption.contains("exec")
    val names = if (exec) args.drop(1).toSeq else args.toSeq
    val spark = graft.Engine.create(appName = "graft-suiteplan",
      extraConf = Map(
        "spark.sql.files.maxPartitionBytes" -> (64L * 1024 * 1024).toString,
        "spark.sql.files.openCostInBytes" -> (4L * 1024 * 1024).toString))
    def build(n: String) = n match {
      case x if x.startsWith("tpcds_q") => graft.tpcds.Tpcds.run(spark, x.stripPrefix("tpcds_q"))
      case x if x.startsWith("tpcxbb_q") => graft.tpcds.Tpcxbb.run(spark, x.stripPrefix("tpcxbb_q"))
      case x if x.startsWith("job_q") => graft.job.Job.run(spark, x.stripPrefix("job_q"))
      case x if x.startsWith("cb_q") => graft.clickbench.Clickbench.run(spark, x.stripPrefix("cb_q"))
    }
    names.foreach { n =>
      if (exec) {
        build(n).queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next()) // warmup
        val qe = build(n).queryExecution
        val t0 = System.nanoTime()
        qe.toRdd.foreachPartition(it => while (it.hasNext) it.next())
        println(f"===== $n FINAL (exec wall ${(System.nanoTime() - t0) / 1e9}%.3f s) =====")
        // executedPlan after execution resolves AQE's final stages; metrics
        // are live SQLMetric values from the measured run
        def dump(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
          val ms = p.metrics.collect {
            case (k, m) if m.value > 0 => s"$k=${m.value}"
          }.mkString(" ")
          println(("  " * depth) + p.nodeName + (if (ms.nonEmpty) s"  [$ms]" else ""))
          val kids = p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
            case r: org.apache.spark.sql.execution.ReusedSubqueryExec => Seq(r.child)
            case other => other.children
          }
          kids.foreach(dump(_, depth + 1))
          p.subqueries.foreach { sq => println(("  " * (depth + 1)) + "SUBQUERY:"); dump(sq, depth + 2) }
        }
        dump(qe.executedPlan, 0)
      } else {
        val df = build(n)
        println(s"===== $n OPTIMIZED =====")
        println(df.queryExecution.optimizedPlan.treeString.take(8000))
        println(s"===== $n PHYSICAL (formatted) =====")
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }
}
