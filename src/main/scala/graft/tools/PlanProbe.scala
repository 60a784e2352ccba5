package graft.tools

import graft.SparkEntry

/** Dev probe: execute a query and print its FINAL adaptive plan, where AQE
  * stage reuse (ReusedExchange/table-cache hits) is actually visible —
  * `.explain` before execution shows the pre-AQE skeleton only.
  * Usage: runMain graft.tools.PlanProbe <queryName>...
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.Engine.create(master = "local[8]", shufflePartitions = 8)
    args.toSeq.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.collect() // drives df's OWN QueryExecution (write.save would spawn a fresh one)
      val plan = df.queryExecution.executedPlan.toString
      println(s"========== $n (final adaptive plan) ==========")
      println(plan)
      def count(s: String) = plan.sliding(s.length).count(_ == s)
      println(s"[probe] $n reused_exchanges=${count("ReusedExchange")} " +
        s"reused_stages=${count("ReusedQueryStage")} scans=${count("Scan parquet")}")
    }
    spark.stop()
  }
}
