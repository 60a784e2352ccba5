package graft.tools
import graft.SparkEntry
object TinyCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = graft.Engine.create(appName = "tinycheck", dataDir = Some(sfDir))
    for (n <- Seq("tpch_q1", "tpch_q5", "tpch_q9", "agg_rollup", "win_running_sum")) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      val phys = df.queryExecution.executedPlan.toString
      val hasRange = phys.contains("rangepartitioning")
      println(s"$n rangepartitioning=$hasRange tinySortConf=" +
        spark.conf.get("spark.graft.tinySort") + " aqe=" + spark.conf.get("spark.sql.adaptive.enabled"))
      val sortChild = df.queryExecution.optimizedPlan.collect {
        case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s.child.stats.sizeInBytes
      }
      println(s"  sort-child-stats: ${sortChild.mkString(",")}")
    }
    spark.stop()
  }
}
