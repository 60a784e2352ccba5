package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.ExecSubqueryExpression

/** Which headline plans are Prepared-cacheable, and why not (dev probe). */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = graft.Engine.create(appName = "graft-cacheprobe", dataDir = Some(sfDir))
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q9", "tpch_q10", "tpch_q21",
      "agg_rollup", "agg_groupjoin", "win_running_sum", "dedup_exact",
      "sim_cosine_topk", "text_quality", "ev_sessions")
    names.foreach { n =>
      val p = SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan
      val why =
        if (p.isInstanceOf[AdaptiveSparkPlanExec]) "AQE"
        else {
          // mirror of Prepared.cacheable: broadcast reuse is re-wired, only
          // SHUFFLE reuse forces the fallback
          val reused = p.exists {
            case r: ReusedExchangeExec =>
              !r.child.isInstanceOf[org.apache.spark.sql.execution.exchange.BroadcastExchangeExec]
            case _ => false
          }
          val subq = p.exists(q => q.expressions.exists(_.exists(_.isInstanceOf[ExecSubqueryExpression])))
          if (reused) "ReusedExchange(shuffle)" else if (subq) "SubqueryExpr" else "CACHEABLE"
        }
      println(f"[cache] $n%-20s $why")
    }
    spark.stop()
  }
}
