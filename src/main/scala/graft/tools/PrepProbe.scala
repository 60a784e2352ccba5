package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.execution.SparkPlan

/** A/B probe for the prepared-plan execution path: construct+plan a query
  * ONCE, then per run clone the executed plan (fresh codegen, fresh
  * exchanges, fresh broadcasts — full recompute) vs the fresh-Dataset
  * baseline the bench uses today. Prints per-run times and row counts so
  * the clone path's correctness is visible.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.PrepProbe [names...]
  */
object PrepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val names = if (args.nonEmpty) args.toSeq else Seq("tpch_q1", "tpch_q5", "tpch_q9")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    val spark = graft.Engine.create(master = s"local[$cpus]", shufflePartitions = cpus,
      appName = "graft-prepprobe", dataDir = Some(sfDir))

    def drain(rdd: org.apache.spark.rdd.RDD[_]): Long = {
      val counts = rdd.mapPartitions(it => Iterator.single(it.size.toLong)).collect()
      counts.sum
    }
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
    }

    names.filter(SparkEntry.queries.contains).foreach { name =>
      val q = SparkEntry.queries(name)
      // fresh baseline: construct + plan + execute per run
      q(spark, sfDir).queryExecution.toRdd.foreachPartition(_ => ()) // warm
      val fresh = Seq.fill(5)(time(drain(q(spark, sfDir).queryExecution.toRdd)))
      // prepared: plan once, clone + execute per run
      val planned = q(spark, sfDir).queryExecution.executedPlan
      val cloned = Seq.fill(5)(time {
        val p = planned.clone().asInstanceOf[SparkPlan]
        drain(p.execute())
      })
      val fr = fresh.map(_._1).sorted
      val cl = cloned.map(_._1).sorted
      println(f"$name%-16s fresh min=${fr.head}%.3f med=${fr(2)}%.3f rows=${fresh.head._2} | " +
        f"cloned min=${cl.head}%.3f med=${cl(2)}%.3f rows=${cloned.head._2} " +
        (if (fresh.head._2 == cloned.head._2) "ROWS-MATCH" else "ROWS-DIFFER!"))
    }
    spark.stop()
  }
}
