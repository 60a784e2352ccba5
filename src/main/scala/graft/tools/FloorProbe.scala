package graft.tools

import graft.SparkEntry

/** Floor decomposition for the sub-second bench queries: where does a
  * ~0.3-0.5 s query spend its time — analysis+optimization, physical
  * planning, or execution? The sub-second class (agg_rollup,
  * win_running_sum, …) is graded "weak" vs DuckDB's ~30 ms runs; this probe
  * answers whether that gap is plan-time (a fixed Spark tax no plan change
  * removes) or execution (addressable). Warmed session, 5 runs per query,
  * medians; each phase forced on the SAME QueryExecution so later stamps
  * exclude earlier work, execution via toRdd.foreachPartition (no driver
  * collect, no second QueryExecution like a write would spawn).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.FloorProbe [names...]
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("agg_rollup", "win_running_sum", "dedup_exact",
        "sim_cosine_topk", "tpch_q6")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = graft.Engine.create(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt, appName = "graft-floor")

    def stamps(n: String): (Double, Double, Double) = {
      val df = SparkEntry.queries(n)(spark, sfDir)
      val qe = df.queryExecution
      val t0 = System.nanoTime()
      qe.optimizedPlan // analysis + logical optimization
      val t1 = System.nanoTime()
      qe.executedPlan // physical planning (AQE wrapper creation)
      val t2 = System.nanoTime()
      qe.toRdd.foreachPartition(_ => ()) // execution incl. codegen + scheduling
      val t3 = System.nanoTime()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
    }

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    println("| query | analyze+optimize | physical plan | execute | total | plan share |")
    println("|---|---|---|---|---|---|")
    names.filter(SparkEntry.queries.contains).foreach { n =>
      stamps(n) // warmup: JIT, codegen cache, file footers
      val runs = Seq.fill(5)(stamps(n))
      val (a, p, e) = (med(runs.map(_._1)), med(runs.map(_._2)), med(runs.map(_._3)))
      val tot = a + p + e
      println(f"| $n | $a%.3f | $p%.3f | $e%.3f | $tot%.3f | ${(a + p) / tot * 100}%.0f%% |")
    }
    spark.stop()
  }
}
