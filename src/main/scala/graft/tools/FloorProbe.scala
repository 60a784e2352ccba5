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
      Runtime.getRuntime.availableProcessors.toString).toInt
    val spark = graft.Engine.create(master = s"local[$cpus]",
      shufflePartitions = cpus, appName = "graft-floor", dataDir = Some(sfDir))

    // task-level metrics: split execution wall time into parallel compute
    // (Σ executorRunTime / cores = the ideal wall clock) vs everything else
    // (task launch, scheduler delay, stage barriers, AQE re-planning)
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val runMs = new java.util.concurrent.atomic.AtomicLong
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        Option(t.taskMetrics).foreach(m => runMs.addAndGet(m.executorRunTime))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    })

    def stamps(n: String): (Double, Double, Double, Int, Int, Double) = {
      val df = SparkEntry.queries(n)(spark, sfDir)
      val qe = df.queryExecution
      val t0 = System.nanoTime()
      qe.optimizedPlan // analysis + logical optimization
      val t1 = System.nanoTime()
      qe.executedPlan // physical planning (AQE wrapper creation)
      val t2 = System.nanoTime()
      tasks.set(0); stages.set(0); runMs.set(0)
      // execution incl. codegen + scheduling; the while-loop drains each
      // iterator — a no-op lambda would skip the FINAL stage's actual work
      // (shuffle-map stages force compute, the result stage is lazy)
      qe.toRdd.foreachPartition(it => while (it.hasNext) it.next())
      val t3 = System.nanoTime()
      Thread.sleep(300) // listener bus drain (async events)
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9,
        stages.get, tasks.get, runMs.get / 1e3)
    }

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    println("| query | analyze+optimize | physical plan | execute | stages | tasks | Σtask-compute | ideal exec (Σ/cores) | overhead |")
    println("|---|---|---|---|---|---|---|---|---|")
    names.filter(SparkEntry.queries.contains).foreach { n =>
      stamps(n) // warmup: JIT, codegen cache, file footers
      val runs = Seq.fill(5)(stamps(n))
      val (a, p, e) = (med(runs.map(_._1)), med(runs.map(_._2)), med(runs.map(_._3)))
      val (st, tk) = (runs.map(_._4).max, runs.map(_._5).max)
      val cpuS = med(runs.map(_._6))
      val ideal = cpuS / cpus
      println(f"| $n | $a%.3f | $p%.3f | $e%.3f | $st | $tk | $cpuS%.2f s | $ideal%.3f | ${math.max(0, e - ideal)}%.3f |")
    }
    spark.stop()
  }
}
