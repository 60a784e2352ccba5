package graft.tools

import graft.SparkEntry

/** Per-phase latency of a FRESH query: Dataset construction (includes
  * analysis — Dataset eagerly resolves), optimization, physical planning,
  * toRdd (whole-stage codegen source + compile-cache lookup + RDD DAG),
  * and execution drain. QTime measures construct+toRdd+drain as one number;
  * this splits the driver-side share so optimizer/codegen cost is visible.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.PhaseProbe [names...]
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("tpch_q1", "tpch_q5", "tpch_q9", "agg_rollup", "ev_sessions")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    val spark = graft.Engine.create(master = s"local[$cpus]",
      shufflePartitions = cpus, appName = "graft-phaseprobe", dataDir = Some(sfDir))
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def t(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println("| query | construct+analyze | optimize | physical | toRdd | drain | total |")
    println("|---|---|---|---|---|---|---|")
    names.filter(SparkEntry.queries.contains).foreach { n =>
      val q = SparkEntry.queries(n)
      // warmup (fills codegen + table caches)
      q(spark, sfDir).queryExecution.toRdd.foreachPartition(_ => ())
      val phases = Seq.fill(7) {
        val tc = t { q(spark, sfDir) }
        val df = q(spark, sfDir)
        val to = t { df.queryExecution.optimizedPlan }
        val tp = t { df.queryExecution.executedPlan }
        val tr = t { df.queryExecution.toRdd }
        val te = t { df.queryExecution.toRdd.foreachPartition(_ => ()) }
        (tc, to, tp, tr, te)
      }
      val c = med(phases.map(_._1)); val o = med(phases.map(_._2))
      val p = med(phases.map(_._3)); val r = med(phases.map(_._4))
      val e = med(phases.map(_._5))
      println(f"| $n | $c%.3f | $o%.3f | $p%.3f | $r%.3f | $e%.3f | ${c + o + p + r + e}%.3f |")
    }
    spark.stop()
  }
}
