package graft.tools

import graft.SparkEntry

/** Hot-path decomposition of a plan-cache HIT (the bench's steady state):
  * per measured run, `build` = Prepared.freshRdd (cache lookup + deep clone
  * + whole-stage codegen source generation + RDD DAG construction) and
  * `drain` = job execution. PhaseProbe decomposes the FRESH path; this one
  * shows what remains per-run once the cache amortizes the front half —
  * i.e. the ceiling of any further driver-side work (codegen-source
  * caching, clone cost) vs the true execution floor.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.HitProbe [names...]
  */
object HitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q9", "tpch_q10",
        "tpch_q21", "agg_rollup", "agg_groupjoin", "win_running_sum",
        "dedup_exact", "sim_cosine_topk", "text_quality", "ev_sessions")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    val spark = graft.Engine.create(master = s"local[$cpus]",
      shufflePartitions = cpus, appName = "graft-hitprobe", dataDir = Some(sfDir))
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    println("| query | build (clone+codegen+rdd) | drain | total |")
    println("|---|---|---|---|")
    var sb = 0.0; var sd = 0.0
    names.filter(SparkEntry.queries.contains).foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir) // PREPARE
      graft.Prepared.freshRdd(df).foreachPartition(_ => ()) // warm + prime
      val runs = Seq.fill(7) {
        val t0 = System.nanoTime()
        val rdd = graft.Prepared.freshRdd(df)
        val t1 = System.nanoTime()
        rdd.foreachPartition { it => while (it.hasNext) it.next() }
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      val b = med(runs.map(_._1)); val d = med(runs.map(_._2))
      sb += b; sd += d
      println(f"| $n | $b%.3f | $d%.3f | ${b + d}%.3f |")
    }
    println(f"| TOTAL | $sb%.3f | $sd%.3f | ${sb + sd}%.3f |")
    spark.stop()
  }
}
