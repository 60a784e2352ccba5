package graft.tools

import graft.SparkEntry

/** Generic per-query timer (dev-only): median of N noop-write runs per
  * named contract query, after one warmup. Honors GRAFT_SPARK_EXTRA for
  * config A/B (e.g. bloom-filter join on/off).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.QTime [runs=N] <name>...
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val (opts, names) = args.partition(_.startsWith("runs="))
    val runs = opts.headOption.map(_.stripPrefix("runs=").toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    val spark = graft.Engine.create(master = s"local[$cpus]",
      shufflePartitions = cpus, appName = "graft-qtime", dataDir = Some(sfDir))
    // Same execution path as Bench: Dataset constructed ONCE per query
    // (PREPARE, unmeasured), each run EXECUTEs through the plan cache
    // (graft.Prepared — cloned plan, full recompute), every partition
    // iterator drained (see Bench.once).
    def time(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      graft.Prepared.freshRdd(df).foreachPartition { it =>
        while (it.hasNext) it.next()
      }
      (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    names.toSeq.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir) // PREPARE (unmeasured)
      time(df) // warmup
      // GC after every run (outside the clock), same reason as Bench: shuffle
      // files live until the driver GCs their ShuffleDependency; at sf100 a
      // shingle query spills >10 GB per execution and two retained runs
      // exhausted the disk (this host's fs reserves ~60% — ~53 GB usable).
      System.gc()
      val ts = Seq.fill(runs) { val r = time(df); System.gc(); r }
      println(f"[qtime] $n%-24s median ${med(ts)}%.2f s  runs ${ts.map(x => f"$x%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
