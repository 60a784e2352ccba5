package graft.tools

import graft.SparkEntry

/** Same-session A/B of the Prepared plan cache: per query, interleaved
  * cached/uncached runs (QTime protocol, toRdd-equivalent drain), medians
  * side by side — separable from this host's leg-to-leg noise.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.PrepAB [runs=N] <names...>
  */
object PrepAB {
  def main(args: Array[String]): Unit = {
    val (opts, names0) = args.partition(_.startsWith("runs="))
    val runs = opts.headOption.map(_.stripPrefix("runs=").toInt).getOrElse(5)
    val names = if (names0.nonEmpty) names0.toSeq else Seq("tpch_q1", "tpch_q5", "tpch_q9")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    val spark = graft.Engine.create(master = s"local[$cpus]", shufflePartitions = cpus,
      appName = "graft-prepab", dataDir = Some(sfDir))

    // mode: "rdd" = full two-tier cache (round 11), "clone" = plan cache
    // with per-run clone only (round 10 behavior), "off" = fresh pipeline
    def time(mode: String, name: String): Double = {
      spark.conf.set("spark.graft.planCache.enabled", (mode != "off").toString)
      spark.conf.set("spark.graft.rddCache.enabled", (mode == "rdd").toString)
      val t0 = System.nanoTime()
      graft.Prepared.freshRdd(SparkEntry.queries(name)(spark, sfDir))
        .foreachPartition { it => while (it.hasNext) it.next() }
      (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    names.foreach { n =>
      time("rdd", n); time("clone", n); time("off", n) // warm all paths
      val triples = Seq.fill(runs)((time("rdd", n), time("clone", n), time("off", n)))
      val rddT = triples.map(_._1); val cloneT = triples.map(_._2); val offT = triples.map(_._3)
      println(f"[prepab] $n%-20s rdd med=${med(rddT)}%.3f min=${rddT.min}%.3f | " +
        f"clone med=${med(cloneT)}%.3f min=${cloneT.min}%.3f | " +
        f"uncached med=${med(offT)}%.3f min=${offT.min}%.3f | " +
        f"rdd-vs-uncached ${med(offT) - med(rddT)}%.3f s")
    }
    spark.stop()
  }
}
