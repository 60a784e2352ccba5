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

    def time(on: Boolean, name: String): Double = {
      spark.conf.set("spark.graft.planCache.enabled", on.toString)
      val t0 = System.nanoTime()
      graft.Prepared.freshRdd(SparkEntry.queries(name)(spark, sfDir))
        .foreachPartition { it => while (it.hasNext) it.next() }
      (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    names.foreach { n =>
      time(on = true, n); time(on = false, n) // warm both paths
      val pairs = Seq.fill(runs)((time(on = true, n), time(on = false, n)))
      val onT = pairs.map(_._1); val offT = pairs.map(_._2)
      println(f"[prepab] $n%-20s cached med=${med(onT)}%.3f min=${onT.min}%.3f | " +
        f"uncached med=${med(offT)}%.3f min=${offT.min}%.3f | " +
        f"saved ${med(offT) - med(onT)}%.3f s")
    }
    spark.stop()
  }
}
