package graft.tools

/** Raw task-launch throughput of the local scheduler: a trivial N-task job
  * with no I/O isolates per-task launch latency from query work. If a
  * 32-task no-op job takes ~200 ms wall, the small-SF scan-stage cost is
  * scheduler stagger, not parquet decode.
  */
object LaunchProbe {
  def main(args: Array[String]): Unit = {
    val cpus = Runtime.getRuntime.availableProcessors
    val spark = graft.Engine.create(master = s"local[$cpus]",
      shufflePartitions = cpus, appName = "graft-launchprobe")
    val sc = spark.sparkContext
    def job(n: Int): Double = {
      val t0 = System.nanoTime()
      sc.parallelize(1 to n, n).map(identity).count()
      (System.nanoTime() - t0) / 1e9
    }
    def jobBusy(n: Int, ms: Int): Double = {
      val t0 = System.nanoTime()
      sc.parallelize(1 to n, n).map { i =>
        val e = System.nanoTime() + ms * 1000000L
        var x = 0L; while (System.nanoTime() < e) x += 1; x
      }.count()
      (System.nanoTime() - t0) / 1e9
    }
    job(32); job(32) // warmup
    for (n <- Seq(1, 8, 21, 32, 64)) {
      val ts = Seq.fill(5)(job(n)).sorted
      println(f"noop  n=$n%-3d median ${ts(2)}%.3f s")
    }
    for (n <- Seq(21, 32)) {
      val ts = Seq.fill(5)(jobBusy(n, 30)).sorted
      println(f"busy30ms n=$n%-3d median ${ts(2)}%.3f s (ideal 0.030)")
    }
    spark.stop()
  }
}
