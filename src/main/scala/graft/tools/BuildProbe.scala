package graft.tools

import graft.SparkEntry

/** Splits a bench query's wall time into (a) DataFrame CONSTRUCTION —
  * spark.read.parquet file listing + footer schema inference per referenced
  * table, paid on every `queries(name)(spark, dir)` call — vs (b) noop-write
  * execution of a pre-built DataFrame, vs (c) re-executing the SAME
  * DataFrame object (plan/codegen caches warm). Isolates how much of the
  * small-SF per-query floor is harness-side plan re-construction rather
  * than execution.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.BuildProbe [names...]
  */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("tpch_q1", "tpch_q5", "tpch_q9", "agg_rollup", "tpch_q6")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    val spark = graft.Engine.create(master = s"local[$cpus]",
      shufflePartitions = cpus, appName = "graft-buildprobe", dataDir = Some(sfDir))
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println("| query | construct | noop-write(fresh df) | noop-write(same df) | toRdd(same df) |")
    println("|---|---|---|---|---|")
    names.filter(SparkEntry.queries.contains).foreach { n =>
      val q = SparkEntry.queries(n)
      // warmup
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      val built = q(spark, sfDir)
      built.write.format("noop").mode("overwrite").save()
      val cons = Seq.fill(5)(t { q(spark, sfDir) })
      val fresh = Seq.fill(5)(t {
        q(spark, sfDir).write.format("noop").mode("overwrite").save() })
      val same = Seq.fill(5)(t {
        built.write.format("noop").mode("overwrite").save() })
      val rdd = Seq.fill(5)(t { built.queryExecution.toRdd.foreachPartition(_ => ()) })
      println(f"| $n | ${med(cons)}%.3f | ${med(fresh)}%.3f | ${med(same)}%.3f | ${med(rdd)}%.3f |")
    }
    spark.stop()
  }
}
