package graft.tools

import graft.{Engine, SparkEntry}

/** Prints formatted physical plans for the named queries (all headline queries
  * if no args) — the working loop for shuffle/pushdown/broadcast review. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // dataDir MUST be passed: the session regime (AQE on/off, broadcast
    // threshold, shuffle width) is derived from the data layout, and a plan
    // dumped under a different regime is not the plan the bench runs.
    val spark = Engine.create(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt, dataDir = Some(sfDir))
    val names = if (args.nonEmpty) args.toSeq
      else Seq("tpch_q1", "tpch_q3", "tpch_q5", "join_inner", "dedup_minhash_lsh")
    names.foreach { n =>
      println(s"========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
