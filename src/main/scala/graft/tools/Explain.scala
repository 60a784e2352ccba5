package graft.tools

import graft.{Engine, SparkEntry}

/** Prints formatted physical plans for the named queries (all headline queries
  * if no args) — the working loop for shuffle/pushdown/broadcast review. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Engine.create(master = "local[4]", shufflePartitions = 4)
    val names = if (args.nonEmpty) args.toSeq
      else Seq("tpch_q1", "tpch_q3", "tpch_q5", "join_inner", "dedup_minhash_lsh")
    names.foreach { n =>
      println(s"========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
