package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** A/B probe for tpch_q21 formulations (dev-only).
  *
  * current — two bucketed lineitem scans: ordStats aggregate + R-filtered
  *           branch joined back (the round-6 shape).
  * fused   — ONE lineitem scan: the per-order aggregate also counts the R
  *           rows; since a qualifying order has EXACTLY one distinct late
  *           supplier (rsk_mn = rsk_mx), every R row belongs to rsk_mn, so
  *           numwait = sum(r_count) grouped by that supplier — no second
  *           fact scan, no fact-side join at all.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.Q21Probe [runs]
  */
object Q21Probe {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  def fused(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    val stats = li
      .groupBy(col("l_orderkey").as("os_ok"))
      .agg(min(col("l_suppkey")).as("sk_mn"), max(col("l_suppkey")).as("sk_mx"),
        min(when(col("l_returnflag") === "R", col("l_suppkey"))).as("rsk_mn"),
        max(when(col("l_returnflag") === "R", col("l_suppkey"))).as("rsk_mx"),
        count(when(col("l_returnflag") === "R", lit(1))).as("rn"))
      .filter(col("sk_mn") =!= col("sk_mx") && col("rsk_mn") === col("rsk_mx"))
    stats
      .join(t(s, d, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey")),
        col("os_ok") === col("o_orderkey"))
      .join(broadcast(t(s, d, "supplier")
          .join(t(s, d, "nation").filter(col("n_name") === "NATION_3"),
            col("s_nationkey") === col("n_nationkey"))),
        col("s_suppkey") === col("rsk_mn"))
      .groupBy(col("s_name"))
      .agg(sum(col("rn")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val runs = args.headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    val spark = graft.Engine.create(master = s"local[$cpus]",
      shufflePartitions = cpus, appName = "graft-q21", dataDir = Some(sfDir))

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    // cross-check results first
    val a = graft.SparkEntry.queries("tpch_q21")(spark, sfDir).collect()
    val b = fused(spark, sfDir).collect()
    val same = a.map(_.toString).toSeq == b.map(_.toString).toSeq
    println(s"[q21] results match: $same (${a.length} rows)")
    if (!same) {
      a.take(5).foreach(r => println(s"  A $r")); b.take(5).foreach(r => println(s"  B $r"))
      sys.exit(1)
    }
    for ((name, mk) <- Seq(
        "current" -> (() => graft.SparkEntry.queries("tpch_q21")(spark, sfDir)),
        "fused" -> (() => fused(spark, sfDir)))) {
      time(mk()) // warmup
      val ts = Seq.fill(runs)(time(mk()))
      println(f"[q21] $name%-8s median ${med(ts)}%.2f s  runs ${ts.map(x => f"$x%.2f").mkString(" ")}")
    }
  }
}
