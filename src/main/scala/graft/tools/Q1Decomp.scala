package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Det._

/** Cost ladder for tpch_q1's scan+agg stage: each step adds one ingredient,
  * so the deltas attribute the per-row cost — shipdate filter decode,
  * double-column decode, plain double aggregation, the Det long-cents
  * arithmetic, and the group keys. */
object Q1Decomp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    val spark = graft.Engine.create(master = s"local[$cpus]", shufflePartitions = cpus,
      appName = "graft-q1decomp", dataDir = Some(sfDir))

    def li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("2000-01-01 00:00:00")))

    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "a_count_only" -> (() => li.agg(count(lit(1)))),
      "b_sum1_double" -> (() => li.agg(sum(col("l_quantity")))),
      "c_sum4_double" -> (() => li.agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))))),
      "d_sum4_det" -> (() => li.agg(dsum(col("l_quantity")), dsum(col("l_extendedprice")),
        msum(col("l_extendedprice"), lit(1) - col("l_discount")),
        msum(col("l_extendedprice"), lit(1) - col("l_discount"), lit(1) + col("l_tax")))),
      "e_full_det_nogroup" -> (() => li.agg(
        dsum(col("l_quantity")), dsum(col("l_extendedprice")),
        msum(col("l_extendedprice"), lit(1) - col("l_discount")),
        msum(col("l_extendedprice"), lit(1) - col("l_discount"), lit(1) + col("l_tax")),
        davg(col("l_quantity")), davg(col("l_extendedprice")), davg(col("l_discount")),
        count(lit(1)))),
      "f_full_q1" -> (() => graft.SparkEntry.queries("tpch_q1")(spark, sfDir)))

    def time(mk: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      mk.queryExecution.toRdd.foreachPartition { it => while (it.hasNext) it.next() }
      (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    variants.foreach { case (n, mk) =>
      time(mk()) // warm
      val ts = Seq.fill(7)(time(mk()))
      println(f"[q1decomp] $n%-20s med=${med(ts)}%.3f min=${ts.min}%.3f")
    }
    spark.stop()
  }
}
