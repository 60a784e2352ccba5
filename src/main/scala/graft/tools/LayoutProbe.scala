package graft.tools

import org.apache.spark.sql.functions._
import graft.util.Det._

/** A/B: tpch_q1 over the bucketed lineitem layout (unsplittable: one task
  * per bucket file) vs the plain range-clustered layout (32 MB row groups,
  * size-based splits). q1 never touches the bucket key, so the bucketed
  * read buys nothing — this measures what it costs. */
object LayoutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    val spark = graft.Engine.create(master = s"local[$cpus]", shufflePartitions = cpus,
      appName = "graft-layout", dataDir = Some(sfDir))

    def q1over(li: org.apache.spark.sql.DataFrame) = li
      .filter(col("l_shipdate") <= to_timestamp(lit("2000-01-01 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        msum(col("l_extendedprice"), lit(1) - col("l_discount")).as("sum_disc_price"),
        msum(col("l_extendedprice"), lit(1) - col("l_discount"), lit(1) + col("l_tax")).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

    def time(mk: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      mk.queryExecution.toRdd.foreachPartition { it => while (it.hasNext) it.next() }
      (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    def bucketed = q1over(graft.Tables.load(spark, sfDir, "lineitem"))
    def plain = q1over(spark.read.parquet(s"$sfDir/lineitem.parquet"))

    time(bucketed); time(plain) // warm
    val runs = sys.env.get("LAYOUT_RUNS").map(_.toInt).getOrElse(3)
    val pairs = Seq.fill(runs)((time(bucketed), time(plain)))
    println(f"[layout] q1 bucketed med=${med(pairs.map(_._1))}%.3f min=${pairs.map(_._1).min}%.3f | " +
      f"plain med=${med(pairs.map(_._2))}%.3f min=${pairs.map(_._2).min}%.3f")
    spark.stop()
  }
}
