package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Det._

/** A/B: tpch_q1 grouped by the two 1-char STRING keys (current shape) vs a
  * packed single-int key (ascii(flag)<<8 | ascii(status)) decoded back to
  * chars after the 6-group aggregate. Isolates the per-row string-key
  * hash/copy cost in HashAggregate. */
object Q1KeyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    val spark = graft.Engine.create(master = s"local[$cpus]", shufflePartitions = cpus,
      appName = "graft-q1key", dataDir = Some(sfDir))

    def aggs = Seq(
      dsum(col("l_quantity")).as("sum_qty"),
      dsum(col("l_extendedprice")).as("sum_base_price"),
      msum(col("l_extendedprice"), lit(1) - col("l_discount")).as("sum_disc_price"),
      msum(col("l_extendedprice"), lit(1) - col("l_discount"), lit(1) + col("l_tax"))
        .as("sum_charge"),
      davg(col("l_quantity")).as("avg_qty"),
      davg(col("l_extendedprice")).as("avg_price"),
      davg(col("l_discount")).as("avg_disc"),
      count(lit(1)).as("count_order"))

    def strKeys = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("2000-01-01 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("l_returnflag", "l_linestatus")

    def intKey = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("2000-01-01 00:00:00")))
      .groupBy((ascii(col("l_returnflag")) * 256 + ascii(col("l_linestatus"))).as("k"))
      .agg(aggs.head, aggs.tail: _*)
      .select(char(col("k") / 256).as("l_returnflag"), char(col("k") % 256).as("l_linestatus"),
        col("sum_qty"), col("sum_base_price"), col("sum_disc_price"), col("sum_charge"),
        col("avg_qty"), col("avg_price"), col("avg_disc"), col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

    def time(mk: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      mk.queryExecution.toRdd.foreachPartition { it => while (it.hasNext) it.next() }
      (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    // results must be identical
    val a = strKeys.collect().map(_.toString).toSeq
    val b = intKey.collect().map(_.toString).toSeq
    println(s"[q1key] ROWS ${if (a == b) "MATCH" else s"DIFFER:\n${a.mkString("\n")}\n---\n${b.mkString("\n")}"}")

    time(strKeys); time(intKey) // warm
    val pairs = Seq.fill(7)((time(strKeys), time(intKey)))
    println(f"[q1key] strings med=${med(pairs.map(_._1))}%.3f min=${pairs.map(_._1).min}%.3f | " +
      f"intkey med=${med(pairs.map(_._2))}%.3f min=${pairs.map(_._2).min}%.3f")
    spark.stop()
  }
}
