package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A/B probe for TPC-H Q1 aggregation strategies at a given SF dir.
  * Dev tool: quantifies what the determinism-preserving decimal casts cost
  * and which decimal widths stay on Spark's compact-long fast path.
  */
object Q1Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_shipdate") <= to_timestamp(lit("2000-01-01 00:00:00")))

    def run(name: String)(aggs: Seq[org.apache.spark.sql.Column]): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(aggs.head, aggs.tail: _*)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val m = Seq.fill(3)(once()).sorted.apply(1)
      println(f"[q1probe] $name%-28s $m%6.2fs")
    }

    def d(p: Int, s: Int)(c: org.apache.spark.sql.Column) = c.cast(DecimalType(p, s))

    run("plain double")(Seq(
      sum(col("l_quantity")).as("a"), sum(col("l_extendedprice")).as("b"),
      sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("c"),
      sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("dd"),
      avg(col("l_quantity")).as("e"), avg(col("l_extendedprice")).as("f"),
      avg(col("l_discount")).as("g"), count(lit(1)).as("h")))

    run("decimal18 (current)")(Seq(
      sum(d(18, 2)(col("l_quantity"))).as("a"), sum(d(18, 2)(col("l_extendedprice"))).as("b"),
      sum(d(12, 2)(col("l_extendedprice")) * d(12, 2)(lit(1) - col("l_discount"))).as("c"),
      sum(d(12, 2)(col("l_extendedprice")) * d(12, 2)(lit(1) - col("l_discount")) * d(12, 2)(lit(1) + col("l_tax"))).as("dd"),
      (sum(d(18, 2)(col("l_quantity"))) / count(col("l_quantity"))).as("e"),
      (sum(d(18, 2)(col("l_extendedprice"))) / count(lit(1))).as("f"),
      (sum(d(18, 2)(col("l_discount"))) / count(lit(1))).as("g"), count(lit(1)).as("h")))

    run("decimal8 compact")(Seq(
      sum(d(8, 2)(col("l_quantity"))).as("a"), sum(d(8, 2)(col("l_extendedprice"))).as("b"),
      sum(d(8, 2)(col("l_extendedprice")) * d(4, 2)(lit(1) - col("l_discount"))).as("c"),
      sum(d(8, 2)(col("l_extendedprice")) * d(4, 2)(lit(1) - col("l_discount")) * d(4, 2)(lit(1) + col("l_tax"))).as("dd"),
      (sum(d(8, 2)(col("l_quantity"))) / count(col("l_quantity"))).as("e"),
      (sum(d(8, 2)(col("l_extendedprice"))) / count(lit(1))).as("f"),
      (sum(d(8, 2)(col("l_discount"))) / count(lit(1))).as("g"), count(lit(1)).as("h")))

    // product kept exact at (18,6) on the compact path, then summed as two
    // compact sums: integer dollars (18,0 buffer) + fractional part (18,6)
    def splitSum(prod: org.apache.spark.sql.Column) = {
      val p = d(18, 6)(prod)
      val hi = floor(p)
      (sum(d(8, 0)(hi)).cast(DecimalType(38, 6)) + sum(d(8, 6)(p - hi)))
    }
    val prod2 = d(8, 2)(col("l_extendedprice")) * d(4, 2)(lit(1) - col("l_discount"))
    val prod3 = prod2 * d(4, 2)(lit(1) + col("l_tax"))
    run("decimal8 split-sum")(Seq(
      sum(d(8, 2)(col("l_quantity"))).as("a"), sum(d(8, 2)(col("l_extendedprice"))).as("b"),
      splitSum(prod2).as("c"), splitSum(prod3).as("dd"),
      (sum(d(8, 2)(col("l_quantity"))) / count(col("l_quantity"))).as("e"),
      (sum(d(8, 2)(col("l_extendedprice"))) / count(lit(1))).as("f"),
      (sum(d(8, 2)(col("l_discount"))) / count(lit(1))).as("g"), count(lit(1)).as("h")))

    // bound: exact integer-cents longs (round(x*100)), pure long sums
    def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast(LongType)
    val p2c = cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount"))
    run("long cents")(Seq(
      sum(cents(col("l_quantity"))).as("a"), sum(cents(col("l_extendedprice"))).as("b"),
      sum(p2c).as("c"), sum(p2c * cents(lit(1) + col("l_tax"))).as("dd"),
      avg(cents(col("l_quantity"))).as("e"), avg(cents(col("l_extendedprice"))).as("f"),
      avg(cents(col("l_discount"))).as("g"), count(lit(1)).as("h")))

    spark.stop()
  }
}
