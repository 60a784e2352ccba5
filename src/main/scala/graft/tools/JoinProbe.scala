package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Det._

/** Dev probe: time q10's pipeline stages separately to localize the cost —
  * scan+filter each side, bucketed SMJ, SMJ+aggregate. */
object JoinProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val spark = graft.Engine.create(appName = "graft-joinprobe")

    // materialize through noop (like Bench) so column pruning can't drop
    // the aggregates a `.count()` would discard; 5 runs, median
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      def once: Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once // warm
      val med = Seq.fill(5)(once).sorted.apply(2)
      println(f"[probe] $name%-28s ${med}%7.3f s")
    }

    val ord = Tables.load(spark, d, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.load(spark, d, "lineitem").filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))

    time("orders scan+filter") { ord }
    time("lineitem scan+filter") { li }
    val j = ord.join(li, col("o_orderkey") === col("l_orderkey"))
    time("bucketed SMJ count") { j }
    time("SMJ+agg custkey") {
      j.groupBy(col("o_custkey"))
        .agg(msum(col("l_extendedprice"), lit(1) - col("l_discount")).as("revenue"))
    }
    time("SMJ+agg count-only") { j.groupBy(col("o_custkey")).count() }
    time("SMJ+agg plain-double-sum") {
      j.groupBy(col("o_custkey"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("r"))
    }
    time("SMJ+agg msum-no-decimal") {
      val cents = (col("l_extendedprice") * 100 + lit(0.5)).cast("long") *
        ((lit(1) - col("l_discount")) * 100 + lit(0.5)).cast("long")
      j.groupBy(col("o_custkey")).agg(sum(cents).as("r"))
    }
    val rev = j.groupBy(col("o_custkey"))
      .agg(msum(col("l_extendedprice"), lit(1) - col("l_discount")).as("revenue"))
    val cust = Tables.load(spark, d, "customer")
    time("customer scan") { cust }
    time("+customer join") { cust.join(rev.hint("shuffle_hash"), col("c_custkey") === col("o_custkey")) }
    val withNation = cust.join(rev.hint("shuffle_hash"), col("c_custkey") === col("o_custkey"))
      .join(broadcast(Tables.load(spark, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("revenue"))
    time("+nation join") { withNation }
    time("+topk (full q10)") { withNation.orderBy(col("revenue").desc, col("c_custkey")).limit(20) }

    // same join, forced shuffle (non-bucketed source files) for comparison
    val ordP = spark.read.parquet(s"$d/orders.parquet")
      .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      .select(col("o_orderkey"), col("o_custkey"))
    val liP = spark.read.parquet(s"$d/lineitem.parquet")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    time("plain shuffle join count") {
      ordP.join(liP, col("o_orderkey") === col("l_orderkey"))
    }
    spark.stop()
  }
}
