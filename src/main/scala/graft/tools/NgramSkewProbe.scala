package graft.tools

import graft.data.Dedup
import org.apache.spark.sql.functions._

/** Data-distribution microscope for the dedup_ngram_jaccard pair-join stage
  * (PERF_r10 §9: 475 s of CPU on 8 of 32 threads at sf100). The pair join
  * hashes the capped grams by `g` into `spark.sql.shuffle.partitions`
  * reducers; SMJ CPU per gram is ~df², so the stage's per-task CPU is
  * ∝ Σ df² over the grams hashed to it. This probe prints that weight per
  * reducer bucket plus the df histogram and the heaviest grams — enough to
  * tell KEY concentration (few heavy grams) from PARTITION concentration
  * (hash imbalance) from uniform-but-wide fan-out.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.NgramSkewProbe [parts]
  */
object NgramSkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val parts = args.headOption.map(_.toInt).getOrElse(32)
    val spark = graft.Engine.create(appName = "graft-ngramskew", dataDir = Some(sfDir))
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val grams = Dedup.shingles(docs)

    // UNCAPPED df distribution: the semi-join in dfCapped shuffles the FULL
    // gram set by hash(g), so its per-task cost is ∝ Σ df over the grams in
    // that bucket (the heavy grams get filtered only AFTER the shuffle+sort).
    val dfs = grams.groupBy("g").agg(count(lit(1)).as("df"))
    dfs.persist()
    println("== uncapped df histogram (top) ==")
    dfs.groupBy(col("df")).agg(count(lit(1)).as("n_grams"),
        sum(col("df")).as("rows"))
      .orderBy(desc("df")).show(30, truncate = false)

    println(s"== per-reducer rows (semi-join stage weight): hash(g) mod $parts ==")
    dfs.groupBy((pmod(hash(col("g")), lit(parts))).as("bucket"))
      .agg(count(lit(1)).as("n_grams"), sum(col("df")).as("rows"))
      .orderBy(desc("rows")).show(parts, truncate = false)

    println("== heaviest grams ==")
    dfs.orderBy(desc("df")).show(20, truncate = false)

    println("== capped (df<=64) survivors ==")
    dfs.filter(col("df") <= Dedup.MaxShingleDf)
      .agg(count(lit(1)).as("grams"), sum("df").as("rows")).show()

    val tot = dfs.agg(count(lit(1)), sum("df"), sum(col("df"))).collect()(0)
    println(s"[probe] grams=${tot.getLong(0)} rows=${tot.getLong(1)} sum_df_again=${tot.getLong(2)}")
    spark.stop()
  }
}
