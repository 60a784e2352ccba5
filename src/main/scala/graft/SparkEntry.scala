package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator (SURVEY §2 inventory) to a
  * DataFrame builder over a scale-factor directory; `oracleSql` carries the
  * DuckDB-equivalent SQL the driver hash-compares against. Column names and
  * value determinism rules are documented in [[graft.util.Det]].
  */
object SparkEntry {
  /** Flagship query (TPC-H Q1 pricing summary) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TpchLike.q1(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracle),
      (Aggregates.queries, Aggregates.oracle),
      (Windows.queries, Windows.oracle),
      (Subqueries.queries, Subqueries.oracle),
      (TpchLike.queries, TpchLike.oracle),
      (TpchExtra.queries, TpchExtra.oracle),
      (TpchFull.queries, TpchFull.oracle),
      (graft.functions.FunctionQueries.queries, graft.functions.FunctionQueries.oracle),
      (graft.data.TextAnalysis.queries, graft.data.TextAnalysis.oracle),
      (graft.data.Dedup.queries, graft.data.Dedup.oracle),
      (graft.data.Similarity.queries, graft.data.Similarity.oracle),
      (graft.data.Multimodal.queries, graft.data.Multimodal.oracle),
      (graft.data.Events.queries, graft.data.Events.oracle),
      (graft.sqlsurface.PipeSqlQueries.queries, graft.sqlsurface.PipeSqlQueries.oracle),
      (graft.streaming.Streaming.queries, graft.streaming.Streaming.oracle),
      (graft.sources.Sources.queries, graft.sources.Sources.oracle),
      (graft.tpcds.Tpcds.queries, graft.tpcds.Tpcds.oracle),
      (graft.job.Job.queries, graft.job.Job.oracle),
      (graft.ssb.Ssb.queries, graft.ssb.Ssb.oracle),
      (graft.clickbench.Clickbench.queries, graft.clickbench.Clickbench.oracle),
      (graft.tpcds.Tpcxbb.queries, graft.tpcds.Tpcxbb.oracle)
    )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
