package graft.util

import org.apache.spark.sql.SparkSession

/** Per-table planning samples (~2k deterministic uniform rows + the true
  * row count) in the layout [[graft.plans.SampleJoinReorder]] consumes —
  * the Spark analog of the reference's stored Arrow sample blocks
  * (QueryGraph.cpp:264-294). tools.ScaleUp writes the same layout for the
  * campaign scale dirs; this helper covers the suite generators'
  * materialized tables, where Catalyst's stats cannot see the selectivity
  * of the suites' string predicates (LIKE/Contains/IN) and therefore
  * neither broadcasts nor orders the join trees correctly.
  *
  * Idempotent per (dir, table): existing samples are kept, so an already
  * materialized data dir is backfilled exactly once. Planning metadata
  * only — never query data.
  */
object PlanningSamples {
  def ensure(spark: SparkSession, dir: String, names: Seq[String]): Unit = {
    val missing = names.filterNot { n =>
      new java.io.File(s"$dir/_samples/$n.parquet").isDirectory &&
        new java.io.File(s"$dir/_samples/$n.count").isFile
    }
    if (missing.isEmpty) return
    new java.io.File(s"$dir/_samples").mkdirs()
    missing.foreach { name =>
      val df = spark.read.parquet(s"$dir/$name")
      val total = df.count()
      val frac = math.min(1.0, 2500.0 / math.max(total, 1L))
      df.sample(withReplacement = false, frac, seed = 42).limit(2000)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/_samples/$name.parquet")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/_samples/$name.count"),
        total.toString.getBytes("UTF-8"))
    }
  }
}
