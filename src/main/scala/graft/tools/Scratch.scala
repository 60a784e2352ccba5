package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratchpad: run ad-hoc SQL through the plain Spark analyzer or the
  * graft engine (extensions + canonicalizer) to isolate where a statement
  * fails. Usage: runMain graft.tools.Scratch <plain|engine|canon> "<sql>"...
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("engine")
    val sqls = args.drop(1).toSeq
    val spark =
      if (mode == "plain")
        SparkSession.builder().master("local[4]")
          .config("spark.sql.shuffle.partitions", "4")
          .config("spark.ui.enabled", "false").getOrCreate()
      else graft.Engine.create(master = "local[4]", shufflePartitions = 4)
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE OR REPLACE TEMP VIEW integers AS SELECT * FROM VALUES (1),(2),(3),(CAST(NULL AS INT)) t(i)")
    spark.sql("CREATE OR REPLACE TEMP VIEW strings AS SELECT * FROM VALUES ('hello'),('world'),(CAST(NULL AS STRING)) t(v)")
    sqls.foreach { raw =>
      val sql =
        if (mode == "canon") graft.sqlsurface.SqlCanonicalizer(raw) else raw
      println(s"--- [$mode] $sql")
      try spark.sql(sql).show(50, truncate = false)
      catch { case e: Throwable =>
        println(s"ERR: ${Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.take(4).mkString(" | ")}")
      }
    }
    spark.stop()
  }
}
