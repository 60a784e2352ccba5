package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional comma-separated name-prefix filter for fast local iteration
    val only: String => Boolean =
      if (args.length > 2) { val ps = args(2).split(","); n => ps.exists(n.startsWith) }
      else _ => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Engine.create, not a vanilla session: the correctness gate must run
    // the plans the engine actually ships — extensions (Decorrelate,
    // TinySinglePartitionSort) and the data-dir-derived regime included.
    val spark = Engine.create(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt, appName = "graft-verify",
      dataDir = Some(sfDir))
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(q => only(q._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // Write an explicit error marker so the driver's compare records a
        // FAILURE (schema mismatch) for this query instead of silently
        // omitting it from the round's correctness artifact.
        try {
          import spark.implicits._
          Seq(s"ERROR ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}")
            .toDF("graft_query_error").coalesce(1)
            .write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case _: Throwable => () }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
