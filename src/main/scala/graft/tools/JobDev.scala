package graft.tools

import org.apache.spark.sql.SparkSession
import graft.job.Job
import java.nio.file.{Files, Paths}

/** Dev driver for the JOB suite: runs every query, writes result parquet +
  * oracle_sql.json in Verify's layout (so tools/oracle_check.py can gate it
  * locally), and prints the signature map for JobSig.scala.
  *
  * Usage: runMain graft.tools.JobDev [outDir] [onlyQ1,Q2,...]
  */
object JobDev {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/job_out")
    val only: Set[String] =
      if (args.length > 1) args(1).split(",").toSet else Set.empty
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val sigs = scala.collection.mutable.LinkedHashMap[String, String]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val t0 = System.nanoTime()
    for (qn <- Job.qnames if only.isEmpty || only(qn)) {
      val tq = System.nanoTime()
      try {
        val df = Job.run(spark, qn)
        sigs(qn) = Job.sigOf(df)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/job_q$qn")
        println(f"[job] q$qn%-4s ok   sig=${sigs(qn)}%-8s ${(System.nanoTime() - tq) / 1e9}%6.2fs")
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(3).mkString(" | ").take(300)
          errors(qn) = msg
          println(f"[job] q$qn%-4s FAIL $msg")
      }
    }
    def jq(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '\r' => "\\r"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = sigs.map { case (qn, sig) =>
      s"${jq(s"job_q$qn")}: ${jq(Job.oracleFor(qn, sig))}"
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"\n--- JobSig entries (${sigs.size} ok, ${errors.size} failed, " +
      f"${(System.nanoTime() - t0) / 1e9}%.1fs total) ---")
    sigs.foreach { case (qn, sig) => println(s"""    "$qn" -> "$sig",""") }
    if (errors.nonEmpty) {
      println("--- failures ---")
      errors.foreach { case (qn, e) => println(s"  q$qn: $e") }
    }
    spark.stop()
  }
}
