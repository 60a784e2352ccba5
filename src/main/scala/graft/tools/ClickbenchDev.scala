package graft.tools

import org.apache.spark.sql.SparkSession
import graft.clickbench.Clickbench
import java.nio.file.{Files, Paths}

/** Dev driver for ClickBench: result parquet + oracle_sql.json in Verify's
  * layout + the ClickbenchSig map.
  * Usage: runMain graft.tools.ClickbenchDev [outDir] [onlyQ,...] */
object ClickbenchDev {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/cb_out")
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
    for (qn <- Clickbench.qnames if only.isEmpty || only(qn)) {
      val tq = System.nanoTime()
      try {
        val df = Clickbench.run(spark, qn)
        sigs(qn) = Clickbench.sigOf(df)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/cb_q$qn")
        println(f"[cb] q$qn%-4s ok   ${(System.nanoTime() - tq) / 1e9}%6.2fs")
      } catch {
        case e: Throwable =>
          errors(qn) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(3).mkString(" | ").take(300)
          println(s"[cb] q$qn FAIL ${errors(qn)}")
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
      s"${jq(s"cb_q$qn")}: ${jq(Clickbench.oracleFor(qn, sig))}"
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"\n--- ClickbenchSig entries (${sigs.size} ok, ${errors.size} failed) ---")
    sigs.foreach { case (qn, sig) => println(s"""    "$qn" -> "$sig",""") }
    if (errors.nonEmpty) errors.foreach { case (q, e) => println(s"  q$q: $e") }
    spark.stop()
  }
}
