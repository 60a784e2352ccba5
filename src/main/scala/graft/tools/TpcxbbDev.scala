package graft.tools

import org.apache.spark.sql.SparkSession
import graft.tpcds.Tpcxbb
import java.nio.file.{Files, Paths}

/** Dev driver for TPCx-BB: result parquet + oracle_sql.json + sig map.
  * Usage: runMain graft.tools.TpcxbbDev [outDir] [onlyQ,...] */
object TpcxbbDev {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/tpcxbb_out")
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
    for (qn <- Tpcxbb.qnames if only.isEmpty || only(qn)) {
      val tq = System.nanoTime()
      try {
        val df = Tpcxbb.run(spark, qn)
        sigs(qn) = Tpcxbb.sigOf(df)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/tpcxbb_q$qn")
        println(f"[bb] q$qn%-4s ok   sig=${sigs(qn)}%-10s ${(System.nanoTime() - tq) / 1e9}%6.2fs")
      } catch {
        case e: Throwable =>
          errors(qn) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(3).mkString(" | ").take(300)
          println(s"[bb] q$qn FAIL ${errors(qn)}")
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
      s"${jq(s"tpcxbb_q$qn")}: ${jq(Tpcxbb.oracleFor(qn, sig))}"
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"\n--- TpcxbbSig entries (${sigs.size} ok, ${errors.size} failed) ---")
    sigs.foreach { case (qn, sig) => println(s"""    "$qn" -> "$sig",""") }
    if (errors.nonEmpty) errors.foreach { case (q, e) => println(s"  q$q: $e") }
    spark.stop()
  }
}
