package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ssb.Ssb
import java.nio.file.{Files, Paths}

/** Dev driver for the SSB suites (both variants): result parquet +
  * oracle_sql.json in Verify's layout + the SsbSig map.
  * Usage: runMain graft.tools.SsbDev [outDir] */
object SsbDev {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/ssb_out")
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
    for (simplified <- Seq(false, true); qn <- Ssb.qnames) {
      val key = (if (simplified) "s" else "") + qn
      val label = (if (simplified) "ssb2_q" else "ssb_q") + qn
      val tq = System.nanoTime()
      try {
        val df = Ssb.run(spark, qn, simplified)
        sigs(key) = Ssb.sigOf(df)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$label")
        println(f"[ssb] $label%-10s ok   sig=${sigs(key)}%-8s ${(System.nanoTime() - tq) / 1e9}%6.2fs")
      } catch {
        case e: Throwable =>
          errors(label) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(3).mkString(" | ").take(300)
          println(s"[ssb] $label FAIL ${errors(label)}")
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
    val json = sigs.map { case (key, sig) =>
      val simplified = key.startsWith("s")
      val qn = key.stripPrefix("s")
      val label = (if (simplified) "ssb2_q" else "ssb_q") + qn
      s"${jq(label)}: ${jq(Ssb.oracleFor(qn, simplified, sig))}"
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"\n--- SsbSig entries (${sigs.size} ok, ${errors.size} failed) ---")
    sigs.foreach { case (key, sig) => println(s"""    "$key" -> "$sig",""") }
    if (errors.nonEmpty) errors.foreach { case (q, e) => println(s"  $q: $e") }
    spark.stop()
  }
}
