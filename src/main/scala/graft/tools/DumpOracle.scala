package graft.tools

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Dev tool: dump SparkEntry.oracleSql to a JSON file WITHOUT starting a
  * Spark session (the oracle map is pure strings). Used by
  * tools/count_rows.py to iterate on generator seed changes against DuckDB
  * alone — the closed-form generators render identically in both engines, so
  * DuckDB row counts predict the Spark side exactly.
  * Usage: runMain graft.tools.DumpOracle [outFile]
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_sql.json")
    def jq(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => s"  ${jq(k)}: ${jq(v)}" }
      .mkString("{\n", ",\n", "\n}\n")
    Files.write(Paths.get(out), json.getBytes(StandardCharsets.UTF_8))
    println(s"[dump] ${graft.SparkEntry.oracleSql.size} oracle entries -> $out")
  }
}
