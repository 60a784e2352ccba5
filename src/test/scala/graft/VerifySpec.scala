package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 gate hardening (VERDICT r10 task #1): the driver's correctness
  * compare needs `oracle_sql.json` even when the per-query dump is
  * interrupted — so Verify writes it FIRST, before any Spark work.
  */
class VerifySpec extends AnyFunSuite {

  test("oracle_sql.json is written before any query dump (no-match filter)") {
    val out = Files.createTempDirectory("graft_verify_spec").toString
    // A filter prefix matching no query: main dumps ZERO parquet results —
    // the degenerate stand-in for "every query timed out" — yet the oracle
    // map must still land.
    Verify.main(Array("/root/testdata/sf0.001", out, "zz_no_such_query"))
    val p = Paths.get(s"$out/oracle_sql.json")
    assert(Files.exists(p), "oracle_sql.json must exist with zero queries dumped")
    val json = Files.readString(p)
    assert(json.startsWith("{") && json.endsWith("}"))
    assert(json.contains("\"tpch_q1\""), "oracle map must carry the full static query set")
    // No parquet dirs were written (filter matched nothing).
    val dumped = new java.io.File(out).listFiles().count(_.isDirectory)
    assert(dumped === 0)
  }

  test("writeOracleJson alone produces a complete parseable map") {
    val out = Files.createTempDirectory("graft_verify_spec2").toString
    Verify.writeOracleJson(out)
    val json = Files.readString(Paths.get(s"$out/oracle_sql.json"))
    // Every oracle key appears quoted; count matches SparkEntry.oracleSql.
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(json.contains("\"" + k + "\""), s"missing oracle key $k")
    }
    // Control characters must be escaped (driver json.load hard-requires it).
    assert(!json.exists(c => c < ' '), "raw control char leaked into oracle_sql.json")
  }
}
