package graft

import java.io.File

/** The reference's own TPC-H SF1 golden corpus, executed verbatim
  * (test/sqlite-datasets/tpchSf1.test — 22 queries, inline official
  * validation answers). Self-provisions the SF1 fixture via the driver-side
  * generator (tools/gen_tpch_sf1.py, DuckDB's bundled spec-faithful dbgen);
  * cancels rather than fails where that tooling is unavailable.
  */
class TpchGoldenSpec extends SparkSpec {
  private val dir = "/tmp/graft_tpch_sf1"

  private def provisioned(): Boolean = {
    if (new File(s"$dir/lineitem.parquet").exists()) return true
    try {
      val pb = new ProcessBuilder("python3", "tools/gen_tpch_sf1.py", dir, "1")
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes())
      val rc = p.waitFor()
      if (rc != 0) info(s"fixture generation failed (rc=$rc): ${out.takeRight(300)}")
      rc == 0 && new File(s"$dir/lineitem.parquet").exists()
    } catch { case e: Exception => info(e.toString); false }
  }

  test("reference tpchSf1.test: 22/22 official validation answers match") {
    if (!new File(graft.slt.TpchGolden.testFile).exists())
      cancel("reference golden corpus not present")
    if (!provisioned())
      cancel("driver-side python3/duckdb unavailable to provision the SF1 fixture")
    val r = graft.slt.TpchGolden.run(spark, dir)
    r.failures.foreach(f => info(s"FAIL $f"))
    assert(r.failed == 0 && r.passed == 22,
      s"tpchSf1 golden: ${r.passed}/${r.total} pass")
  }
}
