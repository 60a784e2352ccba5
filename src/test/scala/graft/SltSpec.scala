package graft

import graft.slt.SltRunner

/** The engine runs the reference's own sqllogictest corpora
  * (reference test/sqlite-small + test/sqlite; SURVEY §5 / M0). */
class SltSpec extends SparkSpec {

  private def run(name: String) =
    SltRunner.runFile(spark, s"/root/reference/test/sqlite-small/$name")

  test("groupby.test: full pass") { val r = run("groupby.test"); assert(r.failed == 0, r.failures) }
  test("setops.test: full pass") { val r = run("setops.test"); assert(r.failed == 0, r.failures) }
  test("join.test: full pass") { val r = run("join.test"); assert(r.failed == 0, r.failures) }
  test("udf.test: full pass") { val r = run("udf.test"); assert(r.failed == 0, r.failures) }
  test("uni.test: full pass") { val r = run("uni.test"); assert(r.failed == 0, r.failures) }

  test("unnesting.test: >= 60% (rest are Catalyst decorrelation limits)") {
    val r = run("unnesting.test")
    assert(r.passed.toDouble / r.total >= 0.6, s"${r.passed}/${r.total}")
  }
}
