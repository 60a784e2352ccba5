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

  test("unnesting.test: >= 96% (decorrelation rule + SQL adapters; the rest" +
    " are subquery-in-join-condition planning limits and relational division)") {
    val r = run("unnesting.test")
    assert(r.passed >= 120, s"${r.passed}/${r.total}: ${r.failures.take(3)}")
  }

  test("COPY-then-COPY appends into a declared table (SLT block)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_slt_copy")
    java.nio.file.Files.writeString(dir.resolve("people.csv"), "1,ada\n2,grace\n")
    val slt =
      s"""statement ok
         |CREATE TABLE people (id INT, name VARCHAR(20))
         |
         |statement ok
         |COPY people FROM '${dir.resolve("people.csv")}' (FORMAT csv, DELIMITER ',')
         |
         |statement ok
         |COPY people FROM '${dir.resolve("people.csv")}' (FORMAT csv, DELIMITER ',')
         |
         |query IT rowsort
         |SELECT id, name FROM people
         |----
         |1
         |ada
         |1
         |ada
         |2
         |grace
         |2
         |grace
         |""".stripMargin
    val f = dir.resolve("copy_append.test")
    java.nio.file.Files.writeString(f, slt)
    val r = SltRunner.runFile(spark, f.toString)
    assert(r.failed == 0, r.failures)
  }
}
