package graft.tools

import scala.io.Source
import scala.util.{Failure, Success, Try}

/** Dev probe: run every statement of the reference's lit SQL syntax corpus
  * (test/lit/SQL/syntax.sql, vendored as slt/lit_syntax.sql) through
  * GraftSql against the corpus's `test` table, print per-statement
  * pass/fail. The lit runner only FileChecks the MLIR, so "executes
  * without error" is the corpus's contract; SyntaxSpec asserts it.
  */
object SyntaxProbe {
  /** Strip //CHECK comment lines, split on ';' statement terminators
    * (the corpus has no ';' inside string literals). */
  def statements(src: String): Seq[String] =
    src.linesIterator
      .filterNot(l => l.trim.startsWith("--//"))
      .mkString("\n")
      .split(";")
      .map(_.trim)
      .filter(_.nonEmpty)
      .toSeq

  /** The lit environment's preloaded `test` table (schema from the
    * corpus's own INSERT column list; resources/data/test in the ref). */
  def fixture(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    spark.sql("DROP TABLE IF EXISTS test")
    spark.sql(s"""CREATE TABLE test (
      str string, float32 float, float64 double, `decimal` decimal(5,2),
      int32 int, int64 bigint, bool boolean, date32 date, date64 timestamp,
      char1 string, char20 string) USING parquet LOCATION '$dir/test'""")
    spark.sql("""INSERT INTO test VALUES
      ('row1', 1.5, 2.5, 12.34, 10, 100, true, DATE'1996-01-02',
       TIMESTAMP'1996-01-02 13:37:00', 'a', 'abcdefghijklmnopqrst'),
      ('row2', -1.5, -2.5, -12.34, 200, 2000, false, DATE'2000-06-15',
       TIMESTAMP'2000-06-15 08:00:00', 'b', 'tsrqponmlkjihgfedcba')""")
  }

  /** t.csv for the corpus's COPY statement: '|'-delimited, 11 columns. */
  def writeCsv(path: String): Unit = {
    val w = new java.io.PrintWriter(path)
    w.println("csvrow|3.5|4.5|55.55|30|300|1|2001-03-04|2001-03-04 05:06:07|c|aaaaaaaaaaaaaaaaaaaa")
    w.close()
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.create(appName = "graft-syntaxprobe")
    val work = java.nio.file.Files.createTempDirectory("graft_syntax_").toFile.getAbsolutePath
    fixture(spark, work)
    writeCsv(s"$work/t.csv")
    // disk path (not classpath): the vendored corpus sits on the TEST
    // classpath; this dev probe runs from the main classes only
    val src = Source.fromFile("src/test/resources/slt/lit_syntax.sql").mkString
    var pass = 0; var fail = 0
    statements(src).foreach { st =>
      val stmt = st.replace("'t.csv'", s"'$work/t.csv'") // lit cwd fixture
      Try(graft.sqlsurface.GraftSql(spark, stmt).collect()) match {
        case Success(_) => pass += 1
        case Failure(e) =>
          fail += 1
          println(s"FAIL [${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(2).mkString(" / ").take(200)}]")
          println(s"  stmt: ${stmt.linesIterator.mkString(" ").take(160)}")
      }
    }
    println(s"syntax.sql: $pass pass, $fail fail")
    spark.stop()
  }
}
