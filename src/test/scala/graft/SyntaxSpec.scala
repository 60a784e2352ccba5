package graft

import graft.sqlsurface.GraftSql
import graft.tools.SyntaxProbe
import scala.util.{Failure, Success, Try}

/** The reference's lit SQL syntax corpus (test/lit/SQL/syntax.sql, vendored
  * as slt/lit_syntax.sql): every statement must EXECUTE without error — the
  * lit runner only FileChecks the produced MLIR, so executes-clean is the
  * corpus's contract for an engine (97 lines / 77 `;`-statements: type
  * grammar incl. float(p)/bool, interval arithmetic, quantified ALL/ANY
  * comparisons, legacy-option COPY, PRIMARY KEY table constraints,
  * grouping-by-expression shapes, pipe-SQL with rollup).
  *
  * Plus value checks for the round-10 quantified-comparison rewrite
  * (SqlCanonicalizer.quantifiedCmp): exact 3-valued logic, every
  * expectation pinned against DuckDB 1.x.
  */
class SyntaxSpec extends SparkSpec {

  test("lit/SQL/syntax.sql: all 77 statements execute") {
    val work = java.nio.file.Files.createTempDirectory("graft_syntax_").toFile.getAbsolutePath
    SyntaxProbe.fixture(spark, work)
    SyntaxProbe.writeCsv(s"$work/t.csv")
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/slt/lit_syntax.sql")).mkString
    val stmts = SyntaxProbe.statements(src)
    assert(stmts.size == 77, s"corpus drift: ${stmts.size} statements")
    val failures = stmts.flatMap { st =>
      val stmt = st.replace("'t.csv'", s"'$work/t.csv'") // lit cwd fixture
      Try(GraftSql(spark, stmt).collect()) match {
        case Success(_) => None
        case Failure(e) => Some(s"$stmt => ${e.getMessage.linesIterator.take(1).mkString}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n\n"))
    spark.sql("DROP TABLE IF EXISTS test")
    spark.sql("DROP TABLE IF EXISTS test_tmp")
  }

  test("quantified ALL/ANY comparisons: exact 3VL (DuckDB-pinned)") {
    def v(q: String): Any = {
      val r = GraftSql(spark, q).collect()(0)
      if (r.isNullAt(0)) null else r.get(0)
    }
    assert(v("select 1=all(select 1)") == true)
    assert(v("select 1=any(select 1)") == true)
    // no false comparison + a NULL comparison -> NULL (ALL), no true + NULL -> NULL (ANY)
    assert(v("select 1 = all(select * from (values (1),(NULL)) t(v))") == null)
    assert(v("select 2 = any(select * from (values (1),(NULL)) t(v))") == null)
    // a decisive value wins over a NULL
    assert(v("select 1 = all(select * from (values (1),(2)) t(v))") == false)
    assert(v("select 0 < any(select * from (values (1),(NULL)) t(v))") == true)
    // empty set: ANY -> false, ALL -> true
    assert(v("select 3 = any(select v from (values (1),(2)) t(v) where v > 5)") == false)
    assert(v("select 3 = all(select v from (values (1),(2)) t(v) where v > 5)") == true)
  }

  test("no-FROM derived tables survive canonicalization (latent-bug pin)") {
    assert(GraftSql(spark, "SELECT * FROM (SELECT 1) t").collect()(0).get(0) == 1)
    assert(GraftSql(spark,
      "SELECT a FROM (SELECT 1 AS a) t JOIN (SELECT 2 AS b) u ON a < b")
      .collect()(0).get(0) == 1)
  }
}
