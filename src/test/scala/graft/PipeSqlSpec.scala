package graft

import graft.sqlsurface.PipeSql

class PipeSqlSpec extends SparkSpec {

  private def run(q: String) = {
    Tables.registerAll(spark, sf)
    PipeSql.sql(spark, q)
  }

  test("values head with select/drop/extend/set") {
    val df = run(
      """FROM (VALUES (1, 1), (2, 2), (3, 3)) AS t(x, y)
        ||> SELECT *
        ||> EXTEND x + y AS s
        ||> SET y = y * 10
        ||> DROP x
        ||> ORDER BY s""".stripMargin)
    assert(df.columns.toSeq == Seq("y", "s"))
    assert(df.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((10, 2), (20, 4), (30, 6)))
  }

  test("where + join + aggregate group by") {
    val df = run(
      """FROM nation
        ||> JOIN region ON n_regionkey = r_regionkey
        ||> WHERE r_name = 'ASIA'
        ||> AGGREGATE count(*) AS n GROUP BY r_name
        ||> LIMIT 5""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("n") == 5L)
  }

  test("union all with nested pipe") {
    val df = run(
      """FROM region
        ||> SELECT r_name
        ||> UNION ALL (FROM region |> SELECT r_name)""".stripMargin)
    assert(df.count() == 10)
  }

  test("plain select head still works") {
    val df = run("SELECT 1 AS one |> EXTEND one + 1 AS two")
    assert(df.collect().head.getInt(1) == 2)
  }

  test("unsupported operator raises") {
    intercept[IllegalArgumentException](run("FROM region |> FROBNICATE x"))
  }
}
