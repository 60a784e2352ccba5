package graft.sqlsurface

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** GoogleSQL-style pipe-syntax SQL, the reference's second query language
  * (reference src/compiler/frontend/parser.y:450-566 "GOOLE PIPE syntax",
  * operator set include/lingodb/compiler/frontend/ast/pipe_operator.h:10-26:
  * WHERE, SELECT, JOIN, GROUP_BY/AGGREGATE, sort/limit RESULT_MODIFIERs,
  * UNION/INTERSECT/EXCEPT, FROM, EXTEND, DROP, SET).
  *
  * Spark has no pipe syntax, so each stage is folded left-to-right into the
  * running DataFrame: SQL-fragment stages go through spark.sql over a unique
  * temp view of the previous stage (Catalyst parses the expressions — we never
  * re-implement an expression grammar), structural stages (EXTEND/DROP/SET)
  * use the DataFrame API directly. The fold IS the pipe semantics: each
  * operator sees exactly the previous operator's output relation.
  */
object PipeSql {
  private val viewCounter = new AtomicInteger(0)

  def sql(spark: SparkSession, pipeQuery: String): DataFrame = {
    val stages = splitTop(pipeQuery.trim, "|>")
    require(stages.nonEmpty, "empty pipe query")
    val headSql = stages.head.trim
    val head =
      if (headSql.toUpperCase.startsWith("FROM")) spark.sql(s"SELECT * $headSql")
      else spark.sql(headSql) // plain SELECT head is allowed (parser.y:551)
    stages.tail.foldLeft(head)((df, stage) => applyStage(spark, df, stage.trim))
  }

  private def applyStage(spark: SparkSession, df: DataFrame, stage: String): DataFrame = {
    val up = stage.toUpperCase
    def view(): String = {
      val v = s"__pipe_${viewCounter.incrementAndGet()}"
      df.createOrReplaceTempView(v)
      v
    }
    val joinRe = "(?is)^((?:LEFT|RIGHT|FULL|INNER|CROSS)(?:\\s+OUTER)?\\s+)?JOIN\\s+(.*)$".r
    up match {
      case s if s.startsWith("WHERE") =>
        spark.sql(s"SELECT * FROM ${view()} WHERE ${stage.drop(5)}")
      case s if s.startsWith("SELECT") =>
        spark.sql(s"SELECT ${stage.drop(6)} FROM ${view()}")
      case s if s.startsWith("ORDER BY") =>
        spark.sql(s"SELECT * FROM ${view()} ORDER BY ${stage.drop(8)}")
      case s if s.startsWith("LIMIT") =>
        spark.sql(s"SELECT * FROM ${view()} LIMIT ${stage.drop(5)}")
      case s if s.startsWith("AGGREGATE") =>
        val rest = stage.drop(9)
        // AGGREGATE <aggs with aliases> [GROUP BY <keys with aliases>]
        val gbIdx = findTopLevel(rest.toUpperCase, "GROUP BY")
        if (gbIdx < 0) spark.sql(s"SELECT ${rest.trim} FROM ${view()}")
        else {
          val aggs = rest.substring(0, gbIdx).trim.stripSuffix(",")
          val keys = splitTop(rest.substring(gbIdx + 8).trim, ",").map(_.trim)
          // keys may carry aliases: SELECT uses the aliased form, GROUP BY the bare expr
          val keyExprs = keys.map(k => "(?is)\\s+AS\\s+\\w+\\s*$".r.replaceAllIn(k, ""))
          spark.sql(
            s"SELECT ${keys.mkString(", ")}, $aggs FROM ${view()} " +
              s"GROUP BY ${keyExprs.mkString(", ")}")
        }
      case s if s.startsWith("EXTEND") =>
        df.selectExpr("*" +: splitTop(stage.drop(6), ",").map(_.trim): _*)
      case s if s.startsWith("DROP") =>
        df.drop(splitTop(stage.drop(4), ",").map(_.trim): _*)
      case s if s.startsWith("SET") =>
        splitTop(stage.drop(3), ",").foldLeft(df) { (d, assign) =>
          val Array(name, rhs) = assign.split("=", 2)
          d.withColumn(name.trim, expr(rhs.trim))
        }
      case s if s.startsWith("UNION") || s.startsWith("INTERSECT") || s.startsWith("EXCEPT") =>
        val (op, rest0) =
          if (s.startsWith("UNION")) ("union", stage.drop(5))
          else if (s.startsWith("INTERSECT")) ("intersect", stage.drop(9))
          else ("except", stage.drop(6))
        val restUp = rest0.trim.toUpperCase
        val (all, subSql) =
          if (restUp.startsWith("ALL")) (true, rest0.trim.drop(3).trim)
          else if (restUp.startsWith("DISTINCT")) (false, rest0.trim.drop(8).trim)
          else (false, rest0.trim)
        val inner = stripParens(subSql)
        val other = if (containsTop(inner, "|>")) sql(spark, inner) else spark.sql(inner)
        (op, all) match {
          case ("union", true)      => df.unionAll(other)
          case ("union", false)     => df.union(other).distinct()
          case ("intersect", true)  => df.intersectAll(other)
          case ("intersect", false) => df.intersect(other)
          case ("except", true)     => df.exceptAll(other)
          case ("except", false)    => df.except(other)
        }
      case _ => joinRe.findFirstMatchIn(stage) match {
        case Some(m) =>
          val jt = Option(m.group(1)).map(_.trim + " ").getOrElse("")
          spark.sql(s"SELECT * FROM ${view()} ${jt}JOIN ${m.group(2)}")
        case None =>
          throw new IllegalArgumentException(s"unsupported pipe operator: $stage")
      }
    }
  }

  /** Split on a delimiter at paren/quote depth zero. */
  private[sqlsurface] def splitTop(s: String, delim: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inStr = false; var last = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && s.regionMatches(true, i, delim, 0, delim.length)) {
            out += s.substring(last, i); last = i + delim.length; i += delim.length - 1
          }
      }
      i += 1
    }
    out += s.substring(last)
    out.result()
  }

  private def findTopLevel(sUp: String, token: String): Int = {
    var depth = 0; var inStr = false; var i = 0
    while (i < sUp.length) {
      val c = sUp.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ => if (depth == 0 && sUp.regionMatches(i, token, 0, token.length)) return i
      }
      i += 1
    }
    -1
  }

  private def containsTop(s: String, delim: String): Boolean = splitTop(s, delim).length > 1

  private def stripParens(s: String): String = {
    val t = s.trim
    if (t.startsWith("(") && t.endsWith(")")) {
      // only strip if the parens wrap the whole string
      var depth = 0
      var wraps = true
      for (i <- 0 until t.length - 1) {
        t.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) wraps = false
          case _ =>
        }
      }
      if (wraps) t.substring(1, t.length - 1) else t
    } else t
  }
}

/** Pipe-SQL queries exposed through the driver contract, each with a classic
  * SQL oracle — proving the translation, not just the execution. */
object PipeSqlQueries {
  import graft.Tables
  type Q = (SparkSession, String) => DataFrame

  private def withTables(s: SparkSession, d: String)(q: String): DataFrame = {
    Tables.registerAll(s, d)
    PipeSql.sql(s, q)
  }

  val queries: Map[String, Q] = Map(
    "pipe_filter_agg" -> ((s, d) => withTables(s, d)(
      """FROM lineitem
        ||> WHERE l_quantity >= 45
        ||> JOIN orders ON l_orderkey = o_orderkey
        ||> AGGREGATE count(*) AS n, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty GROUP BY o_orderpriority
        ||> ORDER BY o_orderpriority""".stripMargin)),

    "pipe_extend_set_drop" -> ((s, d) => withTables(s, d)(
      """FROM region
        ||> EXTEND r_regionkey * 10 AS rk10
        ||> SET r_name = lower(r_name)
        ||> DROP r_regionkey
        ||> ORDER BY rk10""".stripMargin)),

    "pipe_setop" -> ((s, d) => withTables(s, d)(
      """FROM customer
        ||> SELECT CAST(c_nationkey AS BIGINT) AS x
        ||> EXCEPT DISTINCT (SELECT CAST(s_nationkey AS BIGINT) AS x FROM supplier)
        ||> ORDER BY x""".stripMargin))
  )

  val oracle: Map[String, String] = Map(
    "pipe_filter_agg" ->
      """SELECT o_orderpriority, count(*) AS n,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_quantity >= 45
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "pipe_extend_set_drop" ->
      "SELECT lower(r_name) AS r_name, CAST(r_regionkey * 10 AS INTEGER) AS rk10 FROM region ORDER BY rk10",
    "pipe_setop" ->
      """SELECT x FROM (SELECT CAST(c_nationkey AS BIGINT) AS x FROM customer
         EXCEPT SELECT CAST(s_nationkey AS BIGINT) FROM supplier) t ORDER BY x"""
  )
}
