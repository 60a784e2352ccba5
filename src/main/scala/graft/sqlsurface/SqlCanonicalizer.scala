package graft.sqlsurface

/** Engine-side SQL canonicalization: source-level rewrites that widen the
  * accepted SQL surface beyond what Catalyst resolves, applied by
  * [[GraftSql]] to every statement BEFORE `spark.sql` — the Spark analog of
  * the reference's SQL canonicalization inside the engine front-end
  * (reference src/compiler/frontend/SQL/sql_analyzer.cpp; general unnesting
  * in Transforms/Unnesting.cpp). Moved out of the sqllogictest harness so a
  * user issuing the same SQL through GraftSql gets identical treatment —
  * the harness (graft.slt.SltRunner) now keeps only genuine dialect shims
  * (null ordering, quantified comparisons, type synonyms).
  *
  * The rewrites are exact (algebraic identities / scope hoists), not
  * approximations; [[graft.plans.DecorrelateComplexAggs]] handles the
  * plan-level remainder after analysis.
  */
object SqlCanonicalizer {

  /** Full pipeline, cheap no-op for SQL without subqueries. */
  def apply(sql: String): String =
    rewriteNoFromScalar(flattenDivision(hoistDeepCorrelation(
      boolScalarFilterToExists(cmpScalarSubqueriesToFrom(decomposeOuterAggs(
        joinOnSubqueryToWhere(existsNoFromToTrue(
          quantifiedCmp(canonTypes(sql))))))))))

  /** Masked copy for keyword/offset scans: contents of single-quoted string
    * literals (with `''` escapes), double-quoted identifiers, `--` line
    * comments and block comments are blanked to spaces. Length-preserving,
    * so every offset found on the mask applies verbatim to the original —
    * rewrites can never fire inside literal data (ADVICE r10). */
  private[sqlsurface] def maskLiterals(sql: String): String = {
    val a = sql.toCharArray
    var i = 0
    while (i < a.length) {
      a(i) match {
        case '\'' =>
          var j = i + 1
          var done = false
          while (j < a.length && !done) {
            if (a(j) == '\'') {
              if (j + 1 < a.length && a(j + 1) == '\'') {
                a(j) = ' '; a(j + 1) = ' '; j += 2
              } else done = true
            } else { a(j) = ' '; j += 1 }
          }
          i = j + 1
        case '"' =>
          var j = i + 1
          while (j < a.length && a(j) != '"') { a(j) = ' '; j += 1 }
          i = j + 1
        case '-' if i + 1 < a.length && a(i + 1) == '-' =>
          var j = i
          while (j < a.length && a(j) != '\n') { a(j) = ' '; j += 1 }
          i = j
        case '/' if i + 1 < a.length && a(i + 1) == '*' =>
          var j = i
          while (j + 1 < a.length && !(a(j) == '*' && a(j + 1) == '/')) {
            a(j) = ' '; j += 1
          }
          if (j + 1 < a.length) { a(j) = ' '; a(j + 1) = ' ' }
          i = j + 2
        case _ => i += 1
      }
    }
    new String(a)
  }

  /** Apply (start, end, replacement) spans to `sql`, right-to-left. */
  private def applySpans(sql: String, spans: Seq[(Int, Int, String)]): String =
    spans.sortBy(-_._1).foldLeft(sql) { case (s, (from, until, rep)) =>
      s.substring(0, from) + rep + s.substring(until)
    }

  /** Parameterized FLOAT(p): the SQL-standard binary-precision spec Spark's
    * parser rejects — p <= 24 is single precision, larger is double
    * (Postgres rule; reference parser accepts it, test/lit/SQL/syntax.sql).
    * Applied only in TYPE position — preceded by `AS`/`::` (a cast type) or
    * inside the column-definition list of a plain CREATE TABLE — so Spark's
    * float(x) cast-FUNCTION call (`SELECT float(30)`) survives untouched.
    * In the same column-definition list, the `bool` type alias maps to
    * `boolean` (only when followed by `,` or `)`, so a column NAMED bool in
    * a CTAS select list survives). All scans run on the literal-masked text
    * (ADVICE r10): occurrences inside strings/comments are never touched. */
  private def canonTypes(sql: String): String = {
    val masked = maskLiterals(sql)
    // column-definition region of a plain CREATE TABLE (never CTAS: a
    // paren group followed by AS is a column-ALIAS list, not types)
    val colDefRegion: Option[(Int, Int)] =
      "(?is)^\\s*CREATE\\s+TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?[\\w.\"`]+\\s*\\(".r
        .findPrefixMatchOf(masked).flatMap { m =>
          val open = m.end - 1
          val close = closeParenOf(masked, open)
          val after = masked.drop(close + 1).trim.toUpperCase
          if (close > 0 && !after.startsWith("AS")) Some((open, close)) else None
        }
    def inColDefs(pos: Int): Boolean =
      colDefRegion.exists { case (a, b) => pos > a && pos < b }
    def castPosition(pos: Int): Boolean = {
      var j = pos - 1
      while (j >= 0 && masked.charAt(j).isWhitespace) j -= 1
      (j >= 1 && masked.charAt(j) == ':' && masked.charAt(j - 1) == ':') ||
        (j >= 1 && masked.substring(j - 1, j + 1).equalsIgnoreCase("as") &&
          (j < 2 || !masked.charAt(j - 2).isLetterOrDigit))
    }
    val floatSpans = "(?i)\\bfloat\\s*\\(\\s*(\\d+)\\s*\\)".r
      .findAllMatchIn(masked)
      .filter(m => castPosition(m.start) || inColDefs(m.start))
      .map(m => (m.start, m.end,
        if (m.group(1).toInt <= 24) "float" else "double"))
      .toSeq
    val boolSpans = "(?i)\\bbool\\b(?=\\s*[,)])".r
      .findAllMatchIn(masked)
      .filter(m => inColDefs(m.start))
      .map(m => (m.start, m.end, "boolean"))
      .toSeq
    applySpans(sql, floatSpans ++ boolSpans)
  }

  /** Quantified comparisons `<lhs> <op> ALL|ANY|SOME (<subquery>)` — the
    * reference grammar supports them (test/lit/SQL/syntax.sql), Spark's
    * parser treats ALL/ANY as function calls. Rewritten to an aggregated
    * scalar subquery with EXACT 3-valued logic:
    *   ANY: true if any comparison is true; else NULL if any comparison is
    *        NULL; else false (empty set → false)
    *   ALL: false if any comparison is false; else NULL if any comparison
    *        is NULL; else true (empty set → true)
    * A correlated lhs/subquery yields a correlated scalar aggregate, which
    * the decorrelation pipeline already handles. The lhs is captured
    * conservatively (one token or one parenthesized group) — quantified
    * comparisons with a compound un-parenthesized lhs stay untouched and
    * fail in Spark's parser as before. */
  private def quantifiedCmp(sql: String): String = {
    val kwRe = "(?i)\\b(ALL|ANY|SOME)\\s*\\(".r
    var text = sql
    var changed = true
    while (changed) {
      changed = false
      // all scanning/paren-matching runs on the literal-masked copy
      // (length-preserving, so offsets map 1:1 onto `text`): an
      // `op ALL(SELECT…` shape inside a string literal or comment is never
      // rewritten, and a stray paren inside a literal cannot mis-slice the
      // statement (ADVICE r10)
      val masked = maskLiterals(text)
      val hit = kwRe.findAllMatchIn(masked).find { m =>
        val inner = masked.substring(m.end).trim.toUpperCase
        val isSub = Seq("SELECT", "WITH", "VALUES", "FROM").exists(inner.startsWith)
        isSub && cmpBefore(masked, m.start).isDefined
      }
      hit.foreach { m =>
        val (op, opStart) = cmpBefore(masked, m.start).get
        val open = masked.indexOf('(', m.end - 1)
        val close = closeParenOf(masked, open)
        if (close > 0) {
          lhsBefore(masked, opStart) match {
            case Some(lhsStart) =>
              val lhs = text.substring(lhsStart, opStart).trim
              val sub = text.substring(open + 1, close)
              val isAll = text.substring(m.start, m.end).toUpperCase.startsWith("ALL")
              val cmp = s"SELECT ($lhs $op graft_q_v) AS graft_q_cmp FROM ($sub) graft_q_t(graft_q_v)"
              val agg =
                if (isAll)
                  "CASE WHEN NOT coalesce(bool_and(graft_q_cmp), true) THEN false " +
                    "WHEN count(*) <> count(graft_q_cmp) THEN cast(null as boolean) ELSE true END"
                else
                  "CASE WHEN coalesce(bool_or(graft_q_cmp), false) THEN true " +
                    "WHEN count(*) <> count(graft_q_cmp) THEN cast(null as boolean) ELSE false END"
              text = text.substring(0, lhsStart) +
                s"(SELECT $agg FROM ($cmp))" + text.substring(close + 1)
              changed = true
            case None => ()
          }
        }
      }
    }
    text
  }

  /** The comparison operator ending immediately before `pos` (skipping
    * whitespace): Some((op, startIndexOfOp)). */
  private def cmpBefore(text: String, pos: Int): Option[(String, Int)] = {
    var j = pos - 1
    while (j >= 0 && text.charAt(j).isWhitespace) j -= 1
    val ops = Seq("<=", ">=", "<>", "!=", "=", "<", ">")
    ops.collectFirst {
      case op if j - op.length + 1 >= 0 &&
        text.substring(j - op.length + 1, j + 1) == op =>
        (op, j - op.length + 1)
    }
  }

  /** Start index of the conservative lhs (one identifier/literal token or
    * one balanced parenthesized group) ending immediately before `pos`. */
  private def lhsBefore(text: String, pos: Int): Option[Int] = {
    var j = pos - 1
    while (j >= 0 && text.charAt(j).isWhitespace) j -= 1
    if (j < 0) None
    else if (text.charAt(j) == ')') {
      var depth = 0
      var k = j
      while (k >= 0) {
        text.charAt(k) match {
          case ')' => depth += 1
          case '(' => depth -= 1; if (depth == 0) return Some(k)
          case _ =>
        }
        k -= 1
      }
      None
    } else {
      var k = j
      while (k >= 0 && (text.charAt(k).isLetterOrDigit ||
        "_.'\"".contains(text.charAt(k)))) k -= 1
      if (k == j) None else Some(k + 1)
    }
  }

  private val sqlKeywords = Set(
    "CASE", "WHEN", "THEN", "ELSE", "END", "IS", "NOT", "NULL", "AND", "OR",
    "IN", "LIKE", "BETWEEN", "TRUE", "FALSE", "CAST", "AS", "DISTINCT",
    "INTEGER", "INT", "BIGINT", "SMALLINT", "VARCHAR", "TEXT", "STRING",
    "DOUBLE", "FLOAT", "DECIMAL", "BOOLEAN", "DATE", "TIMESTAMP", "INTERVAL")

  /** Does the expression text reference any LOCAL (non-outer) column: a bare
    * identifier (inner column) or a qualifier not in `outerAliases`. */
  private def refsLocal(expr: String, outerAliases: Set[String]): Boolean = {
    val idRe = "[A-Za-z_]\\w*".r
    var i = 0
    while (i < expr.length) {
      idRe.findPrefixMatchOf(expr.substring(i)) match {
        case Some(m) if i == 0 || !expr.charAt(i - 1).isLetterOrDigit &&
            expr.charAt(i - 1) != '_' && expr.charAt(i - 1) != '.' =>
          val word = m.matched
          val after = expr.substring(i + word.length).dropWhile(_.isWhitespace)
          val isFunc = after.startsWith("(")
          val isQualifier = after.startsWith(".")
          if (!isFunc && !sqlKeywords.contains(word.toUpperCase)) {
            if (isQualifier) { if (!outerAliases.contains(word)) return true }
            else return true // bare identifier = inner column
          }
          i += m.matched.length.max(1)
        case _ => i += 1
      }
    }
    false
  }

  private def refsOuter(expr: String, outerAliases: Set[String]): Boolean =
    outerAliases.exists(a => s"(?i)\\b$a\\s*\\.".r.findFirstIn(expr).isDefined)

  /** Split an expression text at top-level '+'/'-' into signed terms; None if
    * it isn't a sum (single term). */
  private def signedTerms(expr: String): Seq[(Char, String)] = {
    val terms = Seq.newBuilder[(Char, String)]
    var depth = 0; var inStr = false; var start = 0; var sign = '+'
    var i = 0
    while (i < expr.length) {
      val c = expr.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case '+' | '-' if depth == 0 && i > start =>
          val prev = expr.substring(0, i).reverse.dropWhile(_.isWhitespace)
          // binary only: previous non-space char must end an operand
          if (prev.nonEmpty && (prev.head.isLetterOrDigit || prev.head == ')' || prev.head == '\'')) {
            terms += ((sign, expr.substring(start, i).trim)); sign = c; start = i + 1
          }
        case _ =>
      }
      i += 1
    }
    terms += ((sign, expr.substring(start).trim))
    terms.result().filter(_._2.nonEmpty)
  }

  /** Split at top-level '*' into factors (no division). */
  private def factors(expr: String): Seq[String] = {
    val fs = Seq.newBuilder[String]
    var depth = 0; var inStr = false; var start = 0
    var i = 0
    while (i < expr.length) {
      val c = expr.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case '*' if depth == 0 => fs += expr.substring(start, i).trim; start = i + 1
        case '/' | '%' if depth == 0 => return Seq(expr) // don't split
        case _ =>
      }
      i += 1
    }
    fs += expr.substring(start).trim
    fs.result().filter(_.nonEmpty)
  }

  /** Remove outer references from INSIDE aggregate-function arguments using
    * exact algebraic identities, keeping the block an aggregate query:
    *   SUM(o)   → CASE WHEN COUNT(*)=0 THEN NULL ELSE (o)*COUNT(*) END
    *   MIN(o)   → CASE WHEN COUNT(*)=0 THEN NULL ELSE (o) END     (MAX same)
    *   COUNT(o) → CASE WHEN (o) IS NULL THEN 0 ELSE COUNT(*) END
    *   SUM(l±o) → (SUM(l) ± (o)*COUNT(l))
    *   SUM(o*l) → ((o)*SUM(l))
    *   MIN(l±o) → (MIN(l) ± (o))                                  (MAX same)
    * Catalyst rejects these eagerly during resolution
    * (AGGREGATE_FUNCTION_MIXED_OUTER_LOCAL_REFERENCES) or mis-attributes the
    * aggregate to the outer block (SQL-standard outer aggregation — the
    * corpus expects the reference's inner-scope semantics), so this has to
    * happen before analysis; [[graft.plans.DecorrelateComplexAggs]] then
    * handles the outer references that remain OUTSIDE aggregate calls. */
  def decomposeOuterAggs(sql: String): String = {
    if (!"(?i)\\(\\s*SELECT".r.findFirstIn(sql).isDefined) return sql
    val declRe = "(?i)(?:FROM|JOIN|,)\\s+(\\w+)(?:\\s+(\\w+))?".r
    val allAliases = declRe.findAllMatchIn(sql)
      .flatMap(m => Seq(Option(m.group(1)), Option(m.group(2))).flatten).toSet
      .filterNot(w => fromKeywords.contains(w.toUpperCase))
    var cur = sql
    var changed = true
    var rounds = 0
    while (changed && rounds < 8) {
      changed = false; rounds += 1
      val opens = "(?i)\\(\\s*SELECT\\b".r.findAllMatchIn(cur).map(_.start).toSeq
      opens.foreach { open =>
        if (!changed) {
          var depth = 0; var j = open; var close = -1
          while (j < cur.length && close < 0) {
            cur.charAt(j) match {
              case '(' => depth += 1
              case ')' => depth -= 1; if (depth == 0) close = j
              case _ =>
            }
            j += 1
          }
          if (close > 0) {
            val body = cur.substring(open + 1, close)
            val ownAliases = declRe.findAllMatchIn(body)
              .flatMap(m => Seq(Option(m.group(1)), Option(m.group(2))).flatten).toSet
            val outerAliases = allAliases -- ownAliases
            rewriteAggsIn(body, outerAliases).foreach { newBody =>
              cur = cur.substring(0, open + 1) + newBody + cur.substring(close)
              changed = true
            }
          }
        }
      }
    }
    cur
  }

  /** One aggregate-call rewrite inside a subquery body; None if nothing to do. */
  private def rewriteAggsIn(body: String, outerAliases: Set[String]): Option[String] = {
    if (outerAliases.isEmpty) return None
    // grouped blocks: per-group COUNT(*) identities interact with HAVING —
    // the plan-level rule handles row-constant aggregates there instead
    if (hasTopLevel(body, "GROUP")) return None
    val aggRe = "(?i)\\b(SUM|MIN|MAX|COUNT|AVG)\\s*\\(".r
    aggRe.findAllMatchIn(body).foreach { m =>
      val fn = m.group(1).toUpperCase
      val open = m.end - 1
      var depth = 0; var j = open; var close = -1
      while (j < body.length && close < 0) {
        body.charAt(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) close = j
          case _ =>
        }
        j += 1
      }
      if (close > 0) {
        val arg = body.substring(open + 1, close).trim
        if (arg != "*" && !arg.toUpperCase.startsWith("DISTINCT") &&
          refsOuter(arg, outerAliases)) {
          val repl: Option[String] =
            if (!refsLocal(arg, outerAliases)) fn match { // pure-outer argument
              case "SUM" => Some(s"(CASE WHEN COUNT(*)=0 THEN NULL ELSE ($arg)*COUNT(*) END)")
              case "MIN" | "MAX" | "AVG" =>
                Some(s"(CASE WHEN COUNT(*)=0 THEN NULL ELSE ($arg) END)")
              case "COUNT" => Some(s"(CASE WHEN ($arg) IS NULL THEN 0 ELSE COUNT(*) END)")
              case _ => None
            } else { // mixed argument: try additive then multiplicative split
              val terms = signedTerms(arg)
              val (oTerms, lTerms) = terms.partition(t => !refsLocal(t._2, outerAliases) &&
                refsOuter(t._2, outerAliases))
              def joined(ts: Seq[(Char, String)]): String = ts.zipWithIndex.map {
                case ((s, t), 0) => if (s == '-') s"-($t)" else s"($t)"
                case ((s, t), _) => s" $s ($t)"
              }.mkString
              // every remaining term must be purely local (a term mixing
              // outer and local refs cannot be split additively)
              if (terms.length >= 2 && oTerms.nonEmpty && lTerms.nonEmpty &&
                lTerms.forall(t => !refsOuter(t._2, outerAliases))) {
                val lExpr = joined(lTerms)
                val oExpr = joined(oTerms)
                fn match {
                  case "SUM" => Some(s"(SUM($lExpr) + ($oExpr)*COUNT($lExpr))")
                  case "MIN" | "MAX" if lTerms.forall(_._1 == '+') =>
                    Some(s"($fn($lExpr) + ($oExpr))")
                  case _ => None
                }
              } else {
                val fs = factors(arg)
                if (fn == "SUM" && fs.length >= 2) {
                  val (of, lf) = fs.partition(f => !refsLocal(f, outerAliases) &&
                    refsOuter(f, outerAliases))
                  if (of.nonEmpty && lf.nonEmpty && lf.forall(!refsOuter(_, outerAliases)))
                    Some(s"((${of.map(f => s"($f)").mkString("*")})*SUM(${lf.map(f => s"($f)").mkString("*")}))")
                  else None
                } else None
              }
            }
          repl.foreach { r =>
            return Some(body.substring(0, m.start) + r + body.substring(close + 1))
          }
        }
      }
    }
    None
  }

  /** `A INNER JOIN B ON <cond with subquery>` → `A, B WHERE <cond>`: Spark
    * cannot prepare subquery expressions inside join conditions (physical
    * planning limitation); for INNER joins the comma-join + WHERE form is
    * identical. Applied only when the ON clause contains a subquery and the
    * query has no top-level WHERE of its own. */
  def joinOnSubqueryToWhere(sql: String): String = {
    if (!sql.toUpperCase.contains("INNER JOIN") || topLevelHasWhere(sql)) return sql
    val re = "(?i)\\bINNER\\s+JOIN\\s+(\\w+(?:\\s+\\w+)?)\\s+ON\\s+".r
    re.findFirstMatchIn(sql) match {
      case Some(m) if sql.substring(m.end).toUpperCase.contains("(SELECT") =>
        sql.substring(0, m.start) + ", " + m.group(1) + " WHERE " + sql.substring(m.end)
      case _ => sql
    }
  }

  private def hasTopLevel(text: String, word: String): Boolean = {
    var d = 0; var inStr = false
    val up = text.toUpperCase
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => d += 1
        case ')' => d -= 1
        case _ =>
          if (d == 0 && up.regionMatches(i, word, 0, word.length) &&
            (i == 0 || !text.charAt(i - 1).isLetterOrDigit) &&
            (i + word.length >= text.length || !text.charAt(i + word.length).isLetterOrDigit))
            return true
      }
      i += 1
    }
    false
  }

  /** `EXISTS(SELECT <exprs>)` with no FROM: the implicit single row always
    * exists → TRUE (the reference parses multi-column no-FROM selects here;
    * Spark would misread the collapsed form as its higher-order exists()). */
  def existsNoFromToTrue(sql: String): String = {
    val re = "(?i)\\bEXISTS\\s*\\(\\s*SELECT\\b".r
    re.findFirstMatchIn(sql) match {
      case Some(m) =>
        val open = sql.indexOf('(', m.start)
        var depth = 0; var i = open; var close = -1
        while (i < sql.length && close < 0) {
          sql.charAt(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) close = i
            case _ =>
          }
          i += 1
        }
        if (close > 0) {
          val body = sql.substring(open + 1, close)
          if (!hasTopLevel(body, "FROM"))
            existsNoFromToTrue(
              sql.substring(0, m.start) + "TRUE" + sql.substring(close + 1))
          else sql
        } else sql
      case None => sql
    }
  }

  private def topLevelHasWhere(sql: String): Boolean = {
    var d = 0; var inStr = false
    val up = sql.toUpperCase
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => d += 1
        case ')' => d -= 1
        case _ =>
          if (d == 0 && up.regionMatches(i, "WHERE", 0, 5) &&
            (i == 0 || !sql.charAt(i - 1).isLetterOrDigit) &&
            (i + 5 >= sql.length || !sql.charAt(i + 5).isLetterOrDigit)) return true
      }
      i += 1
    }
    false
  }

  /** Multi-level correlation hoist: Spark resolves outer references exactly
    * one level up, so a subquery nested two scopes deep cannot see the
    * top-level alias (the reference's general unnesting can —
    * Transforms/Unnesting.cpp). When the top-level FROM is a single simple
    * relation `FROM t a`, an inner block that references only `a.` and its
    * own aliases is hoisted into a derived table:
    *   FROM t a  →  FROM (SELECT a.*, <block> AS __hoistK FROM t a) a
    * and the block's occurrence becomes `a.__hoistK` — every remaining
    * correlation is then single-level. Exact: the hoisted block correlates
    * only on `a` rows, evaluated once per row either way. */
  def hoistDeepCorrelation(sql: String): String = {
    var cur = sql
    var k = 0
    var changed = true
    while (changed && k < 4) {
      changed = false
      hoistOnce(cur, k).foreach { next => cur = next; changed = true; k += 1 }
    }
    cur
  }

  private val fromKeywords = Set("WHERE", "GROUP", "ORDER", "LIMIT", "HAVING",
    "UNION", "INTERSECT", "EXCEPT", "INNER", "LEFT", "RIGHT", "FULL", "CROSS",
    "JOIN", "ON")

  private def hoistOnce(sql: String, k: Int): Option[String] = {
    val up = sql.toUpperCase
    if (!up.startsWith("SELECT") || "\\(\\s*SELECT".r.findAllIn(up).size < 2) return None
    // top-level FROM: single simple `FROM <table> <alias>`
    var d = 0; var inStr = false; var fromAt = -1
    var i = 0
    while (i < sql.length && fromAt < 0) {
      val c = sql.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => d += 1
        case ')' => d -= 1
        case _ =>
          if (d == 0 && up.regionMatches(i, "FROM", 0, 4) &&
            (i == 0 || !sql.charAt(i - 1).isLetterOrDigit) &&
            (i + 4 >= sql.length || !sql.charAt(i + 4).isLetterOrDigit)) fromAt = i
      }
      i += 1
    }
    if (fromAt < 0) return None
    val selectPart = sql.substring(0, fromAt)
    if (selectPart.replaceAll("\\([^)]*\\)", "").contains("*")) return None // SELECT *
    val fromRe = "(?is)^FROM\\s+(\\w+)\\s+(\\w+)\\s*".r
    val tail = sql.substring(fromAt)
    val m = fromRe.findFirstMatchIn(tail).getOrElse(return None)
    val (table, alias) = (m.group(1), m.group(2))
    if (fromKeywords.contains(alias.toUpperCase)) return None
    val afterFrom = tail.substring(m.end).trim
    if (afterFrom.nonEmpty && !fromKeywords.contains(
      afterFrom.takeWhile(_.isLetterOrDigit).toUpperCase)) return None
    if (afterFrom.startsWith(",")) return None
    // innermost nested (SELECT ...) block referencing the top alias
    val opens = "(?i)\\(\\s*SELECT\\b".r.findAllMatchIn(sql).map(_.start).toSeq
    def closeOf(open: Int): Int = {
      var depth = 0; var j = open
      while (j < sql.length) {
        sql.charAt(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) return j
          case _ =>
        }
        j += 1
      }
      -1
    }
    val blocks = opens.map(o => (o, closeOf(o))).filter(_._2 > 0)
    def isNested(b: (Int, Int)) =
      blocks.exists(p => p._1 < b._1 && p._2 > b._2)
    def isInnermost(b: (Int, Int)) =
      !blocks.exists(p => p._1 > b._1 && p._2 < b._2)
    val qualRe = "(\\w+)\\s*\\.".r
    val declRe = "(?i)(?:FROM|JOIN|,)\\s+(\\w+)(?:\\s+(\\w+))?".r
    // a block is a TABLE (derived table in FROM/JOIN position, or followed by
    // a bare alias) — only scalar-expression blocks may be hoisted
    def isTablePosition(b: (Int, Int)): Boolean = {
      val before = sql.substring(0, b._1).reverse.dropWhile(_.isWhitespace)
      val prevWord = before.takeWhile(c => c.isLetterOrDigit).reverse.toUpperCase
      if (prevWord == "FROM" || prevWord == "JOIN") true
      else {
        val after = sql.substring(b._2 + 1).dropWhile(_.isWhitespace)
        val nextWord = after.takeWhile(_.isLetterOrDigit).toUpperCase
        nextWord.nonEmpty && nextWord != "AS" && !fromKeywords.contains(nextWord) &&
          prevWord == "" // e.g. `, (SELECT...) alias` in a FROM list
      }
    }
    blocks.find { b =>
      if (!isNested(b) || !isInnermost(b) || isTablePosition(b)) false
      else {
        val body = sql.substring(b._1 + 1, b._2)
        val quals = qualRe.findAllMatchIn(body).map(_.group(1)).toSet
        val own = declRe.findAllMatchIn(body).flatMap(mm =>
          Seq(Option(mm.group(1)), Option(mm.group(2))).flatten).toSet
          .filterNot(w => fromKeywords.contains(w.toUpperCase))
        quals.contains(alias) && !own.contains(alias) &&
          quals.forall(q => q == alias || own.contains(q))
      }
    }.map { case (bOpen, bClose) =>
      val block = sql.substring(bOpen, bClose + 1)
      val hoistCol = s"__hoist$k"
      val newFrom = s"FROM (SELECT $alias.*, $block AS $hoistCol FROM $table $alias) $alias"
      // splice: replace block first (it precedes FROM in the select list) or
      // after — handle both orders by editing the later region first
      val fromStart = fromAt
      val fromEnd = fromAt + m.end
      if (bOpen > fromEnd) {
        sql.substring(0, fromStart) + newFrom + " " +
          sql.substring(fromEnd, bOpen) + s"$alias.$hoistCol" + sql.substring(bClose + 1)
      } else {
        sql.substring(0, bOpen) + s"$alias.$hoistCol" +
          sql.substring(bClose + 1, fromStart) + newFrom + " " + sql.substring(fromEnd)
      }
    }
  }

  /** A scalar subquery with no FROM clause is a single implicit row, so
    * `(SELECT <expr>)` ≡ `(<expr>)` and single-row aggregates collapse:
    * SUM/MIN/MAX/AVG(e) → e, COUNT(*) → 1, COUNT(e) → e IS NULL ? 0 : 1.
    * Catalyst rejects outer references inside such subqueries
    * (CORRELATED_REFERENCE) and multi-level nesting; the reference's general
    * unnesting (Transforms/Unnesting.cpp) handles them. Applied innermost-
    * first until fixpoint, this is an exact rewrite, not an approximation. */
  def rewriteNoFromScalar(sql: String): String = {
    val up0 = "(?i)\\(\\s*SELECT\\b".r
    var cur = sql
    var changed = true
    while (changed) {
      changed = false
      // scan on the literal-masked copy (offsets map 1:1 onto cur): a
      // "(SELECT 1)" shape INSIDE a string literal is data, not a scalar
      // subquery, and literal parens must not derail the depth matching
      val maskedCur = maskLiterals(cur)
      val it = up0.findAllMatchIn(maskedCur).toSeq
      // innermost first = rightmost opening paren first
      it.sortBy(-_.start).foreach { m =>
        if (!changed) {
          val open = m.start
          var depth = 0; var i = open; var close = -1
          while (i < maskedCur.length && close < 0) {
            maskedCur.charAt(i) match {
              case '(' => depth += 1
              case ')' => depth -= 1; if (depth == 0) close = i
              case _ =>
            }
            i += 1
          }
          if (close > 0) {
            val inner = cur.substring(open + 1, close).trim // SELECT <expr...>
            val exprPart = inner.substring(6) // drop SELECT
            // clause detection on the masked slice (same offsets)
            val exprMasked = maskedCur.substring(open + 1, close).trim.substring(6)
            val hasClause = {
              var d = 0; var found = false
              var j = 0
              val eUp = exprMasked.toUpperCase
              while (j < exprMasked.length && !found) {
                exprMasked.charAt(j) match {
                  case '(' => d += 1
                  case ')' => d -= 1
                  case _ =>
                    if (d == 0) found = Seq("FROM", "WHERE", "GROUP", "UNION",
                      "INTERSECT", "EXCEPT").exists { w =>
                      eUp.regionMatches(j, w, 0, w.length) &&
                        (j == 0 || !exprMasked.charAt(j - 1).isLetterOrDigit) &&
                        (j + w.length >= exprMasked.length ||
                          !exprMasked.charAt(j + w.length).isLetterOrDigit)
                    }
                }
                j += 1
              }
              found
            }
            // a no-FROM subquery in DERIVED-TABLE position (`FROM (SELECT
            // 1) t`, `JOIN (SELECT 2) u`) is a one-row TABLE, not a scalar —
            // collapsing it to `FROM (1) t` broke the statement (latent bug
            // surfaced by the round-10 quantified-comparison rewrite, whose
            // generated derived tables hit exactly this shape)
            val derivedTablePos = {
              var k = open - 1
              while (k >= 0 && cur.charAt(k).isWhitespace) k -= 1
              val end = k
              while (k >= 0 && (cur.charAt(k).isLetterOrDigit || cur.charAt(k) == '_')) k -= 1
              val word = cur.substring(k + 1, end + 1).toUpperCase
              word == "FROM" || word == "JOIN"
            }
            if (!hasClause && !derivedTablePos &&
              !exprMasked.toUpperCase.contains("(SELECT") &&
              !exprMasked.toUpperCase.contains("( SELECT")) {
              val collapsed = collapseSingleRowAggs(exprPart.trim)
              cur = cur.substring(0, open) + s"($collapsed)" + cur.substring(close + 1)
              changed = true
            }
          }
        }
      }
    }
    cur
  }

  private def collapseSingleRowAggs(expr: String): String = {
    val aggRe = "(?i)\\b(SUM|MIN|MAX|AVG|COUNT)\\s*\\(".r
    var cur = expr
    var changed = true
    while (changed) {
      changed = false
      aggRe.findFirstMatchIn(cur).foreach { m =>
        val open = m.end - 1
        var depth = 0; var i = open; var close = -1
        while (i < cur.length && close < 0) {
          cur.charAt(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) close = i
            case _ =>
          }
          i += 1
        }
        if (close > 0) {
          val arg = cur.substring(open + 1, close).trim
          val repl = m.group(1).toUpperCase match {
            case "COUNT" if arg == "*" => "1"
            case "COUNT" => s"(CASE WHEN ($arg) IS NULL THEN 0 ELSE 1 END)"
            case "AVG" => s"(CAST(($arg) AS DOUBLE))"
            case _ => s"($arg)"
          }
          cur = cur.substring(0, m.start) + repl + cur.substring(close + 1)
          changed = true
        }
      }
    }
    cur
  }

  /** The reference follows Postgres null ordering (ASC → NULLS LAST, DESC →
    * NULLS FIRST); Spark defaults to the opposite. Make every ORDER BY item
    * explicit — including window-internal ones. */
  // ------------------------------------------------ structural scan helpers

  /** Index of the matching close paren for the open paren at `open`. */
  private def closeParenOf(text: String, open: Int): Int = {
    var depth = 0; var j = open; var inStr = false
    while (j < text.length) {
      val c = text.charAt(j)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return j
        case _ =>
      }
      j += 1
    }
    -1
  }

  /** All `(SELECT ...)` spans in `text` (open/close index pairs). */
  private def selectBlocks(text: String): Seq[(Int, Int)] =
    "(?i)\\(\\s*SELECT\\b".r.findAllMatchIn(text).map(_.start).toSeq
      .map(o => (o, closeParenOf(text, o))).filter(_._2 > 0)

  /** `(SELECT ...)` spans not nested inside another such span. */
  private def outerSelectBlocks(text: String): Seq[(Int, Int)] = {
    val bs = selectBlocks(text)
    bs.filterNot(b => bs.exists(p => p._1 < b._1 && p._2 > b._2))
  }

  /** Position of the first depth-0 occurrence of keyword `word`, or -1. */
  private def topLevelIndexOf(text: String, word: String): Int = {
    var d = 0; var inStr = false
    val up = text.toUpperCase
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => d += 1
        case ')' => d -= 1
        case _ =>
          if (d == 0 && up.regionMatches(i, word, 0, word.length) &&
            (i == 0 || !text.charAt(i - 1).isLetterOrDigit && text.charAt(i - 1) != '_') &&
            (i + word.length >= text.length || !text.charAt(i + word.length).isLetterOrDigit))
            return i
      }
      i += 1
    }
    -1
  }

  private val clauseEnders =
    Seq("GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET", "UNION", "INTERSECT", "EXCEPT")

  /** First depth-0 clause boundary at/after `from`, else text.length. */
  private def clauseEndFrom(text: String, from: Int, extra: Seq[String] = Nil): Int = {
    val enders = clauseEnders ++ extra
    var d = 0; var inStr = false
    val up = text.toUpperCase
    var i = from
    while (i < text.length) {
      val c = text.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => d += 1
        case ')' => d -= 1
        case _ =>
          if (d == 0 && enders.exists(w => up.regionMatches(i, w, 0, w.length) &&
            (i == 0 || !text.charAt(i - 1).isLetterOrDigit && text.charAt(i - 1) != '_') &&
            (i + w.length >= text.length || !text.charAt(i + w.length).isLetterOrDigit)))
            return i
      }
      i += 1
    }
    text.length
  }

  /** Top-level WHERE clause of `sql`: (whereKeywordStart, clauseEndExclusive). */
  private def whereSpan(sql: String): Option[(Int, Int)] = {
    val w = topLevelIndexOf(sql, "WHERE")
    if (w < 0) None else Some((w, clauseEndFrom(sql, w + 5)))
  }

  /** Top-level FROM clause text span: (textStart, textEndExclusive). */
  private def fromSpan(sql: String): Option[(Int, Int)] = {
    val f = topLevelIndexOf(sql, "FROM")
    if (f < 0) None else Some((f + 4, clauseEndFrom(sql, f + 4, Seq("WHERE"))))
  }

  private case class FromItem(text: String, alias: String)

  /** Parse a comma-join FROM clause into items with aliases; None when the
    * clause uses explicit JOIN syntax or an item's alias is unrecognizable. */
  private def parseFromItems(fromText: String): Option[Seq[FromItem]] = {
    if (topLevelIndexOf(fromText, "JOIN") >= 0) return None
    val items = PipeSql.splitTop(fromText, ",").map(_.trim).filter(_.nonEmpty)
    val parsed = items.map { it =>
      var t = it
      // strip a trailing column-name list `alias(c1, c2)` to find the alias
      val colListRe = "(?s)^(.*?)\\b([A-Za-z_]\\w*)\\s*\\(\\s*\\w+(?:\\s*,\\s*\\w+)*\\s*\\)$".r
      t match {
        case colListRe(before, al) if before.trim.nonEmpty &&
            !fromKeywords.contains(al.toUpperCase) =>
          FromItem(it, al)
        case _ =>
          val wordRe = "(?s)^(.*?)\\s+(?:(?i)AS\\s+)?([A-Za-z_]\\w*)$".r
          t match {
            case wordRe(before, al) if !fromKeywords.contains(al.toUpperCase) &&
                !before.trim.endsWith(",") =>
              FromItem(it, al)
            case _ if "^[A-Za-z_]\\w*$".r.findFirstIn(t).isDefined =>
              FromItem(it, t)
            case _ => FromItem(it, "")
          }
      }
    }
    if (parsed.exists(_.alias.isEmpty)) None else Some(parsed)
  }

  private val aggCallRe = "(?i)\\b(SUM|MIN|MAX|COUNT|AVG)\\s*\\(".r

  // ------------------------------------- comparisons of two scalar subqueries

  /** `WHERE (SELECT f(agg)·outer FROM t) = (SELECT g(agg)·outer FROM u)`:
    * Spark never executes scalar subqueries that optimization pushes into
    * hash-join keys ("Subquery ... has not finished"). Rewrite each side's
    * uncorrelated aggregate core into a 1-row derived table in FROM (an
    * aggregate without GROUP BY returns exactly one row, so the cross join
    * is cardinality-preserving and exact, including the empty-input NULL),
    * after pulling outer-alias factors out of the select expression:
    *   (SELECT 2*SUM(i)*s1.i FROM t)  →  (s1.i) * __bsq0.__v,
    *   FROM ... , (SELECT (2)*(SUM(i)) AS __v FROM t) __bsq0
    * Triggered only when two subquery blocks sit in one comparison (no
    * AND/OR between them) — the exact shape Spark cannot execute. */
  def cmpScalarSubqueriesToFrom(sql: String): String = {
    if (!sql.trim.toUpperCase.startsWith("SELECT")) return sql
    val ws = whereSpan(sql).getOrElse(return sql)
    val whereText = sql.substring(ws._1 + 5, ws._2)
    val blocks = outerSelectBlocks(whereText).sortBy(_._1)
    if (blocks.size < 2) return sql
    val inCmp = blocks.sliding(2).collect {
      case Seq(b1, b2)
        if {
          val between = whereText.substring(b1._2 + 1, b2._1)
          between.exists(c => c == '=' || c == '<' || c == '>') &&
            "(?i)\\b(AND|OR)\\b".r.findFirstIn(between).isEmpty
        } => Seq(b1, b2)
    }.flatten.toSeq.distinct
    if (inCmp.size < 2) return sql
    val fs0 = fromSpan(sql).getOrElse(return sql)
    val fromText = sql.substring(fs0._1, fs0._2)
    val items = parseFromItems(fromText).getOrElse(return sql)
    val topAliases = items.map(_.alias).toSet
    // plan every replacement before editing; abort wholesale on any miss
    case class Repl(open: Int, close: Int, newExpr: String, derived: String)
    val repls = inCmp.zipWithIndex.map { case ((open, close), k) =>
      val body = whereText.substring(open + 1, close)
      val fromAt = topLevelIndexOf(body, "FROM")
      if (fromAt < 0) return sql
      if (topLevelIndexOf(body, "GROUP") >= 0) return sql
      val selStart = topLevelIndexOf(body, "SELECT")
      if (selStart != body.indexWhere(!_.isWhitespace)) return sql
      val selPart = body.substring(selStart + 6, fromAt).trim
      val declRe = "(?i)(?:FROM|JOIN|,)\\s+(\\w+)(?:\\s+(\\w+))?".r
      val own = declRe.findAllMatchIn(body)
        .flatMap(m => Seq(Option(m.group(1)), Option(m.group(2))).flatten).toSet
        .filterNot(w => fromKeywords.contains(w.toUpperCase))
      val outer = topAliases -- own
      val fsplit = factors(selPart)
      val (outF, inF) = fsplit.partition(f => refsOuter(f, outer) && !refsLocal(f, outer))
      if (inF.isEmpty || inF.exists(f => refsOuter(f, outer))) return sql
      if (aggCallRe.findFirstIn(inF.mkString(" ")).isEmpty) return sql
      // the body's FROM/WHERE tail must be uncorrelated to move into FROM
      if (refsOuter(body.substring(fromAt), outer)) return sql
      val alias = s"__bsq$k"
      val derived =
        s"(SELECT ${inF.map(f => s"($f)").mkString("*")} AS __v ${body.substring(fromAt)}) $alias"
      val newExpr =
        if (outF.isEmpty) s"$alias.__v"
        else s"(${outF.map(f => s"($f)").mkString("*")}*$alias.__v)"
      Repl(open, close, newExpr, derived)
    }
    val newWhere = repls.sortBy(-_.open).foldLeft(whereText) { (w, r) =>
      w.substring(0, r.open) + r.newExpr + w.substring(r.close + 1)
    }
    // expand a bare `SELECT *` so the added derived tables stay invisible
    val selEnd = topLevelIndexOf(sql, "FROM")
    val selList = sql.substring(6, selEnd).trim
    val newSelList =
      if (selList == "*") items.map(i => s"${i.alias}.*").mkString(", ")
      else selList
    sql.substring(0, 6) + " " + newSelList + " FROM " +
      fromText.trim + ", " + repls.map(_.derived).mkString(", ") + " WHERE " +
      newWhere + sql.substring(ws._2)
  }

  // ------------------------------- correlated boolean scalar subquery filter

  /** `WHERE (SELECT <bool over outer refs> FROM t WHERE p)` — Catalyst
    * mis-resolves outer attributes appearing only in a correlated scalar
    * subquery's select list when the predicate correlates on a different
    * outer alias (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND). As a filter the
    * scalar's value is TRUE / FALSE-or-NULL, so it is exactly
    * `EXISTS (SELECT 1 FROM t WHERE (p) AND (<bool>))` whenever at most one
    * row matches p (more would be a runtime error anyway — the rewrite
    * widens that error case to ANY-row semantics, like the reference's mark
    * joins). Triggered only when the whole WHERE clause is one subquery. */
  def boolScalarFilterToExists(sql: String): String = {
    val ws = whereSpan(sql).getOrElse(return sql)
    val whereText = sql.substring(ws._1 + 5, ws._2)
    val blocks = outerSelectBlocks(whereText)
    if (blocks.size != 1) return sql
    val (open, close) = blocks.head
    if (whereText.substring(0, open).trim.nonEmpty ||
      whereText.substring(close + 1).trim.nonEmpty) return sql
    val body = whereText.substring(open + 1, close)
    val fromAt = topLevelIndexOf(body, "FROM")
    if (fromAt < 0) return sql
    val selStart = topLevelIndexOf(body, "SELECT")
    if (selStart != body.indexWhere(!_.isWhitespace)) return sql
    val selPart = body.substring(selStart + 6, fromAt).trim
    if (aggCallRe.findFirstIn(selPart).isDefined) return sql
    val fs0 = fromSpan(sql).getOrElse(return sql)
    val items = parseFromItems(sql.substring(fs0._1, fs0._2)).getOrElse(return sql)
    val declRe = "(?i)(?:FROM|JOIN|,)\\s+(\\w+)(?:\\s+(\\w+))?".r
    val own = declRe.findAllMatchIn(body)
      .flatMap(m => Seq(Option(m.group(1)), Option(m.group(2))).flatten).toSet
      .filterNot(w => fromKeywords.contains(w.toUpperCase))
    val outer = items.map(_.alias).toSet -- own
    if (!refsOuter(selPart, outer)) return sql
    val rest = body.substring(fromAt) // FROM ... [WHERE ...] [...]
    val bw = topLevelIndexOf(rest, "WHERE")
    val newRest =
      if (bw >= 0) {
        val bwEnd = clauseEndFrom(rest, bw + 5)
        rest.substring(0, bw) +
          s"WHERE (${rest.substring(bw + 5, bwEnd).trim}) AND ($selPart)" +
          rest.substring(bwEnd)
      } else {
        val end = clauseEndFrom(rest, 4)
        rest.substring(0, end) + s" WHERE ($selPart)" + rest.substring(end)
      }
    sql.substring(0, ws._1) + s"WHERE EXISTS (SELECT 1 $newRest)" + sql.substring(ws._2)
  }

  // --------------------------------------- relational division (deep EXISTS)

  /** Division-style nesting: `... FROM S s WHERE [NOT] EXISTS (SELECT ...
    * WHERE ... (SELECT ... WHERE ... s.c ...))` — the inner block references
    * `s` TWO scopes up, which Catalyst cannot resolve (outer references bind
    * exactly one level; the reference's general unnesting handles arbitrary
    * depth, Transforms/Unnesting.cpp). Exact flattening: the EXISTS body
    * depends on `s` only through its referenced columns C, so join the body
    * against the DISTINCT C-tuples of S — `(SELECT DISTINCT s.C FROM S s)
    * __div` — rewrite every `s.` inside the body to `__div.`, and equate
    * `__div.C <=> s.C` at the body's top level (depth-1 correlation,
    * null-safe). Every remaining correlation is then single-level. */
  def flattenDivision(sql: String): String = {
    if (!sql.trim.toUpperCase.startsWith("SELECT")) return sql
    val ws = whereSpan(sql).getOrElse(return sql)
    val whereText = sql.substring(ws._1 + 5, ws._2)
    val fs0 = fromSpan(sql).getOrElse(return sql)
    val items = parseFromItems(sql.substring(fs0._1, fs0._2)).getOrElse(return sql)
    val exRe = "(?i)\\bEXISTS\\s*\\(".r
    for (m <- exRe.findAllMatchIn(whereText)) {
      val open = whereText.indexOf('(', m.start)
      val close = closeParenOf(whereText, open)
      if (close > 0 && !whereText.substring(open + 1, close).contains("__div")) {
        val body = whereText.substring(open + 1, close)
        val declRe = "(?i)(?:FROM|JOIN|,)\\s+(\\w+)(?:\\s+(\\w+))?".r
        val own = declRe.findAllMatchIn(body)
          .flatMap(mm => Seq(Option(mm.group(1)), Option(mm.group(2))).flatten).toSet
          .filterNot(w => fromKeywords.contains(w.toUpperCase))
        // only nested subquery EXPRESSIONS break Catalyst's one-level outer
        // resolution; a correlated derived table in FROM/JOIN position under
        // EXISTS is decorrelated natively (lateral-style) — don't touch it
        val nested = selectBlocks(body).filterNot { case (no, nc) =>
          val before = body.substring(0, no).reverse.dropWhile(_.isWhitespace)
          val prevWord = before.takeWhile(c => c.isLetterOrDigit || c == '_')
            .reverse.toUpperCase
          val after = body.substring(nc + 1).dropWhile(_.isWhitespace)
          val nextWord = after.takeWhile(c => c.isLetterOrDigit || c == '_').toUpperCase
          prevWord == "FROM" || prevWord == "JOIN" ||
            (before.nonEmpty && before.head == ',') || nextWord == "AS"
        }
        for (item <- items if !own.exists(_.equalsIgnoreCase(item.alias))) {
          val a = item.alias
          val aRef = ("(?i)\\b" + java.util.regex.Pattern.quote(a) + "\\s*\\.").r
          val deepRef = nested.exists { case (no, nc) =>
            aRef.findFirstIn(body.substring(no, nc + 1)).isDefined
          }
          if (deepRef) {
            val colRe = ("(?i)\\b" + java.util.regex.Pattern.quote(a) + "\\s*\\.\\s*(\\w+)").r
            val corrCols = colRe.findAllMatchIn(body).map(_.group(1)).toSeq
              .foldLeft(Vector.empty[String]) { (acc, c) =>
                if (acc.exists(_.equalsIgnoreCase(c))) acc else acc :+ c
              }
            if (corrCols.nonEmpty) {
              val divA = "__div"
              val body2 = aRef.replaceAllIn(body, s"$divA.")
              val bFrom = topLevelIndexOf(body2, "FROM")
              if (bFrom >= 0) {
                val derived = s"(SELECT DISTINCT ${corrCols.map(c => s"$a.$c").mkString(", ")} " +
                  s"FROM ${item.text}) $divA"
                val withDiv = body2.substring(0, bFrom + 4) + " " + derived + ", " +
                  body2.substring(bFrom + 4).dropWhile(_.isWhitespace)
                val conj = corrCols.map(c => s"$divA.$c <=> $a.$c").mkString(" AND ")
                val bw = topLevelIndexOf(withDiv, "WHERE")
                val newBody =
                  if (bw >= 0) {
                    val bwEnd = clauseEndFrom(withDiv, bw + 5)
                    withDiv.substring(0, bw) +
                      s"WHERE (${withDiv.substring(bw + 5, bwEnd).trim}) AND $conj" +
                      withDiv.substring(bwEnd)
                  } else {
                    val end = clauseEndFrom(withDiv, bFrom + 4)
                    withDiv.substring(0, end) + s" WHERE $conj" + withDiv.substring(end)
                  }
                val newWhere = whereText.substring(0, open + 1) + newBody +
                  whereText.substring(close)
                return flattenDivision(
                  sql.substring(0, ws._1 + 5) + newWhere + sql.substring(ws._2))
              }
            }
          }
        }
      }
    }
    sql
  }

  def pgNullOrder(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inStr = false
    val up = sql.toUpperCase
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (!inStr && up.regionMatches(i, "ORDER BY", 0, 8)) {
        sb.append(sql.substring(i, i + 8)); i += 8
        // collect the clause: up to depth-(-1) close paren or top-level LIMIT
        val start = i
        var depth = 0
        var end = sql.length
        var j = i
        var s2 = false
        while (j < sql.length && end == sql.length) {
          val ch = sql.charAt(j)
          if (s2) { if (ch == '\'') s2 = false }
          else ch match {
            case '\'' => s2 = true
            case '(' => depth += 1
            case ')' => if (depth == 0) end = j else depth -= 1
            case _ =>
              def wordAt(w: String): Boolean =
                up.regionMatches(j, w, 0, w.length) &&
                  (j == 0 || sql.charAt(j - 1).isWhitespace) &&
                  (j + w.length >= sql.length || !sql.charAt(j + w.length).isLetterOrDigit)
              // a window ORDER BY ends at its frame clause (ROWS/RANGE/
              // GROUPS BETWEEN|UNBOUNDED|CURRENT|n ...)
              def frameAt: Boolean =
                (wordAt("ROWS") || wordAt("RANGE") || wordAt("GROUPS")) && {
                  var k = j
                  while (k < sql.length && !sql.charAt(k).isWhitespace) k += 1
                  while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
                  up.regionMatches(k, "BETWEEN", 0, 7) ||
                    up.regionMatches(k, "UNBOUNDED", 0, 9) ||
                    up.regionMatches(k, "CURRENT", 0, 7) ||
                    (k < sql.length && sql.charAt(k).isDigit)
                }
              if (depth == 0 && (wordAt("LIMIT") || wordAt("OFFSET") ||
                frameAt || sql.startsWith("|>", j))) end = j
          }
          j += 1
        }
        val clause = sql.substring(start, end)
        val items = PipeSql.splitTop(clause, ",").map { item =>
          val t = item.trim
          // insert before any trailing whitespace so the next token (e.g. a
          // newline-separated LIMIT) stays separated
          val core = item.replaceAll("\\s+$", "")
          val trail = item.substring(core.length)
          if (t.isEmpty || t.toUpperCase.contains("NULLS")) item
          else if (t.toUpperCase.endsWith("DESC")) core + " NULLS FIRST" + trail
          else core + " NULLS LAST" + trail
        }
        sb.append(items.mkString(","))
        i = end
      } else {
        if (inStr) { if (c == '\'') inStr = false }
        else if (c == '\'') inStr = true
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }
}
