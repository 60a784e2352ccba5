package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.time.LocalDate

/** Minimal Python interpreter for the reference's `LANGUAGE python` UDF
  * surface (reference PyInterpOps.td:34-76; scored by
  * test/sqlite-small-python/python-udfs.test).
  *
  * The reference embeds CPython and interprets the function body per row
  * (py_interp bridge); this container has no Python runtime on the executor
  * path, so the same subset is interpreted on the JVM: def-functions with
  * assignments (including parallel tuple assignment `a, b = b, a`),
  * `for ... in range(...)`, `for x in <expr>` over list values, `if/else`,
  * `return`, list literals `[..]`, subscripts with Python negative-index
  * semantics, arithmetic with Python semantics (`/` is float division,
  * `//` floors, int×int stays int), comparisons,
  * `len`/`int`/`float`/`abs`/`str` builtins (len covers strings and lists),
  * string methods (upper/lower/strip/startswith/endswith/replace), and date
  * attributes (year/month/day). The exact accepted grammar is documented in
  * [[graft.sqlsurface.UdfSurface]].
  *
  * Deliberately interpreted, not codegen'd: an external-language UDF is
  * opaque to Catalyst in the reference too (SURVEY §2.7 — same stance as
  * the multimodal decode stub). NULL inputs short-circuit to NULL without
  * entering the interpreter, matching the reference's null propagation
  * (python-udfs.test py-9).
  */
object PyInterp {

  // ----------------------------------------------------------------- AST

  sealed trait PExpr
  private final case class PInt(v: Long) extends PExpr
  private final case class PFloat(v: Double) extends PExpr
  private final case class PStr(v: String) extends PExpr
  private final case class PBool(v: Boolean) extends PExpr
  private case object PNone extends PExpr
  private final case class PName(n: String) extends PExpr
  private final case class PBin(op: String, l: PExpr, r: PExpr) extends PExpr
  private final case class PUnary(op: String, e: PExpr) extends PExpr
  private final case class PCall(fn: PExpr, args: Seq[PExpr]) extends PExpr
  private final case class PAttr(e: PExpr, name: String) extends PExpr
  private final case class PList(items: Seq[PExpr]) extends PExpr
  private final case class PIndex(e: PExpr, idx: PExpr) extends PExpr

  sealed trait PStmt
  private final case class PReturn(e: PExpr) extends PStmt
  private final case class PAssign(name: String, e: PExpr) extends PStmt
  private final case class PTupleAssign(names: Seq[String], rhs: Seq[PExpr]) extends PStmt
  private final case class PAugAssign(name: String, op: String, e: PExpr) extends PStmt
  private final case class PFor(v: String, range: Seq[PExpr], body: Seq[PStmt]) extends PStmt
  private final case class PForIn(v: String, iter: PExpr, body: Seq[PStmt]) extends PStmt
  private final case class PIf(cond: PExpr, thn: Seq[PStmt], els: Seq[PStmt]) extends PStmt
  private final case class PExprStmt(e: PExpr) extends PStmt

  final case class PyFunc(name: String, params: Seq[String], body: Seq[PStmt])

  // ----------------------------------------------------------- tokenizer

  private final class Lexer(src: String) {
    private var i = 0
    var tok: String = _
    advance()
    def advance(): Unit = {
      while (i < src.length && (src.charAt(i) == ' ' || src.charAt(i) == '\t')) i += 1
      if (i >= src.length) { tok = null; return }
      val c = src.charAt(i)
      if (c.isDigit || (c == '.' && i + 1 < src.length && src.charAt(i + 1).isDigit)) {
        val s = i
        while (i < src.length && (src.charAt(i).isDigit || src.charAt(i) == '.')) i += 1
        tok = src.substring(s, i)
      } else if (c.isLetter || c == '_') {
        val s = i
        while (i < src.length && (src.charAt(i).isLetterOrDigit || src.charAt(i) == '_')) i += 1
        tok = src.substring(s, i)
      } else if (c == '\'' || c == '"') {
        val s = i; i += 1
        while (i < src.length && src.charAt(i) != c) i += 1
        i += 1
        tok = src.substring(s, i)
      } else {
        val two = if (i + 1 < src.length) src.substring(i, i + 2) else ""
        if (Set("==", "!=", "<=", ">=", "//", "**")(two)) { tok = two; i += 2 }
        else { tok = c.toString; i += 1 }
      }
    }
    def eat(expected: String): Unit = {
      require(tok == expected, s"py parse: expected '$expected', got '$tok' in: $src")
      advance()
    }
  }

  // ----------------------------------------------------- expression parse

  private def parseExpr(lx: Lexer): PExpr = parseCmp(lx)

  private def parseCmp(lx: Lexer): PExpr = {
    var l = parseAdd(lx)
    while (lx.tok != null && Set("==", "!=", "<", "<=", ">", ">=")(lx.tok)) {
      val op = lx.tok; lx.advance()
      l = PBin(op, l, parseAdd(lx))
    }
    l
  }

  private def parseAdd(lx: Lexer): PExpr = {
    var l = parseMul(lx)
    while (lx.tok == "+" || lx.tok == "-") {
      val op = lx.tok; lx.advance()
      l = PBin(op, l, parseMul(lx))
    }
    l
  }

  private def parseMul(lx: Lexer): PExpr = {
    var l = parseUnary(lx)
    while (lx.tok != null && Set("*", "/", "%", "//", "**")(lx.tok)) {
      val op = lx.tok; lx.advance()
      l = PBin(op, l, parseUnary(lx))
    }
    l
  }

  private def parseUnary(lx: Lexer): PExpr =
    if (lx.tok == "-") { lx.advance(); PUnary("-", parseUnary(lx)) }
    else if (lx.tok == "not") { lx.advance(); PUnary("not", parseUnary(lx)) }
    else parsePostfix(lx)

  private def parsePostfix(lx: Lexer): PExpr = {
    var e = parseAtom(lx)
    var done = false
    while (!done) lx.tok match {
      case "." =>
        lx.advance()
        val name = lx.tok; lx.advance()
        e = PAttr(e, name)
      case "(" =>
        lx.advance()
        val args = scala.collection.mutable.ArrayBuffer.empty[PExpr]
        if (lx.tok != ")") {
          args += parseExpr(lx)
          while (lx.tok == ",") { lx.advance(); args += parseExpr(lx) }
        }
        lx.eat(")")
        e = PCall(e, args.toSeq)
      case "[" =>
        lx.advance()
        val idx = parseExpr(lx)
        lx.eat("]")
        e = PIndex(e, idx)
      case _ => done = true
    }
    e
  }

  private def parseAtom(lx: Lexer): PExpr = {
    val t = lx.tok
    require(t != null, "py parse: unexpected end of expression")
    if (t == "(") { lx.advance(); val e = parseExpr(lx); lx.eat(")"); e }
    else if (t == "[") {
      lx.advance()
      val items = scala.collection.mutable.ArrayBuffer.empty[PExpr]
      if (lx.tok != "]") {
        items += parseExpr(lx)
        while (lx.tok == ",") { lx.advance(); items += parseExpr(lx) }
      }
      lx.eat("]")
      PList(items.toSeq)
    }
    else if (t.head.isDigit || t.head == '.') {
      lx.advance()
      if (t.contains('.')) PFloat(t.toDouble) else PInt(t.toLong)
    }
    else if (t.head == '\'' || t.head == '"') { lx.advance(); PStr(t.substring(1, t.length - 1)) }
    else if (t == "True") { lx.advance(); PBool(true) }
    else if (t == "False") { lx.advance(); PBool(false) }
    else if (t == "None") { lx.advance(); PNone }
    else { lx.advance(); PName(t) }
  }

  private def exprOf(s: String): PExpr = {
    val lx = new Lexer(s)
    val e = parseExpr(lx)
    require(lx.tok == null, s"py parse: trailing '${lx.tok}' in: $s")
    e
  }

  // ------------------------------------------------------ block parsing

  private def indentOf(line: String): Int = line.takeWhile(c => c == ' ' || c == '\t')
    .map(c => if (c == '\t') 8 else 1).sum

  /** Parse statements at one indent level; recursion handles nested blocks. */
  private def parseBlock(lines: Seq[String], pos: Int, indent: Int): (Seq[PStmt], Int) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[PStmt]
    var p = pos
    while (p < lines.length) {
      val line = lines(p)
      val ind = indentOf(line)
      val t = line.trim
      if (t.isEmpty || t.startsWith("#")) p += 1
      else if (ind < indent) return (out.toSeq, p)
      else {
        require(ind == indent, s"py parse: bad indent at '$t'")
        if (t.startsWith("return")) {
          out += PReturn(exprOf(t.stripPrefix("return").trim match {
            case "" => "None"; case e => e
          }))
          p += 1
        } else if (t.startsWith("for ")) {
          val (body, np) = parseBlock(lines, p + 1, nextIndent(lines, p + 1, indent))
          "^for\\s+(\\w+)\\s+in\\s+range\\s*\\((.*)\\)\\s*:$".r.findFirstMatchIn(t) match {
            case Some(m) =>
              out += PFor(m.group(1), splitArgs(m.group(2)).map(exprOf), body)
            case None =>
              val m = "^for\\s+(\\w+)\\s+in\\s+(.*?)\\s*:$".r.findFirstMatchIn(t)
                .getOrElse(throw new IllegalArgumentException(s"py parse: unsupported for: $t"))
              out += PForIn(m.group(1), exprOf(m.group(2)), body)
          }
          p = np
        } else if (t.startsWith("if ") && t.endsWith(":")) {
          val cond = exprOf(t.substring(3, t.length - 1).trim)
          val (thn, np) = parseBlock(lines, p + 1, nextIndent(lines, p + 1, indent))
          var p2 = np
          var els: Seq[PStmt] = Nil
          if (p2 < lines.length && lines(p2).trim == "else:" &&
            indentOf(lines(p2)) == indent) {
            val (e, np2) = parseBlock(lines, p2 + 1, nextIndent(lines, p2 + 1, indent))
            els = e; p2 = np2
          }
          out += PIf(cond, thn, els)
          p = p2
        } else {
          val aug = "^(\\w+)\\s*(\\+|-|\\*|/)=\\s*(.*)$".r
          val tup = "^(\\w+(?:\\s*,\\s*\\w+)+)\\s*=\\s*([^=].*)$".r
          val asn = "^(\\w+)\\s*=\\s*(.*)$".r
          t match {
            case aug(n, op, e) => out += PAugAssign(n, op, exprOf(e))
            case tup(ns, e) =>
              // parallel assignment: RHS fully evaluates before any binding
              out += PTupleAssign(ns.split(",").map(_.trim).toSeq,
                splitArgs(e).map(exprOf))
            case asn(n, e) if !e.startsWith("=") => out += PAssign(n, exprOf(e))
            case _ => out += PExprStmt(exprOf(t))
          }
          p += 1
        }
      }
    }
    (out.toSeq, p)
  }

  private def nextIndent(lines: Seq[String], pos: Int, outer: Int): Int = {
    var p = pos
    while (p < lines.length && lines(p).trim.isEmpty) p += 1
    require(p < lines.length && indentOf(lines(p)) > outer, "py parse: missing block body")
    indentOf(lines(p))
  }

  private def splitArgs(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var start = 0
    for (i <- s.indices) s.charAt(i) match {
      case '(' | '[' => depth += 1
      case ')' | ']' => depth -= 1
      case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
      case _ =>
    }
    if (s.trim.nonEmpty) out += s.substring(start)
    out.toSeq.map(_.trim)
  }

  /** Parse a `def f(a, b): ...` body into a callable function. */
  def parse(src: String): PyFunc = {
    val lines = src.linesIterator.toSeq.dropWhile(_.trim.isEmpty)
    require(lines.nonEmpty, "py parse: empty body")
    val defRe = "^def\\s+(\\w+)\\s*\\(([^)]*)\\)\\s*:\\s*$".r
    val m = defRe.findFirstMatchIn(lines.head.trim).getOrElse(
      throw new IllegalArgumentException(s"py parse: expected def, got: ${lines.head}"))
    val params = m.group(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val (body, _) = parseBlock(lines.tail, 0, nextIndent(lines.tail, 0, -1))
    PyFunc(m.group(1), params, body)
  }

  // ------------------------------------------------------------ evaluate

  /** Non-stack-filling control-flow exception; one instance per call so
    * concurrent executor threads never share state. */
  private final class ReturnException(val value: Any)
    extends Exception(null, null, false, false)

  def call(fn: PyFunc, args: Seq[Any]): Any = {
    val env = scala.collection.mutable.HashMap.empty[String, Any]
    fn.params.zip(args).foreach { case (p, v) => env(p) = v }
    try { exec(fn.body, env); null }
    catch { case r: ReturnException => r.value }
  }

  private def exec(stmts: Seq[PStmt], env: scala.collection.mutable.HashMap[String, Any]): Unit =
    stmts.foreach {
      case PReturn(e) =>
        throw new ReturnException(eval(e, env))
      case PAssign(n, e) => env(n) = eval(e, env)
      case PTupleAssign(names, rhs) =>
        // Python semantics: the whole RHS evaluates before any name binds,
        // so `a, b = b, a` swaps.
        val vals =
          if (rhs.size == 1) eval(rhs.head, env) match {
            case seq: Seq[_] => seq
            case other => throw new IllegalArgumentException(s"py: cannot unpack $other")
          } else rhs.map(eval(_, env))
        require(vals.size == names.size,
          s"py: cannot unpack ${vals.size} values into ${names.size} names")
        names.zip(vals).foreach { case (n, v) => env(n) = v }
      case PAugAssign(n, op, e) => env(n) = binop(op, env(n), eval(e, env))
      case PFor(v, rangeArgs, body) =>
        val nums = rangeArgs.map(a => asLong(eval(a, env)))
        val (from, until, step) = nums match {
          case Seq(u) => (0L, u, 1L)
          case Seq(f, u) => (f, u, 1L)
          case Seq(f, u, s) => (f, u, s)
          case _ => throw new IllegalArgumentException("py: bad range()")
        }
        var i = from
        while (if (step > 0) i < until else i > until) {
          env(v) = i
          exec(body, env)
          i += step
        }
      case PForIn(v, iter, body) =>
        val vals = eval(iter, env) match {
          case seq: Seq[_] => seq
          case s: String => s.map(_.toString)
          case other => throw new IllegalArgumentException(s"py: not iterable: $other")
        }
        vals.foreach { x => env(v) = x; exec(body, env) }
      case PIf(c, t, e) =>
        if (truthy(eval(c, env))) exec(t, env) else exec(e, env)
      case PExprStmt(e) => eval(e, env)
    }

  private def truthy(v: Any): Boolean = v match {
    case b: Boolean => b
    case l: Long => l != 0
    case d: Double => d != 0.0
    case s: String => s.nonEmpty
    case null => false
    case _ => true
  }

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case d: Double => d.toLong
    case b: Boolean => if (b) 1L else 0L
    case other => throw new IllegalArgumentException(s"py: not an int: $other")
  }

  private def num2(l: Any, r: Any): Either[(Long, Long), (Double, Double)] = (l, r) match {
    case (a: Long, b: Long) => Left((a, b))
    case (a: Double, b: Double) => Right((a, b))
    case (a: Long, b: Double) => Right((a.toDouble, b))
    case (a: Double, b: Long) => Right((a, b.toDouble))
    case (a: Boolean, b) => num2(asLong(a), b)
    case (a, b: Boolean) => num2(a, asLong(b))
    case _ => throw new IllegalArgumentException(s"py: bad numeric operands: $l, $r")
  }

  private def binop(op: String, l: Any, r: Any): Any = (op, l, r) match {
    case ("+", a: String, b: String) => a + b
    case ("*", a: String, b: Long) => a * b.toInt
    case ("==", _, _) => pyEq(l, r)
    case ("!=", _, _) => !pyEq(l, r)
    case ("<", _, _) | ("<=", _, _) | (">", _, _) | (">=", _, _) =>
      (l, r) match {
        case (a: String, b: String) =>
          val c = a.compareTo(b)
          op match { case "<" => c < 0; case "<=" => c <= 0; case ">" => c > 0; case _ => c >= 0 }
        case _ => num2(l, r) match {
          case Left((a, b)) =>
            op match { case "<" => a < b; case "<=" => a <= b; case ">" => a > b; case _ => a >= b }
          case Right((a, b)) =>
            op match { case "<" => a < b; case "<=" => a <= b; case ">" => a > b; case _ => a >= b }
        }
      }
    case ("/", _, _) => // Python 3: true division is always float
      num2(l, r) match {
        case Left((a, b)) => a.toDouble / b
        case Right((a, b)) => a / b
      }
    case ("//", _, _) =>
      num2(l, r) match {
        case Left((a, b)) => Math.floorDiv(a, b)
        case Right((a, b)) => Math.floor(a / b)
      }
    case _ =>
      num2(l, r) match {
        case Left((a, b)) => op match {
          case "+" => a + b
          case "-" => a - b
          case "*" => a * b
          case "%" => Math.floorMod(a, b) // Python % follows divisor sign
          case "**" => math.pow(a.toDouble, b.toDouble) match {
            case d if d.isWhole && d.abs < 9e15 => d.toLong
            case d => d
          }
        }
        case Right((a, b)) => op match {
          case "+" => a + b
          case "-" => a - b
          case "*" => a * b
          case "%" => { val m = a % b; if (m != 0 && (m < 0) != (b < 0)) m + b else m }
          case "**" => math.pow(a, b)
        }
      }
  }

  private def pyEq(l: Any, r: Any): Boolean = (l, r) match {
    case (a: String, b: String) => a == b
    case (a: Boolean, b: Boolean) => a == b
    case (null, null) => true
    case (null, _) | (_, null) => false
    case _ => num2(l, r) match {
      case Left((a, b)) => a == b
      case Right((a, b)) => a == b
    }
  }

  private def eval(e: PExpr, env: scala.collection.mutable.HashMap[String, Any]): Any = e match {
    case PInt(v) => v
    case PFloat(v) => v
    case PStr(v) => v
    case PBool(v) => v
    case PNone => null
    case PName(n) => env.getOrElse(n,
      throw new IllegalArgumentException(s"py: undefined name '$n'"))
    case PUnary("-", x) => eval(x, env) match {
      case l: Long => -l
      case d: Double => -d
      case other => throw new IllegalArgumentException(s"py: cannot negate $other")
    }
    case PUnary("not", x) => !truthy(eval(x, env))
    case PUnary(op, _) => throw new IllegalArgumentException(s"py: unary $op")
    case PBin(op, l, r) => binop(op, eval(l, env), eval(r, env))
    case PAttr(x, name) => (eval(x, env), name) match {
      case (d: LocalDate, "year") => d.getYear.toLong
      case (d: LocalDate, "month") => d.getMonthValue.toLong
      case (d: LocalDate, "day") => d.getDayOfMonth.toLong
      case (v, n) => BoundMethod(v, n) // resolved at call time
    }
    case PList(items) => items.map(eval(_, env)).toVector
    case PIndex(x, ix) =>
      val i = asLong(eval(ix, env)).toInt
      eval(x, env) match {
        case s: String =>
          val j = if (i < 0) s.length + i else i
          require(j >= 0 && j < s.length, s"py: string index $i out of range")
          s.charAt(j).toString
        case seq: Seq[_] =>
          val j = if (i < 0) seq.size + i else i
          require(j >= 0 && j < seq.size, s"py: list index $i out of range")
          seq(j)
        case other => throw new IllegalArgumentException(s"py: cannot index $other")
      }
    case PCall(PName("len"), Seq(a)) => eval(a, env) match {
      case s: String => s.length.toLong
      case seq: Seq[_] => seq.size.toLong
      case other => throw new IllegalArgumentException(s"py: len($other)")
    }
    case PCall(PName("int"), Seq(a)) => eval(a, env) match {
      case l: Long => l
      case d: Double => d.toLong
      case s: String => s.trim.toLong
      case b: Boolean => asLong(b)
      case other => throw new IllegalArgumentException(s"py: int($other)")
    }
    case PCall(PName("float"), Seq(a)) => eval(a, env) match {
      case l: Long => l.toDouble
      case d: Double => d
      case s: String => s.trim.toDouble
      case other => throw new IllegalArgumentException(s"py: float($other)")
    }
    case PCall(PName("abs"), Seq(a)) => eval(a, env) match {
      case l: Long => Math.abs(l)
      case d: Double => Math.abs(d)
      case other => throw new IllegalArgumentException(s"py: abs($other)")
    }
    case PCall(PName("str"), Seq(a)) => eval(a, env) match {
      case d: Double if d.isWhole => d.toLong.toString + ".0"
      case v => String.valueOf(v)
    }
    case PCall(f, args) => eval(f, env) match {
      case BoundMethod(recv, name) => callMethod(recv, name, args.map(eval(_, env)))
      case other => throw new IllegalArgumentException(s"py: not callable: $other")
    }
  }

  private final case class BoundMethod(recv: Any, name: String)

  private def callMethod(recv: Any, name: String, args: Seq[Any]): Any = (recv, name) match {
    case (s: String, "upper") => s.toUpperCase
    case (s: String, "lower") => s.toLowerCase
    case (s: String, "strip") => s.trim
    case (s: String, "startswith") => s.startsWith(args.head.asInstanceOf[String])
    case (s: String, "endswith") => s.endsWith(args.head.asInstanceOf[String])
    case (s: String, "replace") =>
      s.replace(args(0).asInstanceOf[String], args(1).asInstanceOf[String])
    case _ => throw new IllegalArgumentException(s"py: no method $name on $recv")
  }
}

/** Catalyst expression wrapping an interpreted Python UDF. NULL-strict and
  * deliberately non-codegen (CodegenFallback) — the reference's py_interp
  * call is equally opaque to its optimizer. */
case class PyUdfExpression(fn: PyInterp.PyFunc, retType: DataType,
    children: Seq[Expression]) extends Expression with CodegenFallback {

  override def nullable: Boolean = true
  override def dataType: DataType = retType

  override def eval(input: InternalRow): Any = {
    val raw = children.map(_.eval(input))
    if (raw.contains(null)) return null // reference null propagation (py-9)
    val args = raw.zip(children).map { case (v, c) => toPy(v, c.dataType) }
    fromPy(PyInterp.call(fn, args))
  }

  private def toPy(v: Any, dt: DataType): Any = dt match {
    case StringType => v.asInstanceOf[UTF8String].toString
    case DateType => LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong)
    case IntegerType => v.asInstanceOf[Int].toLong
    case ShortType => v.asInstanceOf[Short].toLong
    case ByteType => v.asInstanceOf[Byte].toLong
    case FloatType => v.asInstanceOf[Float].toDouble
    case _ => v
  }

  private def fromPy(v: Any): Any = (v, retType) match {
    case (null, _) => null
    case (l: Long, IntegerType) => l.toInt
    case (d: Double, IntegerType) => d.toInt
    case (l: Long, LongType) => l
    case (d: Double, LongType) => d.toLong
    case (l: Long, DoubleType) => l.toDouble
    case (d: Double, DoubleType) => d
    case (b: Boolean, BooleanType) => b
    case (s: String, StringType) => UTF8String.fromString(s)
    case (v2, StringType) => UTF8String.fromString(String.valueOf(v2))
    case (d: LocalDate, DateType) => d.toEpochDay.toInt
    case (b: Boolean, IntegerType) => if (b) 1 else 0
    case other =>
      throw new IllegalArgumentException(s"py: cannot convert $other to $retType")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
