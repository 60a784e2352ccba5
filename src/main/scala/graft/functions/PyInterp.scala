package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.time.LocalDate
import scala.collection.mutable.{ArrayBuffer, HashMap, LinkedHashMap}

/** Structured-Python interpreter for the reference's `LANGUAGE python` UDF
  * surface (reference PyInterpOps.td:34-76; scored by
  * test/sqlite-small-python/python-udfs.test).
  *
  * The reference embeds CPython and interprets the function body per row
  * (py_interp bridge); this container has no Python runtime on the executor
  * path, so a substantial structured subset is interpreted on the JVM:
  *
  *   - statements: `def` (several per body, helpers + recursion, default
  *     args, annotations stripped), assignment (plain / parallel-tuple /
  *     augmented / subscript), `if`/`elif`/`else`, `for` over
  *     range/list/tuple/string/dict (with tuple targets), `while`,
  *     `break`/`continue`/`pass`/`return`, module-level constants,
  *     `import math` / `from math import f`;
  *   - expressions: Python arithmetic (`/` float, `//` floors, `%` follows
  *     the divisor, int×int stays int), chained comparisons
  *     (`a < b <= c`), `and`/`or` returning the operand (short-circuit),
  *     `not`, `in`/`not in`, `is (not)` None, ternary `x if c else y`,
  *     slicing `s[a:b:c]` with Python clamping, list/tuple/dict literals,
  *     list comprehensions and bare generator expressions (in `sum(...)`
  *     etc.), f-strings with `{expr}` / `{expr:.Nf}`;
  *   - values: int/float/bool/str/None, mutable lists, tuples, dicts
  *     (insertion-ordered), `range` objects;
  *   - builtins: len int float str bool abs min max sum round (half-even)
  *     sorted reversed list tuple dict range enumerate zip any all ord chr;
  *   - methods: strings (upper lower strip lstrip rstrip startswith
  *     endswith replace split join find rfind count index isdigit isalpha
  *     isalnum isspace zfill capitalize title format), lists (append pop
  *     insert extend remove index count sort reverse copy), dicts (get
  *     keys values items pop setdefault update copy), `math.*`
  *     (sqrt floor ceil log log2 log10 exp pow sin cos tan asin acos atan
  *     atan2 fabs hypot fmod trunc isnan isinf degrees radians gcd
  *     copysign + pi/e/inf/nan/tau), date `.year/.month/.day`.
  *
  * Also supported: `lambda` expressions (read-only capture of the defining
  * frame), keyword arguments and defaults on user defs (`f(1, c=9)`), a
  * trailing `*args` vararg and call-site splat (`f(*xs)`),
  * `sorted/min/max(..., key=f[, reverse=b])`, bitwise `| & ^ << >>` with
  * Python precedence, `%` string formatting (`'%s=%d' % (k, v)`),
  * `map`/`filter` (eager), `isinstance`, raw strings (`r'\d+'`),
  * `try/except [Exc[, Exc…]] [as e]/else/finally` with `raise Name('msg')`
  * — except-matching is by exception NAME against the interpreter's typed
  * errors (ValueError/KeyError/IndexError/TypeError/ZeroDivisionError/
  * AttributeError); errors the interpreter can't classify match only bare
  * `except` / `except Exception`. Module globals are evaluated once per
  * top-level call and shared with helper frames (mutable globals behave
  * like CPython within one call; state does NOT persist across rows — each
  * row is an independent module execution, the only order-independent
  * semantics on a partitioned engine).
  *
  * Modules: `import math` (full function/constant table above),
  * `import re` (search/match/fullmatch/findall/split/sub/subn/escape,
  * match objects with group/groups/groupdict/start/end/span, IGNORECASE/
  * MULTILINE/DOTALL flags, `(?P<name>…)` groups, string or callable
  * replacements with `\1`/`\g<name>` templates, compiled-pattern cache),
  * `from collections import Counter, defaultdict` (most_common/update;
  * int/list/lambda factories), `from functools import reduce`, and
  * `from itertools import chain, product (incl. repeat=), combinations,
  * permutations (positional semantics — equal elements not deduped),
  * accumulate, islice, repeat, count, cycle, groupby (consecutive runs,
  * key=)` — finite combinators eager, count/cycle/argless-repeat true
  * lazy generators (round 10).
  *
  * Classes: module-level `class Name[(Base)]:` with `__init__`, methods,
  * instance attributes (read/write/augmented), simple class-level
  * constants (evaluated per instantiation), single inheritance with
  * method/attr lookup through the base chain and subclass-aware
  * `isinstance` (round 9), zero-arg and argful `super()` (rounds 9/10).
  * No dunder protocol beyond `__init__`.
  *
  * Round 9 additions: nested `def` → closures over the defining frame
  * (live reads by reference; assignment is local per CPython unless
  * declared `nonlocal`, which writes through — counters/accumulators
  * work), `**kwargs` parameters (unmatched keywords collect into a dict),
  * class inheritance as above, `yield` statements, plus
  * `global` declarations (module-env write-through; module state still
  * resets per row), call-site `**d` splat, and zero-arg `super()`
  * (base-method/initializer dispatch from an override).
  *
  * Round 10: generators are LAZY ([[LazyGen]] — no body code at call time,
  * strict-alternation coroutine per generator object), so `next(gen)`,
  * `zip(gen, range(n))` early exits and large-range generators don't
  * materialize; StopIteration/spent-generator semantics match CPython,
  * and a fully-consumed infinite generator hits a 10M-yield budget
  * instead of hanging the executor. Coroutine protocol: `x = yield v`
  * receive points and `gen.send(v)` (TypeError on a non-None send to a
  * just-started generator, StopIteration at exhaustion). Argful
  * `super(C, self)`. UnboundLocalError: a name assigned anywhere in a
  * def (and not declared global/nonlocal) is a LOCAL, and reading it
  * before its first binding raises with CPython 3.11's wording instead
  * of leaking the enclosing binding ([[PyFunc.localNames]] — closes the
  * dynamic-env divergence documented in rounds 8-9).
  *
  * Out of scope (rejected with a clear parse error, documented in
  * COVERAGE.md known-gaps): `gen.throw`, parenthesized yield expressions
  * outside assignment RHS, imports beyond math/re/collections. The exact
  * accepted grammar is documented in [[graft.sqlsurface.UdfSurface]].
  *
  * Deliberately interpreted, not codegen'd: an external-language UDF is
  * opaque to Catalyst in the reference too (SURVEY §2.7). NULL inputs
  * short-circuit to NULL without entering the interpreter, matching the
  * reference's null propagation (python-udfs.test py-9).
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
  private final case class PCompare(first: PExpr, ops: Seq[String], rest: Seq[PExpr]) extends PExpr
  private final case class PBoolOp(op: String, parts: Seq[PExpr]) extends PExpr
  private final case class PUnary(op: String, e: PExpr) extends PExpr
  private final case class PCall(fn: PExpr, args: Seq[PExpr]) extends PExpr
  private final case class PAttr(e: PExpr, name: String) extends PExpr
  private final case class PList(items: Seq[PExpr]) extends PExpr
  private final case class PTuple(items: Seq[PExpr]) extends PExpr
  private final case class PDict(keys: Seq[PExpr], vals: Seq[PExpr]) extends PExpr
  private final case class PIndex(e: PExpr, idx: PExpr) extends PExpr
  private final case class PSliceIdx(e: PExpr, lo: Option[PExpr], hi: Option[PExpr],
      step: Option[PExpr]) extends PExpr
  private final case class PTernary(cond: PExpr, thn: PExpr, els: PExpr) extends PExpr
  private sealed trait CompClause
  private final case class CFor(names: Seq[String], iter: PExpr) extends CompClause
  private final case class CIf(cond: PExpr) extends CompClause
  /** list comprehension / generator expression */
  private final case class PComp(elem: PExpr, clauses: Seq[CompClause]) extends PExpr
  /** f-string: Left(literal) | Right((expr, formatSpec)) */
  private final case class PFStr(parts: Seq[Either[String, (PExpr, String)]]) extends PExpr
  private final case class PLambda(params: Seq[String], body: PExpr) extends PExpr
  /** Call-site keyword argument (`f(x, key=v)`); only ever a direct
    * child of PCall args. */
  private final case class PKw(name: String, value: PExpr) extends PExpr
  /** Call-site iterable splat (`f(*xs)`); only ever a direct child of
    * PCall args — expanded into positionals at evaluation time. */
  private final case class PStar(value: PExpr) extends PExpr
  /** Call-site dict splat (`f(**d)`); expanded into keyword arguments at
    * evaluation time (round 9). */
  private final case class PKwStar(value: PExpr) extends PExpr
  /** `x = yield v` RHS (round 10): suspends the generator handing `v` to
    * the consumer; evaluates to what the consumer passed to `gen.send`
    * (None for a plain `next`). Only the assignment-RHS position is
    * parsed — the general parenthesized-yield expression is not. */
  private final case class PYieldExpr(e: PExpr) extends PExpr

  sealed trait PStmt
  private final case class PReturn(e: PExpr) extends PStmt
  private final case class PAssign(name: String, e: PExpr) extends PStmt
  private final case class PTupleAssign(names: Seq[String], rhs: Seq[PExpr]) extends PStmt
  private final case class PAugAssign(name: String, op: String, e: PExpr) extends PStmt
  private final case class PIndexAssign(target: PExpr, idx: PExpr, e: PExpr,
      augOp: Option[String]) extends PStmt
  private final case class PFor(names: Seq[String], iter: PExpr, body: Seq[PStmt]) extends PStmt
  private final case class PWhile(cond: PExpr, body: Seq[PStmt]) extends PStmt
  private case object PBreak extends PStmt
  private case object PContinue extends PStmt
  private final case class PIf(cond: PExpr, thn: Seq[PStmt], els: Seq[PStmt]) extends PStmt
  private final case class PExprStmt(e: PExpr) extends PStmt
  /** One `except [Names] [as n]:` handler; empty `kinds` = bare except. */
  private final case class PHandler(kinds: Seq[String], bind: Option[String],
    body: Seq[PStmt])
  private final case class PTry(body: Seq[PStmt], handlers: Seq[PHandler],
    orelse: Seq[PStmt], fin: Seq[PStmt]) extends PStmt
  private final case class PRaise(kind: String, msg: Option[PExpr]) extends PStmt

  private final case class PAttrAssign(target: PExpr, attr: String, e: PExpr,
    augOp: Option[String]) extends PStmt

  final case class PyFunc(name: String, params: Seq[String], body: Seq[PStmt],
      defaults: Map[String, PExpr] = Map.empty,
      defs: Map[String, PyFunc] = Map.empty,
      consts: Seq[PStmt] = Nil,
      vararg: Option[String] = None,
      classes: Map[String, PyClass] = Map.empty,
      imported: Set[String] = Set.empty,
      kwarg: Option[String] = None) {
    /** A def whose own body yields is a generator (nested defs are their
      * own functions and don't count, as in CPython). */
    lazy val isGenerator: Boolean = hasYield(body)
    /** Names CPython's symbol-table pass classifies as locals: any name
      * assigned anywhere in the body (assignment / aug-assign targets,
      * for-loop vars, nested def names, except-as names) that is not
      * declared global/nonlocal. Reading one before its first binding
      * raises UnboundLocalError even when an enclosing binding of the
      * same name exists (round 10 — previously the dynamic-env model
      * leaked the enclosing binding through). */
    lazy val localNames: Set[String] = assignedNames(body)
  }

  private def assignedNames(stmts: Seq[PStmt]): Set[String] = {
    val out = scala.collection.mutable.HashSet.empty[String]
    val declared = scala.collection.mutable.HashSet.empty[String]
    def walk(ss: Seq[PStmt]): Unit = ss.foreach {
      case PAssign(n, _) => out += n
      case PTupleAssign(ns, _) => out ++= ns
      case PAugAssign(n, _, _) => out += n
      case PFor(ns, _, b) => out ++= ns; walk(b)
      case PWhile(_, b) => walk(b)
      case PIf(_, t, e) => walk(t); walk(e)
      case PTry(b, hs, o, f) =>
        walk(b); hs.foreach { h => h.bind.foreach(out += _); walk(h.body) }
        walk(o); walk(f)
      case PDefStmt(fn) => out += fn.name // nested body is its own scope
      case PNonlocal(ns) => declared ++= ns
      case PGlobal(ns) => declared ++= ns
      case _ => ()
    }
    walk(stmts)
    (out -- declared).toSet
  }

  private def hasYield(stmts: Seq[PStmt]): Boolean = stmts.exists {
    case PYield(_) => true
    case PAssign(_, _: PYieldExpr) => true
    case PIf(_, t, e) => hasYield(t) || hasYield(e)
    case PFor(_, _, b) => hasYield(b)
    case PWhile(_, b) => hasYield(b)
    case PTry(b, hs, o, f) =>
      hasYield(b) || hs.exists(h => hasYield(h.body)) || hasYield(o) || hasYield(f)
    case _ => false
  }

  /** `def` nested inside a function body: binds a [[PyClosure]] over the
    * defining frame at execution time (round 9). */
  private final case class PDefStmt(fn: PyFunc) extends PStmt
  /** `nonlocal a, b` — registers write-through names on the closure frame. */
  private final case class PNonlocal(names: Seq[String]) extends PStmt
  /** `yield e` as a statement — hands `e` to the generator's consumer. */
  private final case class PYield(e: PExpr) extends PStmt
  /** `global a, b` — registers module-env write-through names. */
  private final case class PGlobal(names: Seq[String]) extends PStmt

  /** A `class Name[(Base)]:` definition — methods (defs whose first param
    * is `self`) plus simple class-level assignments. Single inheritance
    * (round 9): method/attr lookup walks `parent`; no dunder protocol
    * beyond `__init__` (`super()` — zero-arg and argful — dispatches
    * through [[SuperProxy]]); class attributes are evaluated per
    * instantiation (shared mutable class state is out of scope). */
  final case class PyClass(name: String, methods: Map[String, PyFunc],
    attrs: Seq[PStmt], parent: Option[PyClass] = None) {
    def findMethod(m: String): Option[PyFunc] =
      methods.get(m).orElse(parent.flatMap(_.findMethod(m)))
    /** The method plus the class that DEFINES it (for zero-arg super()). */
    def findMethodOwner(m: String): Option[(PyFunc, PyClass)] =
      methods.get(m).map((_, this)).orElse(parent.flatMap(_.findMethodOwner(m)))
    def isSubclassOf(other: PyClass): Boolean =
      (this eq other) || parent.exists(_.isSubclassOf(other))
    /** Base-first attr statements (child overrides by re-assignment). */
    def allAttrs: Seq[PStmt] = parent.map(_.allAttrs).getOrElse(Nil) ++ attrs
  }

  /** An instance: its class + mutable attribute table. */
  final class PyInstance(val cls: PyClass,
    val attrs: HashMap[String, Any] = HashMap.empty)

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
        while (i < src.length && (src.charAt(i).isDigit || src.charAt(i) == '.' ||
          src.charAt(i) == '_')) i += 1
        tok = src.substring(s, i).replace("_", "")
      } else if (c.isLetter || c == '_') {
        val s = i
        while (i < src.length && (src.charAt(i).isLetterOrDigit || src.charAt(i) == '_')) i += 1
        val ident = src.substring(s, i)
        // f-string / raw-string prefix: the identifier is exactly f/F/r/R
        // and a quote follows
        if ((ident == "f" || ident == "F") && i < src.length &&
          (src.charAt(i) == '\'' || src.charAt(i) == '"')) {
          tok = "f" + readString()
        } else if ((ident == "r" || ident == "R") && i < src.length &&
          (src.charAt(i) == '\'' || src.charAt(i) == '"')) {
          tok = "r" + readString()
        } else tok = ident
      } else if (c == '\'' || c == '"') {
        tok = readString()
      } else {
        val two = if (i + 1 < src.length) src.substring(i, i + 2) else ""
        if (Set("==", "!=", "<=", ">=", "//", "**", "<<", ">>")(two)) { tok = two; i += 2 }
        else { tok = c.toString; i += 1 }
      }
    }
    /** Consume a quoted string (cursor on the quote); keep quotes, keep raw
      * escapes (processed by [[unescape]]). */
    private def readString(): String = {
      val q = src.charAt(i)
      val s = i; i += 1
      while (i < src.length && src.charAt(i) != q) {
        if (src.charAt(i) == '\\' && i + 1 < src.length) i += 2 else i += 1
      }
      i += 1
      src.substring(s, math.min(i, src.length))
    }
    def eat(expected: String): Unit = {
      require(tok == expected, s"py parse: expected '$expected', got '$tok' in: $src")
      advance()
    }
    /** True iff the token AFTER the current one is `expected` (no consume).
      * Lexer state is just (cursor, tok), so save/advance/restore. */
    def peekIs(expected: String): Boolean = {
      val (si, st) = (i, tok)
      advance()
      val r = tok == expected
      i = si; tok = st
      r
    }
  }

  private def unescape(raw: String): String = {
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '\\' && i + 1 < raw.length) {
        raw.charAt(i + 1) match {
          case 'n' => sb.append('\n'); case 't' => sb.append('\t')
          case 'r' => sb.append('\r'); case '\\' => sb.append('\\')
          case '\'' => sb.append('\''); case '"' => sb.append('"')
          case '0' => sb.append('\u0000')
          case o => sb.append('\\').append(o)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ----------------------------------------------------- expression parse
  //
  // Precedence (low→high), matching Python: ternary, or, and, not,
  // comparison (chained, incl. in / not in / is), |,&,^ (unsupported),
  // +,-, *,/,//,%, unary -, **, postfix (call/attr/index), atom.

  private def parseExpr(lx: Lexer): PExpr = {
    if (lx.tok == "lambda") {
      lx.advance()
      val params = ArrayBuffer.empty[String]
      while (lx.tok != ":") {
        params += lx.tok; lx.advance()
        if (lx.tok == ",") lx.advance()
      }
      lx.eat(":")
      return PLambda(params.toSeq, parseExpr(lx))
    }
    val e = parseOr(lx)
    if (lx.tok == "if") {
      lx.advance()
      val cond = parseOr(lx)
      lx.eat("else")
      PTernary(cond, e, parseExpr(lx))
    } else e
  }

  private def parseOr(lx: Lexer): PExpr = {
    var parts = List(parseAnd(lx))
    while (lx.tok == "or") { lx.advance(); parts ::= parseAnd(lx) }
    if (parts.size == 1) parts.head else PBoolOp("or", parts.reverse)
  }

  private def parseAnd(lx: Lexer): PExpr = {
    var parts = List(parseNot(lx))
    while (lx.tok == "and") { lx.advance(); parts ::= parseNot(lx) }
    if (parts.size == 1) parts.head else PBoolOp("and", parts.reverse)
  }

  private def parseNot(lx: Lexer): PExpr =
    if (lx.tok == "not") { lx.advance(); PUnary("not", parseNot(lx)) }
    else parseCmp(lx)

  private def parseCmp(lx: Lexer): PExpr = {
    val first = parseBitOr(lx)
    val ops = ArrayBuffer.empty[String]
    val rest = ArrayBuffer.empty[PExpr]
    var done = false
    while (!done) {
      lx.tok match {
        case "==" | "!=" | "<" | "<=" | ">" | ">=" =>
          val op = lx.tok; lx.advance()
          ops += op; rest += parseBitOr(lx)
        case "in" =>
          lx.advance(); ops += "in"; rest += parseBitOr(lx)
        case "not" => // `not in`
          lx.advance(); lx.eat("in"); ops += "not in"; rest += parseBitOr(lx)
        case "is" =>
          lx.advance()
          if (lx.tok == "not") { lx.advance(); ops += "is not" } else ops += "is"
          rest += parseBitOr(lx)
        case _ => done = true
      }
    }
    if (ops.isEmpty) first else PCompare(first, ops.toSeq, rest.toSeq)
  }

  // Python bitwise precedence: cmp < | < ^ < & < shifts < +/-
  private def parseBitOr(lx: Lexer): PExpr = {
    var l = parseBitXor(lx)
    while (lx.tok == "|") { lx.advance(); l = PBin("|", l, parseBitXor(lx)) }
    l
  }

  private def parseBitXor(lx: Lexer): PExpr = {
    var l = parseBitAnd(lx)
    while (lx.tok == "^") { lx.advance(); l = PBin("^", l, parseBitAnd(lx)) }
    l
  }

  private def parseBitAnd(lx: Lexer): PExpr = {
    var l = parseShift(lx)
    while (lx.tok == "&") { lx.advance(); l = PBin("&", l, parseShift(lx)) }
    l
  }

  private def parseShift(lx: Lexer): PExpr = {
    var l = parseAdd(lx)
    while (lx.tok == "<<" || lx.tok == ">>") {
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
    while (lx.tok != null && Set("*", "/", "%", "//")(lx.tok)) {
      val op = lx.tok; lx.advance()
      l = PBin(op, l, parseUnary(lx))
    }
    l
  }

  private def parseUnary(lx: Lexer): PExpr =
    if (lx.tok == "-") { lx.advance(); PUnary("-", parseUnary(lx)) }
    else if (lx.tok == "+") { lx.advance(); parseUnary(lx) }
    else parsePow(lx)

  private def parsePow(lx: Lexer): PExpr = {
    val base = parsePostfix(lx)
    if (lx.tok == "**") { lx.advance(); PBin("**", base, parseUnary(lx)) } // right-assoc
    else base
  }

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
        val args = ArrayBuffer.empty[PExpr]
        // `name=expr` at argument position is a keyword argument (a lone
        // `=` never appears inside an expression, and `==` lexes as one
        // token, so the peek is unambiguous)
        def parseArg(): PExpr =
          if (lx.tok == "**") { lx.advance(); PKwStar(parseExpr(lx)) }
          else if (lx.tok == "*") { lx.advance(); PStar(parseExpr(lx)) }
          else if (lx.tok != null && lx.tok.headOption.exists(c => c.isLetter || c == '_')
              && lx.peekIs("=")) {
            val n = lx.tok; lx.advance(); lx.eat("=")
            PKw(n, parseExpr(lx))
          } else parseExpr(lx)
        if (lx.tok != ")") {
          val a0 = parseArg()
          // bare generator expression: sum(x*x for x in xs)
          if (lx.tok == "for") args += parseCompClauses(lx, a0)
          else {
            args += a0
            while (lx.tok == ",") { lx.advance(); args += parseArg() }
          }
        }
        lx.eat(")")
        e = PCall(e, args.toSeq)
      case "[" =>
        lx.advance()
        // index or slice
        val lo = if (lx.tok == ":") None else Some(parseExpr(lx))
        if (lx.tok == ":") {
          lx.advance()
          val hi = if (lx.tok == ":" || lx.tok == "]") None else Some(parseExpr(lx))
          val step = if (lx.tok == ":") {
            lx.advance()
            if (lx.tok == "]") None else Some(parseExpr(lx))
          } else None
          lx.eat("]")
          e = PSliceIdx(e, lo, hi, step)
        } else {
          lx.eat("]")
          e = PIndex(e, lo.get)
        }
      case _ => done = true
    }
    e
  }

  /** Parse `for n(,n)* in <or-expr> (for …|if …)*` after the element expr. */
  private def parseCompClauses(lx: Lexer, elem: PExpr): PExpr = {
    val clauses = ArrayBuffer.empty[CompClause]
    while (lx.tok == "for" || lx.tok == "if") {
      if (lx.tok == "for") {
        lx.advance()
        val names = ArrayBuffer(lx.tok); lx.advance()
        while (lx.tok == ",") { lx.advance(); names += lx.tok; lx.advance() }
        lx.eat("in")
        clauses += CFor(names.toSeq, parseOr(lx))
      } else {
        lx.advance()
        clauses += CIf(parseOr(lx))
      }
    }
    PComp(elem, clauses.toSeq)
  }

  private def parseAtom(lx: Lexer): PExpr = {
    val t = lx.tok
    require(t != null, "py parse: unexpected end of expression")
    if (t == "(") {
      lx.advance()
      if (lx.tok == ")") { lx.advance(); return PTuple(Nil) }
      val e = parseExpr(lx)
      if (lx.tok == ",") { // tuple literal
        val items = ArrayBuffer(e)
        while (lx.tok == ",") {
          lx.advance()
          if (lx.tok != ")") items += parseExpr(lx)
        }
        lx.eat(")")
        PTuple(items.toSeq)
      } else if (lx.tok == "for") { // parenthesised generator expression
        val c = parseCompClauses(lx, e); lx.eat(")"); c
      } else { lx.eat(")"); e }
    }
    else if (t == "[") {
      lx.advance()
      if (lx.tok == "]") { lx.advance(); return PList(Nil) }
      val e0 = parseExpr(lx)
      if (lx.tok == "for") { // list comprehension
        val c = parseCompClauses(lx, e0)
        lx.eat("]")
        PCall(PName("list"), Seq(c))
      } else {
        val items = ArrayBuffer(e0)
        while (lx.tok == ",") {
          lx.advance()
          if (lx.tok != "]") items += parseExpr(lx)
        }
        lx.eat("]")
        PList(items.toSeq)
      }
    }
    else if (t == "{") {
      lx.advance()
      val ks = ArrayBuffer.empty[PExpr]; val vs = ArrayBuffer.empty[PExpr]
      if (lx.tok != "}") {
        var more = true
        while (more) {
          ks += parseExpr(lx); lx.eat(":"); vs += parseExpr(lx)
          if (lx.tok == ",") { lx.advance(); more = lx.tok != "}" } else more = false
        }
      }
      lx.eat("}")
      PDict(ks.toSeq, vs.toSeq)
    }
    else if (t.head.isDigit || (t.head == '.' && t.length > 1)) {
      lx.advance()
      if (t.contains('.')) PFloat(t.toDouble) else PInt(t.toLong)
    }
    else if (t.head == '\'' || t.head == '"') {
      lx.advance(); PStr(unescape(t.substring(1, t.length - 1)))
    }
    else if (t.length > 1 && t.head == 'f' && (t(1) == '\'' || t(1) == '"')) {
      lx.advance(); parseFString(t.substring(2, t.length - 1))
    }
    else if (t.length > 1 && t.head == 'r' && (t(1) == '\'' || t(1) == '"')) {
      // raw string: backslashes are literal (no unescape pass)
      lx.advance(); PStr(t.substring(2, t.length - 1))
    }
    else if (t == "True") { lx.advance(); PBool(true) }
    else if (t == "False") { lx.advance(); PBool(false) }
    else if (t == "None") { lx.advance(); PNone }
    else if (Set("class", "lambda", "yield", "try", "except", "global", "nonlocal")(t))
      throw new IllegalArgumentException(
        s"py parse: '$t' is outside the supported subset (see UdfSurface docs)")
    else { lx.advance(); PName(t) }
  }

  /** `text {expr} more {expr:.2f}` → parts; `{{`/`}}` are literal braces. */
  private def parseFString(raw: String): PExpr = {
    val parts = ArrayBuffer.empty[Either[String, (PExpr, String)]]
    val lit = new java.lang.StringBuilder
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '{' && i + 1 < raw.length && raw.charAt(i + 1) == '{') { lit.append('{'); i += 2 }
      else if (c == '}' && i + 1 < raw.length && raw.charAt(i + 1) == '}') { lit.append('}'); i += 2 }
      else if (c == '{') {
        if (lit.length > 0) { parts += Left(unescape(lit.toString)); lit.setLength(0) }
        var depth = 1; val s = i + 1; var j = i + 1
        while (j < raw.length && depth > 0) {
          raw.charAt(j) match {
            case '{' => depth += 1; case '}' => depth -= 1; case _ =>
          }
          j += 1
        }
        require(depth == 0, s"py parse: unbalanced f-string braces in: $raw")
        val inner = raw.substring(s, j - 1)
        // a ':' at depth 0 outside quotes separates the format spec
        var k = -1; var d2 = 0; var q = '\u0000'; var m = 0
        while (m < inner.length && k < 0) {
          val ch = inner.charAt(m)
          if (q != '\u0000') { if (ch == q) q = '\u0000' }
          else ch match {
            case '\'' | '"' => q = ch
            case '(' | '[' | '{' => d2 += 1
            case ')' | ']' | '}' => d2 -= 1
            case ':' if d2 == 0 => k = m
            case _ =>
          }
          m += 1
        }
        val (exprSrc, spec) = if (k < 0) (inner, "") else (inner.take(k), inner.drop(k + 1))
        parts += Right((exprOf(exprSrc), spec))
        i = j
      } else { lit.append(c); i += 1 }
    }
    if (lit.length > 0) parts += Left(unescape(lit.toString))
    PFStr(parts.toSeq)
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

  /** Strip a trailing `# comment` outside string literals. */
  private def stripComment(line: String): String = {
    var q = '\u0000'; var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (q != '\u0000') {
        if (c == '\\') i += 1 else if (c == q) q = '\u0000'
      } else if (c == '\'' || c == '"') q = c
      else if (c == '#') return line.take(i)
      i += 1
    }
    line
  }

  /** Join physical lines while brackets are open (implicit continuation)
    * or the line ends with a backslash. */
  private def joinLines(raw: Seq[String]): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    var depth = 0
    for (line0 <- raw) {
      val line = stripComment(line0)
      var q = '\u0000'; var i = 0
      while (i < line.length) {
        val c = line.charAt(i)
        if (q != '\u0000') { if (c == '\\') i += 1 else if (c == q) q = '\u0000' }
        else c match {
          case '\'' | '"' => q = c
          case '(' | '[' | '{' => depth += 1
          case ')' | ']' | '}' => depth -= 1
          case _ =>
        }
        i += 1
      }
      val cont = line.endsWith("\\") && q == '\u0000'
      val body = if (cont) line.dropRight(1) else line
      if (cur.length == 0) cur.append(body)
      else cur.append(' ').append(body.trim)
      if (depth <= 0 && !cont) { out += cur.toString; cur.setLength(0); depth = 0 }
    }
    if (cur.length > 0) out += cur.toString
    out.toSeq
  }

  private val augRe = "^(\\w+)\\s*(\\+|-|\\*|/|//|%|\\*\\*|\\||&|\\^|<<|>>)=\\s*(.*)$".r
  private val augIdxRe = "^(\\w+(?:\\.\\w+)*)\\s*\\[(.*)\\]\\s*(\\+|-|\\*|/|//|%|\\||&|\\^)=\\s*(.*)$".r
  private val idxAsnRe = "^(\\w+(?:\\.\\w+)*)\\s*\\[(.*)\\]\\s*=\\s*([^=].*)$".r
  private val augAttrRe = "^(\\w+(?:\\.\\w+)+)\\s*(\\+|-|\\*|/|//|%)=\\s*(.*)$".r
  private val attrAsnRe = "^(\\w+(?:\\.\\w+)+)\\s*=\\s*([^=].*)$".r
  private val tupRe = "^(\\w+(?:\\s*,\\s*\\w+)+)\\s*=\\s*([^=].*)$".r
  private val asnRe = "^(\\w+)\\s*=\\s*(.*)$".r

  /** Split a dotted assignment target `a.b.c` into (object expr, last attr). */
  private def attrTarget(dotted: String): (PExpr, String) = {
    val i = dotted.lastIndexOf('.')
    (exprOf(dotted.take(i).trim), dotted.drop(i + 1).trim)
  }

  /** Parse statements at one indent level; recursion handles nested blocks. */
  private def parseBlock(lines: Seq[String], pos: Int, indent: Int): (Seq[PStmt], Int) = {
    val out = ArrayBuffer.empty[PStmt]
    var p = pos
    while (p < lines.length) {
      val line = lines(p)
      val ind = indentOf(line)
      val t = line.trim
      if (t.isEmpty || t.startsWith("#")) p += 1
      else if (ind < indent) return (out.toSeq, p)
      else {
        require(ind == indent, s"py parse: bad indent at '$t'")
        if (t == "pass") { p += 1 }
        else if (t == "break") { out += PBreak; p += 1 }
        else if (t == "continue") { out += PContinue; p += 1 }
        else if (t == "return" || t.startsWith("return ")) {
          out += PReturn(exprOf(t.stripPrefix("return").trim match {
            case "" => "None"; case e => e
          }))
          p += 1
        } else if (t.startsWith("for ") && t.endsWith(":")) {
          val (body, np) = parseBlock(lines, p + 1, nextIndent(lines, p + 1, indent))
          val m = "^for\\s+(\\w+(?:\\s*,\\s*\\w+)*)\\s+in\\s+(.*?)\\s*:$".r.findFirstMatchIn(t)
            .getOrElse(throw new IllegalArgumentException(s"py parse: unsupported for: $t"))
          out += PFor(m.group(1).split(",").map(_.trim).toSeq, exprOf(m.group(2)), body)
          p = np
        } else if (t.startsWith("while ") && t.endsWith(":")) {
          val cond = exprOf(t.substring(6, t.length - 1).trim)
          val (body, np) = parseBlock(lines, p + 1, nextIndent(lines, p + 1, indent))
          out += PWhile(cond, body)
          p = np
        } else if (t.startsWith("if ") && t.endsWith(":")) {
          val (stmt, np) = parseIfChain(lines, p, indent)
          out += stmt
          p = np
        } else if (t == "try:") {
          val (stmt, np) = parseTryChain(lines, p, indent)
          out += stmt
          p = np
        } else if (t == "raise" || t.startsWith("raise ")) {
          val rest = t.stripPrefix("raise").trim
          val m = "^(\\w+)\\s*(?:\\((.*)\\))?$".r.findFirstMatchIn(rest)
            .getOrElse(throw new IllegalArgumentException(
              s"py parse: unsupported raise form: $t (use raise Name('msg'))"))
          out += PRaise(m.group(1),
            Option(m.group(2)).filter(_.nonEmpty).map(exprOf))
          p += 1
        } else if (t.startsWith("def ")) {
          // nested def → closure over the defining frame (round 9)
          val (fn, np) = parseDef(lines, p, indent)
          out += PDefStmt(fn)
          p = np
        } else if (t.startsWith("yield ") || t == "yield") {
          // generator element (see PyFunc.isGenerator in callIn); bare
          // `yield` yields None, as in CPython
          out += PYield(if (t == "yield") PNone else exprOf(t.stripPrefix("yield").trim))
          p += 1
        } else if (t == "nonlocal" || t.startsWith("nonlocal ")) {
          val names = t.stripPrefix("nonlocal").split(",").map(_.trim).filter(_.nonEmpty)
          require(names.nonEmpty && names.forall(_.matches("\\w+")),
            s"py parse: bad nonlocal statement: $t")
          out += PNonlocal(names.toSeq)
          p += 1
        } else if (t == "global" || t.startsWith("global ")) {
          val names = t.stripPrefix("global").split(",").map(_.trim).filter(_.nonEmpty)
          require(names.nonEmpty && names.forall(_.matches("\\w+")),
            s"py parse: bad global statement: $t")
          out += PGlobal(names.toSeq)
          p += 1
        } else if (t.startsWith("import ") || t.startsWith("from ")) {
          throw new IllegalArgumentException(
            "py parse: imports are only allowed at module level, and only 'math'")
        } else {
          t match {
            case augIdxRe(n, ix, op, e) =>
              out += PIndexAssign(exprOf(n), exprOf(ix), exprOf(e), Some(op))
            case idxAsnRe(n, ix, e) =>
              out += PIndexAssign(exprOf(n), exprOf(ix), exprOf(e), None)
            case augRe(n, op, e) => out += PAugAssign(n, op, exprOf(e))
            case augAttrRe(tgt, op, e) =>
              val (obj, attr) = attrTarget(tgt)
              out += PAttrAssign(obj, attr, exprOf(e), Some(op))
            case attrAsnRe(tgt, e) =>
              val (obj, attr) = attrTarget(tgt)
              out += PAttrAssign(obj, attr, exprOf(e), None)
            case tupRe(ns, e) =>
              // parallel assignment: RHS fully evaluates before any binding
              out += PTupleAssign(ns.split(",").map(_.trim).toSeq,
                splitArgs(e).map(exprOf))
            case asnRe(n, e) if !e.startsWith("=") =>
              // `x = yield [v]` — coroutine receive point (round 10)
              out += PAssign(n,
                if (e == "yield") PYieldExpr(PNone)
                else if (e.startsWith("yield ")) PYieldExpr(exprOf(e.stripPrefix("yield").trim))
                else exprOf(e))
            case _ => out += PExprStmt(exprOf(t))
          }
          p += 1
        }
      }
    }
    (out.toSeq, p)
  }

  /** try / except* / else? / finally? at one indent level. */
  private def parseTryChain(lines: Seq[String], pos: Int, indent: Int): (PTry, Int) = {
    val (body, np) = parseBlock(lines, pos + 1, nextIndent(lines, pos + 1, indent))
    var p2 = np
    val handlers = ArrayBuffer.empty[PHandler]
    val excRe = "^except\\s*(?:\\(?\\s*(\\w+(?:\\s*,\\s*\\w+)*)\\s*\\)?)?(?:\\s+as\\s+(\\w+))?\\s*:$".r
    var done = false
    while (!done && p2 < lines.length && indentOf(lines(p2)) == indent &&
        lines(p2).trim.startsWith("except")) {
      val m = excRe.findFirstMatchIn(lines(p2).trim)
        .getOrElse(throw new IllegalArgumentException(
          s"py parse: unsupported except form: ${lines(p2).trim}"))
      val kinds = Option(m.group(1)).toSeq
        .flatMap(_.split(",").map(_.trim)).filter(_.nonEmpty)
      val (hb, np2) = parseBlock(lines, p2 + 1, nextIndent(lines, p2 + 1, indent))
      handlers += PHandler(kinds, Option(m.group(2)), hb)
      p2 = np2
      done = false
    }
    require(handlers.nonEmpty, "py parse: try without except")
    var orelse: Seq[PStmt] = Nil
    if (p2 < lines.length && indentOf(lines(p2)) == indent &&
        lines(p2).trim == "else:") {
      val (e, np2) = parseBlock(lines, p2 + 1, nextIndent(lines, p2 + 1, indent))
      orelse = e; p2 = np2
    }
    var fin: Seq[PStmt] = Nil
    if (p2 < lines.length && indentOf(lines(p2)) == indent &&
        lines(p2).trim == "finally:") {
      val (f, np2) = parseBlock(lines, p2 + 1, nextIndent(lines, p2 + 1, indent))
      fin = f; p2 = np2
    }
    (PTry(body, handlers.toSeq, orelse, fin), p2)
  }

  /** if / elif* / else? at one indent level → nested PIf. */
  private def parseIfChain(lines: Seq[String], pos: Int, indent: Int): (PIf, Int) = {
    val t = lines(pos).trim
    val condSrc =
      if (t.startsWith("if ")) t.substring(3, t.length - 1)
      else t.substring(5, t.length - 1) // elif
    val cond = exprOf(condSrc.trim)
    val (thn, np) = parseBlock(lines, pos + 1, nextIndent(lines, pos + 1, indent))
    var p2 = np
    var els: Seq[PStmt] = Nil
    if (p2 < lines.length && indentOf(lines(p2)) == indent) {
      val nt = lines(p2).trim
      if (nt.startsWith("elif ") && nt.endsWith(":")) {
        val (chained, np2) = parseIfChain(lines, p2, indent)
        els = Seq(chained); p2 = np2
      } else if (nt == "else:") {
        val (e, np2) = parseBlock(lines, p2 + 1, nextIndent(lines, p2 + 1, indent))
        els = e; p2 = np2
      }
    }
    (PIf(cond, thn, els), p2)
  }

  private def nextIndent(lines: Seq[String], pos: Int, outer: Int): Int = {
    var p = pos
    while (p < lines.length && lines(p).trim.isEmpty) p += 1
    require(p < lines.length && indentOf(lines(p)) > outer, "py parse: missing block body")
    indentOf(lines(p))
  }

  private def splitArgs(s: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var depth = 0; var start = 0; var q = '\u0000'; var esc = false
    for (i <- s.indices) {
      val c = s.charAt(i)
      // inside a quoted region, skip the char after a backslash so an
      // escaped quote (\' or \") doesn't close the string early -- mirrors
      // the escape handling in joinLines/stripComment
      if (q != '\u0000') {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == q) q = '\u0000'
      }
      else c match {
        case '\'' | '"' => q = c
        case '(' | '[' | '{' => depth += 1
        case ')' | ']' | '}' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
    }
    if (s.trim.nonEmpty) out += s.substring(start)
    out.toSeq.map(_.trim)
  }

  // --------------------------------------------------------- module parse

  private val defRe = "^def\\s+(\\w+)\\s*\\(([^)]*)\\)\\s*(?:->\\s*[\\w\\[\\], ]+\\s*)?:\\s*$".r
  private val classRe = "^class\\s+(\\w+)\\s*(?:\\(\\s*(\\w*)\\s*\\))?\\s*:\\s*$".r

  /** Parse one `def` header + body starting at `lines(p)`; returns the
    * function and the next line index. Handles annotations, defaults, and
    * a trailing `*args` vararg. */
  private def parseDef(lines: Seq[String], p: Int, outerIndent: Int): (PyFunc, Int) = {
    val t = lines(p).trim
    val m = defRe.findFirstMatchIn(t).getOrElse(
      throw new IllegalArgumentException(s"py parse: unsupported def form: $t"))
    val rawParams = splitArgs(m.group(2)).filter(_.nonEmpty)
    // strip annotations, collect defaults: `x: int = 3` → ("x", Some(3))
    val params = ArrayBuffer.empty[String]
    val defaults = LinkedHashMap.empty[String, PExpr]
    var vararg: Option[String] = None
    var kwarg: Option[String] = None
    rawParams.foreach { rp =>
      if (rp.startsWith("**")) {
        require(kwarg.isEmpty, s"py parse: duplicate **kwargs parameter: $rp")
        val name = rp.drop(2).split(":").head.trim
        require(name.matches("\\w+"), s"py parse: unsupported parameter form: $rp")
        kwarg = Some(name)
      }
      else if (rp.startsWith("*")) {
        require(vararg.isEmpty, s"py parse: duplicate *args parameter: $rp")
        require(kwarg.isEmpty, s"py parse: *args after **kwargs: $rp")
        val name = rp.drop(1).split(":").head.trim
        require(name.matches("\\w+"), s"py parse: unsupported parameter form: $rp")
        vararg = Some(name)
      } else {
        require(vararg.isEmpty,
          s"py parse: parameters after *args are outside the supported subset: $rp")
        require(kwarg.isEmpty, s"py parse: parameters after **kwargs: $rp")
        val (nameAnn, dflt) = rp.indexOf('=') match {
          case -1 => (rp, None)
          case i => (rp.take(i).trim, Some(rp.drop(i + 1).trim))
        }
        val name = nameAnn.split(":").head.trim
        require(name.matches("\\w+"), s"py parse: unsupported parameter form: $rp")
        params += name
        dflt.foreach(d => defaults(name) = exprOf(d))
      }
    }
    val (body, np) = parseBlock(lines, p + 1, nextIndent(lines, p + 1, outerIndent))
    (PyFunc(m.group(1), params.toSeq, body, defaults.toMap, vararg = vararg,
      kwarg = kwarg), np)
  }

  /** Parse a module: imports (`math`, `re`, `collections`), module
    * constants, `class`es, and one or more `def`s.
    * The entry point is the def named `entry` if given, else the LAST def
    * (matching the reference's convention that the UDF body defines the
    * function being created); every other def is callable as a helper,
    * including recursively. */
  def parse(src: String, entry: Option[String] = None): PyFunc = {
    val lines = joinLines(src.linesIterator.toSeq).dropWhile(_.trim.isEmpty)
    require(lines.nonEmpty, "py parse: empty body")
    val defs = LinkedHashMap.empty[String, PyFunc]
    val classes = LinkedHashMap.empty[String, PyClass]
    val consts = ArrayBuffer.empty[PStmt]
    val imported = scala.collection.mutable.HashSet.empty[String]
    var p = 0
    val modIndent = indentOf(lines.dropWhile(_.trim.isEmpty).head)
    while (p < lines.length) {
      val t = lines(p).trim
      if (t.isEmpty || t.startsWith("#")) p += 1
      else if (t == "import math" || t.matches("^from\\s+math\\s+import\\s+[\\w, ]+$")) {
        if (t.startsWith("from")) {
          t.replaceFirst("^from\\s+math\\s+import\\s+", "").split(",").map(_.trim)
            .foreach(n => consts += PAssign(n, PAttr(PName("math"), n)))
        }
        // `import math` itself needs no binding: PName("math") resolves to
        // the module in eval.
        p += 1
      } else if (t == "import re") {
        imported += "re"; p += 1
      } else if (t.matches("^from\\s+collections\\s+import\\s+[\\w, ]+$")) {
        t.replaceFirst("^from\\s+collections\\s+import\\s+", "").split(",").map(_.trim)
          .foreach { n =>
            require(Set("Counter", "defaultdict")(n),
              s"py parse: unsupported collections import: $n (Counter/defaultdict only)")
            imported += n
          }
        p += 1
      } else if (t.matches("^from\\s+(itertools|functools)\\s+import\\s+[\\w, ]+$")) {
        // round 10: the itertools/functools subset (see builtin())
        val mod = if (t.matches("^from\\s+itertools\\b.*")) "itertools" else "functools"
        val allowed = if (mod == "itertools") ItertoolsNames else FunctoolsNames
        t.replaceFirst("^from\\s+\\w+\\s+import\\s+", "").split(",").map(_.trim)
          .foreach { n =>
            require(allowed(n),
              s"py parse: unsupported $mod import: $n (${allowed.toSeq.sorted.mkString("/")} only)")
            imported += n
          }
        p += 1
      } else if (t.startsWith("import ") || t.startsWith("from ")) {
        throw new IllegalArgumentException(
          "py parse: only 'import math', 'import re', 'from collections " +
            "import Counter/defaultdict' and the documented itertools/" +
            s"functools subset are supported, got: $t")
      } else if (t.startsWith("class ")) {
        val m = classRe.findFirstMatchIn(t).getOrElse(
          throw new IllegalArgumentException(s"py parse: unsupported class form: $t"))
        // single inheritance (round 9): the base must be defined earlier in
        // the module, same as CPython's execution order requires
        val parent: Option[PyClass] = m.group(2) match {
          case null | "" | "object" => None
          case base => Some(classes.getOrElse(base,
            throw new IllegalArgumentException(
              s"py parse: base class '$base' is not defined (define it before '$t')")))
        }
        val bodyIndent = nextIndent(lines, p + 1, modIndent)
        val methods = LinkedHashMap.empty[String, PyFunc]
        val attrs = ArrayBuffer.empty[PStmt]
        var q = p + 1
        var done = false
        while (!done && q < lines.length) {
          val ct = lines(q).trim
          if (ct.isEmpty || ct.startsWith("#")) q += 1
          else if (indentOf(lines(q)) < bodyIndent) done = true
          else if (ct == "pass") q += 1
          else if (ct.startsWith("def ")) {
            val (fn, nq) = parseDef(lines, q, bodyIndent)
            methods(fn.name) = fn
            q = nq
          } else ct match {
            case asnRe(n, e) if !e.startsWith("=") =>
              attrs += PAssign(n, exprOf(e)); q += 1
            case _ => throw new IllegalArgumentException(
              s"py parse: unsupported class-body statement: $ct")
          }
        }
        classes(m.group(1)) = PyClass(m.group(1), methods.toMap, attrs.toSeq, parent)
        p = q
      } else if (t.startsWith("def ")) {
        val (fn, np) = parseDef(lines, p, modIndent)
        defs(fn.name) = fn
        p = np
      } else {
        // module-level constant (re-evaluated per call: cheap, and keeps
        // mutable values from leaking across rows / executor threads)
        t match {
          case tupRe(ns, e) =>
            consts += PTupleAssign(ns.split(",").map(_.trim).toSeq, splitArgs(e).map(exprOf))
          case asnRe(n, e) if !e.startsWith("=") => consts += PAssign(n, exprOf(e))
          case _ => throw new IllegalArgumentException(
            s"py parse: unsupported module-level statement: $t")
        }
        p += 1
      }
    }
    require(defs.nonEmpty, "py parse: no def in body")
    val main = entry.flatMap(defs.get).getOrElse(defs.last._2)
    main.copy(defs = defs.toMap, consts = consts.toSeq,
      classes = classes.toMap, imported = imported.toSet)
  }

  // ------------------------------------------------------------ evaluate

  /** The running generator body's emit — per coroutine THREAD, not a ctx
    * stack: each generator body runs wholly on its own dedicated thread
    * (see [[LazyGen]]), so a suspended outer generator can never see an
    * inner generator's sink. The emit's RETURN value is what the consumer
    * resumed with — `gen.send(v)` delivers v, a plain next delivers None —
    * which is the value of an `x = yield …` expression. */
  private val yieldEmit = new ThreadLocal[Any => Any]

  /** A generator object: the def body runs as a coroutine on a dedicated
    * daemon thread with STRICT ALTERNATION — the body only executes between
    * a consumer pull (`req`) and the matching yield handoff (`resp`), so
    * consumer and body never run concurrently and the shared interpreter
    * state needs no locking. The thread is the JVM stand-in for the
    * continuation a tree-walking interpreter doesn't have; CPython
    * semantics preserved: no code runs at call time, StopIteration on
    * exhaustion, a spent generator iterates empty, body exceptions surface
    * at the pull that triggers them. A yield cap (10M) bounds a
    * `list(infinite_gen)` the way CInterp's step budget bounds loops.
    * [[close]] interrupts a suspended body; Ctx closes all stragglers when
    * the top-level call returns. */
  private[functions] final class LazyGen(name: String, runBody: (Any => Any) => Unit)
      extends Iterator[Any] {
    private sealed trait Msg
    private final case class Item(v: Any) extends Msg
    private case object End extends Msg
    private final case class Err(t: Throwable) extends Msg
    /** Consumer → body resume token; `sent` is the `gen.send` payload
      * (null = None for a plain next), returned by the suspended
      * `x = yield …` expression. */
    private final case class Resume(sent: Any)

    private val req = new java.util.concurrent.SynchronousQueue[Resume]
    private val resp = new java.util.concurrent.SynchronousQueue[Msg]
    private var lookahead: Msg = null
    private var finished = false
    private var started = false
    private var yielded = 0L
    private val MaxYields = 10000000L

    private val thread = new Thread(() => {
      try {
        req.take() // no body code before the first pull (CPython); the
        // first resume's payload is discarded, which is why CPython only
        // accepts send(None) on a just-started generator (enforced in send)
        runBody { v => resp.put(Item(v)); req.take().sent }
        resp.put(End)
      } catch {
        case _: InterruptedException => // closed while suspended
        case t: Throwable =>
          try resp.put(Err(t)) catch { case _: InterruptedException => }
      }
    }, s"py-gen-$name")
    thread.setDaemon(true)

    /** Resume the body with `sent` and block for its next message. */
    private def pull(sent: Any): Msg = {
      if (!started) { thread.start(); started = true }
      yielded += 1
      if (yielded > MaxYields) {
        close()
        throw new IllegalArgumentException(
          s"py: generator $name exceeded $MaxYields yields (infinite generator fully consumed?)")
      }
      req.put(Resume(sent))
      resp.take()
    }

    override def hasNext: Boolean = {
      if (finished) return false
      if (lookahead == null) lookahead = pull(null)
      lookahead match {
        case End => finished = true; false
        case Err(t) => finished = true; lookahead = null; throw t
        case Item(_) => true
      }
    }

    override def next(): Any = {
      if (!hasNext) throw new PyError("StopIteration", "")
      val Item(v) = lookahead: @unchecked
      lookahead = null
      v
    }

    /** `gen.send(v)`: resume the suspended yield with v, return the next
      * yielded value; StopIteration at exhaustion, TypeError on a non-None
      * send to a just-started generator — CPython coroutine protocol. */
    def send(v: Any): Any = {
      if (finished) throw new PyError("StopIteration", "")
      if (lookahead == null) {
        if (!started && v != null) throw new PyError("TypeError",
          "can't send non-None value to a just-started generator")
        lookahead = pull(v)
      } else if (v != null)
        // a buffered lookahead means a for-loop's hasNext already resumed
        // the body with None; the sent value has no yield to deliver to
        throw new IllegalArgumentException(
          "py: send() into a generator being iterated elsewhere is not supported")
      lookahead match {
        case End => finished = true; lookahead = null
          throw new PyError("StopIteration", "")
        case Err(t) => finished = true; lookahead = null; throw t
        case Item(x) => lookahead = null; x
      }
    }

    def close(): Unit = if (started && !finished) {
      finished = true
      thread.interrupt()
    }
  }

  /** Non-stack-filling control-flow exceptions. Return carries a value per
    * instance; break/continue are stateless singletons. */
  private final class ReturnException(val value: Any)
    extends Exception(null, null, false, false)
  private object BreakException extends Exception(null, null, false, false)
  private object ContinueException extends Exception(null, null, false, false)

  /** Function table threaded through evaluation (helpers + recursion). */
  private final class Ctx(val defs: Map[String, PyFunc], val consts: Seq[PStmt],
      val classes: Map[String, PyClass] = Map.empty,
      val imported: Set[String] = Set.empty) {
    var depth = 0
    /** Every generator object born during this top-level call; [[call]]
      * closes the unfinished ones on the way out so an early-exit consumer
      * (zip(gen, range(n)), next(gen)) cannot leak a suspended coroutine
      * thread past the row that made it. */
    val openGens = ArrayBuffer.empty[LazyGen]
    /** Module-level bindings, evaluated ONCE per top-level call (see
      * [[call]]); frames seed from it so a mutable module global (a list a
      * helper appends to) is the SAME object in every frame, as in CPython
      * module globals. Re-running the const statements per frame — the old
      * behavior — gave each helper call a fresh copy (a mutated global
      * silently diverged from CPython) and a const initializer that called
      * a def recursed callIn→consts→callIn until the depth guard fired. */
    var constEnv: HashMap[String, Any] = HashMap.empty
  }

  // Interpreter frames are JVM-stack-heavy (~15 JVM frames per Python
  // frame), so the guard sits well below CPython's 1000 default to raise a
  // catchable error instead of a StackOverflowError.
  private val MaxDepth = 200

  def call(fn: PyFunc, args: Seq[Any]): Any = {
    val ctx = new Ctx(fn.defs + (fn.name -> fn), fn.consts, fn.classes, fn.imported)
    try {
      // module constants run once, in order, against the shared module env —
      // an initializer calling a def sees the consts bound so far (CPython's
      // in-order module execution), and helper frames below share the
      // resulting objects rather than re-evaluating per call
      if (ctx.consts.nonEmpty) exec(ctx.consts, ctx.constEnv, ctx)
      callIn(fn, args, ctx) match {
        // a generator RESULT has no SQL representation — materialize it the
        // way CPython callers do with list(gen) before serializing
        case g: LazyGen => ArrayBuffer[Any](g.toSeq: _*)
        case other => other
      }
    } finally ctx.openGens.foreach(_.close())
  }

  private def callIn(fn: PyFunc, args: Seq[Any], ctx: Ctx,
      kwargs: Map[String, Any] = Map.empty,
      enclosing: Option[HashMap[String, Any]] = None,
      extraEnv: Map[String, Any] = Map.empty): Any = {
    ctx.depth += 1
    require(ctx.depth <= MaxDepth,
      s"py: maximum recursion depth exceeded in ${fn.name}")
    try {
      // Every frame CHAINS to its enclosing scope (ChainedEnv): the
      // defining frame for closure calls, the module env for top-level
      // defs. Reads see live enclosing bindings (CPython scope lookup),
      // assignment stays local unless declared nonlocal/global, and
      // mutable objects (lists, dicts) are shared by reference.
      val env: HashMap[String, Any] = enclosing match {
        case Some(captured) =>
          new ChainedEnv(captured, ctx.constEnv, isClosure = true, fn.localNames)
        case None =>
          new ChainedEnv(ctx.constEnv, ctx.constEnv, isClosure = false, fn.localNames)
      }
      extraEnv.foreach { case (k, v) => env(k) = v }
      val bound = scala.collection.mutable.HashSet.empty[String]
      fn.params.zip(args).foreach { case (p, v) => env(p) = v; bound += p }
      if (args.size > fn.params.size) {
        val va = fn.vararg.getOrElse(throw new PyError("TypeError",
          s"${fn.name}() takes ${fn.params.size} positional arguments " +
            s"but ${args.size} were given"))
        env(va) = args.drop(fn.params.size).toVector
      } else fn.vararg.foreach(va => env(va) = Vector.empty[Any])
      // keyword arguments: declared params bind by name; the rest collect
      // into the **kwargs dict if the def declares one (round 9)
      val extraKw = fn.kwarg.map(_ => LinkedHashMap.empty[Any, Any])
      kwargs.foreach { case (k, v) =>
        if (!fn.params.contains(k)) {
          extraKw match {
            case Some(m) => m(k) = v
            case None => throw new PyError("TypeError",
              s"${fn.name}() got an unexpected keyword argument '$k'")
          }
        } else {
          if (bound(k)) throw new PyError("TypeError",
            s"${fn.name}() got multiple values for argument '$k'")
          env(k) = v; bound += k
        }
      }
      fn.kwarg.foreach(kw => env(kw) = extraKw.get)
      fn.params.filterNot(bound).foreach { p =>
        val d = fn.defaults.getOrElse(p, throw new PyError("TypeError",
          s"${fn.name}() missing argument '$p'"))
        env(p) = eval(d, env, ctx)
      }
      if (fn.isGenerator) {
        // Lazy generator (round 10, replacing the eager-list execution):
        // calling the def builds a LazyGen and runs NO body code — the body
        // executes between the consumer's pulls, so `zip(gen, range(n))`
        // early exits and large-range generators never materialize.
        // `return` ends iteration (StopIteration); `return value` has no
        // consumer here and is rejected, as before.
        val gen = new LazyGen(fn.name, emit => {
          yieldEmit.set(emit) // this coroutine thread's own sink
          try {
            try exec(fn.body, env, ctx)
            catch {
              case r: ReturnException =>
                if (r.value != null) throw new PyError("TypeError",
                  s"'return value' inside generator ${fn.name} is not supported")
            }
          } finally yieldEmit.remove()
        })
        ctx.openGens += gen
        gen
      } else {
        try { exec(fn.body, env, ctx); null }
        catch { case r: ReturnException => r.value }
      }
    } finally ctx.depth -= 1
  }

  private def exec(stmts: Seq[PStmt], env: HashMap[String, Any], ctx: Ctx): Unit =
    stmts.foreach {
      case PReturn(e) =>
        throw new ReturnException(eval(e, env, ctx))
      case PYield(e) =>
        val emit = yieldEmit.get()
        require(emit != null, "py: yield outside a generator frame")
        emit(eval(e, env, ctx)): Unit // statement position: sent value unused
      case PDefStmt(fn) => env(fn.name) = PyClosure(fn, env)
      case PNonlocal(names) => env match {
        case ce: ChainedEnv if ce.isClosure => ce.nonlocals ++= names
        case _ => throw new IllegalArgumentException(
          "py: nonlocal declaration outside a nested function")
      }
      case PGlobal(names) => env match {
        case ce: ChainedEnv => ce.globals ++= names
        case _ => throw new IllegalArgumentException(
          "py: global declaration outside a function frame")
      }
      case PAssign(n, e) => env(n) = eval(e, env, ctx)
      case PTupleAssign(names, rhs) =>
        // Python semantics: the whole RHS evaluates before any name binds,
        // so `a, b = b, a` swaps.
        val vals =
          if (rhs.size == 1) eval(rhs.head, env, ctx) match {
            case seq: scala.collection.Seq[_] => seq
            case other => throw new IllegalArgumentException(s"py: cannot unpack $other")
          } else rhs.map(eval(_, env, ctx))
        require(vals.size == names.size,
          s"py: cannot unpack ${vals.size} values into ${names.size} names")
        names.zip(vals).foreach { case (n, v) => env(n) = v }
      case PAugAssign(n, op, e) =>
        env(n) = binop(op, env.getOrElse(n,
          throw new IllegalArgumentException(s"py: undefined name '$n'")), eval(e, env, ctx))
      case PIndexAssign(target, ix, e, aug) =>
        val coll = eval(target, env, ctx)
        val v = eval(e, env, ctx)
        coll match {
          case buf: ArrayBuffer[_] =>
            val b = buf.asInstanceOf[ArrayBuffer[Any]]
            val i0 = asLong(eval(ix, env, ctx)).toInt
            val j = if (i0 < 0) b.size + i0 else i0
            require(j >= 0 && j < b.size, s"py: list index $i0 out of range")
            b(j) = aug.fold(v)(op => binop(op, b(j), v))
          case c: PyCounter => // missing key counts as 0, never raises
            val k = eval(ix, env, ctx)
            c(k) = aug.fold(v)(op => binop(op, c.getOrElse(k, 0L), v))
          case dd: PyDefaultDict =>
            val k = eval(ix, env, ctx)
            aug match {
              case None => dd(k) = v
              case Some(op) => dd(k) = binop(op, ddGet(dd, k, ctx), v)
            }
          case d: LinkedHashMap[_, _] =>
            val m = d.asInstanceOf[LinkedHashMap[Any, Any]]
            val k = eval(ix, env, ctx)
            aug match {
              case None => m(k) = v
              case Some(op) =>
                m(k) = binop(op, m.getOrElse(k,
                  throw new PyError("KeyError", pyRepr(k))), v)
            }
          case other => throw new IllegalArgumentException(s"py: cannot assign into $other")
        }
      case PAttrAssign(target, attr, e, aug) =>
        eval(target, env, ctx) match {
          case inst: PyInstance =>
            val v = eval(e, env, ctx)
            aug match {
              case None => inst.attrs(attr) = v
              case Some(op) => inst.attrs(attr) = binop(op,
                inst.attrs.getOrElse(attr, throw new PyError("AttributeError",
                  s"'${inst.cls.name}' object has no attribute '$attr'")), v)
            }
          case other => throw new IllegalArgumentException(
            s"py: cannot set attribute '$attr' on ${pyStr(other)}")
        }
      case PFor(names, iterE, body) =>
        val it = iterate(eval(iterE, env, ctx))
        try {
          while (it.hasNext) {
            bindTarget(names, it.next(), env)
            try exec(body, env, ctx)
            catch { case ContinueException => () }
          }
        } catch { case BreakException => () }
      case PWhile(cond, body) =>
        try {
          while (truthy(eval(cond, env, ctx))) {
            try exec(body, env, ctx)
            catch { case ContinueException => () }
          }
        } catch { case BreakException => () }
      case PBreak => throw BreakException
      case PContinue => throw ContinueException
      case PRaise(kind, msg) =>
        throw new PyError(kind, msg.map(m => pyStr(eval(m, env, ctx))).getOrElse(""))
      case PTry(body, handlers, orelse, fin) =>
        try {
          val caught =
            try { exec(body, env, ctx); None }
            catch {
              // control flow (return/break/continue) is not an exception
              case e: PyError => Some((e.kind, e.pyMsg))
              // integer //, % by zero surface as JVM ArithmeticException
              case e: ArithmeticException =>
                Some(("ZeroDivisionError", String.valueOf(e.getMessage)))
              // interpreter-raised errors without a specific kind (type
              // mismatches, unsupported ops) match bare/Exception handlers
              case e: IllegalArgumentException =>
                Some(("Exception", String.valueOf(e.getMessage)))
            }
          caught match {
            case None => exec(orelse, env, ctx)
            case Some((kind, message)) =>
              val h = handlers.find(h => h.kinds.isEmpty ||
                h.kinds.contains("Exception") || h.kinds.contains(kind))
                .getOrElse(throw new PyError(kind, message)) // no match: propagate
              // CPython binds the exception OBJECT; the supported surface is
              // str(e)/f"{e}", so the message string stands in for it
              h.bind.foreach(n => env(n) = message)
              exec(h.body, env, ctx)
          }
        } finally {
          if (fin.nonEmpty) exec(fin, env, ctx)
        }
      case PIf(c, t, e) =>
        if (truthy(eval(c, env, ctx))) exec(t, env, ctx) else exec(e, env, ctx)
      case PExprStmt(e) => eval(e, env, ctx)
    }

  private def bindTarget(names: Seq[String], v: Any, env: HashMap[String, Any]): Unit =
    if (names.size == 1) env(names.head) = v
    else v match {
      case seq: scala.collection.Seq[_] =>
        require(seq.size == names.size,
          s"py: cannot unpack ${seq.size} values into ${names.size} names")
        names.zip(seq).foreach { case (n, x) => env(n) = x }
      case other => throw new IllegalArgumentException(s"py: cannot unpack $other")
    }

  /** Python `range` object: lazy, iterable, indexable, len()-able. */
  final case class RangeVal(start: Long, stop: Long, step: Long) {
    def size: Long =
      if (step > 0) math.max(0L, (stop - start + step - 1) / step)
      else math.max(0L, (start - stop - step - 1) / (-step))
  }

  private def iterate(v: Any): Iterator[Any] = v match {
    case g: LazyGen => g // pulls lazily; a spent generator iterates empty
    case seq: scala.collection.Seq[_] => seq.iterator
    case s: String => s.iterator.map(_.toString)
    case r: RangeVal => Iterator.iterate(r.start)(_ + r.step).takeWhile(i =>
      if (r.step > 0) i < r.stop else i > r.stop)
    case d: LinkedHashMap[_, _] => d.keysIterator
    case other => throw new IllegalArgumentException(s"py: not iterable: $other")
  }

  private def truthy(v: Any): Boolean = v match {
    case b: Boolean => b
    case l: Long => l != 0
    case d: Double => d != 0.0
    case s: String => s.nonEmpty
    case null => false
    case seq: scala.collection.Seq[_] => seq.nonEmpty
    case d: LinkedHashMap[_, _] => d.nonEmpty
    case r: RangeVal => r.size > 0
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
    case ("*", a: Long, b: String) => b * a.toInt
    case ("+", a: ArrayBuffer[_], b: ArrayBuffer[_]) =>
      (a ++ b).asInstanceOf[ArrayBuffer[Any]]
    case ("+", a: Vector[_], b: Vector[_]) => a ++ b
    case ("*", a: ArrayBuffer[_], b: Long) =>
      val out = ArrayBuffer.empty[Any]
      (0L until b).foreach(_ => out ++= a)
      out
    case ("%", s: String, _) => pyPercentFormat(s, r)
    case ("|", _, _) | ("&", _, _) | ("^", _, _) | ("<<", _, _) | (">>", _, _) =>
      val (a, b) = (l, r) match {
        case (x: Long, y: Long) => (x, y)
        case (x: Boolean, y: Boolean) => (asLong(x), asLong(y))
        case (x: Boolean, y: Long) => (asLong(x), y)
        case (x: Long, y: Boolean) => (x, asLong(y))
        case _ => throw new PyError("TypeError",
          s"unsupported operand type(s) for $op: $l, $r")
      }
      op match {
        case "|" => a | b
        case "&" => a & b
        case "^" => a ^ b
        case "<<" => a << b
        case ">>" => a >> b
      }
    case ("==", _, _) => pyEq(l, r)
    case ("!=", _, _) => !pyEq(l, r)
    case ("<", _, _) | ("<=", _, _) | (">", _, _) | (">=", _, _) =>
      val c = pyCompare(l, r)
      op match { case "<" => c < 0; case "<=" => c <= 0; case ">" => c > 0; case _ => c >= 0 }
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
          case "**" =>
            if (b >= 0 && b < 63) { // exact integer power where it fits
              var acc = 1L; var i = 0L; var ok = true
              while (i < b && ok) {
                val next = acc * a
                if (a != 0 && next / a != acc) ok = false else { acc = next; i += 1 }
              }
              if (ok) acc else math.pow(a.toDouble, b.toDouble)
            } else math.pow(a.toDouble, b.toDouble)
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
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (a: scala.collection.Seq[_], b: scala.collection.Seq[_]) =>
      a.size == b.size && a.zip(b).forall { case (x, y) => pyEq(x, y) }
    case (a: LinkedHashMap[_, _], b: LinkedHashMap[_, _]) =>
      a.size == b.size && a.forall { case (k, v) =>
        b.asInstanceOf[LinkedHashMap[Any, Any]].get(k).exists(pyEq(v, _)) }
    case (a: Boolean, b: Boolean) => a == b
    // Booleans are numbers in Python (True == 1), but only against numeric
    // counterparts — `True == 'x'` is False, not an error, so a Boolean
    // paired with a non-number must fall through to the catch-all below.
    case (_: Boolean, _: Long | _: Double) | (_: Long | _: Double, _: Boolean) |
         (_: Long, _: Long) | (_: Long, _: Double) |
         (_: Double, _: Long) | (_: Double, _: Double) =>
      num2(l, r) match {
        case Left((a, b)) => a == b
        case Right((a, b)) => a == b
      }
    case _ => false // str vs int etc: Python says unequal, not error
  }

  private def pyCompare(l: Any, r: Any): Int = (l, r) match {
    case (a: String, b: String) => a.compareTo(b)
    case (a: scala.collection.Seq[_], b: scala.collection.Seq[_]) => // lexicographic, like Python
      a.zip(b).iterator.map { case (x, y) => pyCompare(x, y) }.find(_ != 0)
        .getOrElse(a.size.compareTo(b.size))
    case _ => num2(l, r) match {
      case Left((a, b)) => java.lang.Long.compare(a, b)
      case Right((a, b)) => java.lang.Double.compare(a, b)
    }
  }

  /** Marker for the whitelisted math module. */
  /** The `from itertools import …` / `from functools import …` subset
    * (round 10): finite combinators materialize eagerly (their output is
    * bounded by their inputs); count/cycle/argless repeat return true
    * lazy generators ([[LazyGen]]) so only islice/zip-style consumption
    * is meaningful, with the 10M-yield budget as the runaway guard. */
  private val ItertoolsNames = Set("chain", "product", "combinations",
    "permutations", "accumulate", "islice", "repeat", "count", "cycle",
    "groupby")
  private val FunctoolsNames = Set("reduce")

  private case object MathModule

  /** Marker for the whitelisted re module (requires `import re`). */
  private case object ReModule

  /** `collections.Counter`: a dict whose missing keys read as 0 (and are
    * not inserted by a read). */
  final class PyCounter extends LinkedHashMap[Any, Any]

  /** `collections.defaultdict(factory)`: a dict whose missing keys
    * materialize `factory()` on first access and insert it. */
  final class PyDefaultDict(val factory: Any) extends LinkedHashMap[Any, Any]

  /** A re match object (subset): group values 0..n (null = unmatched
    * optional group, like CPython None), named groups, overall span. */
  final case class PyMatch(groupVals: Vector[Any], named: Map[String, Any],
    startPos: Long, endPos: Long)

  // Compiled-pattern cache: the UDF interprets per row, and re-compiling
  // the same regex per row would dominate. Thread-safe (executor tasks
  // share the JVM); bounded by clearing — patterns are cheap to rebuild.
  private val rePatterns =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), java.util.regex.Pattern]

  private val namedGroupRe = "\\(\\?P?<([A-Za-z]\\w*)>".r

  /** Compile a Python pattern under Python flag bits (I=2, M=8, S=16).
    * The Python and Java regex dialects agree on the supported core
    * (classes, quantifiers, anchors, alternation, backrefs); the two
    * spellings that differ — `(?P<name>…)` and `(?P=name)` — are
    * rewritten to their Java forms. */
  private def reCompile(pat: String, pyFlags: Int): java.util.regex.Pattern = {
    val key = (pat, pyFlags)
    val cached = rePatterns.get(key)
    if (cached != null) return cached
    var jf = 0
    if ((pyFlags & 2) != 0)
      jf |= java.util.regex.Pattern.CASE_INSENSITIVE | java.util.regex.Pattern.UNICODE_CASE
    if ((pyFlags & 8) != 0) jf |= java.util.regex.Pattern.MULTILINE
    if ((pyFlags & 16) != 0) jf |= java.util.regex.Pattern.DOTALL
    require((pyFlags & ~(2 | 8 | 16)) == 0,
      s"py: unsupported re flags $pyFlags (IGNORECASE/MULTILINE/DOTALL only)")
    val jpat = pat.replace("(?P<", "(?<")
      .replaceAll("\\(\\?P=(\\w+)\\)", "\\\\k<$1>")
    val p =
      try java.util.regex.Pattern.compile(jpat, jf)
      catch {
        case e: java.util.regex.PatternSyntaxException =>
          throw new PyError("error", s"bad pattern: ${e.getMessage}")
      }
    if (rePatterns.size > 512) rePatterns.clear()
    rePatterns.put(key, p)
    p
  }

  private def mkMatch(pat: String, m: java.util.regex.Matcher): PyMatch = {
    val groups = (0 to m.groupCount).map(i => m.group(i): Any).toVector
    val named = namedGroupRe.findAllMatchIn(pat).map(_.group(1)).map { n =>
      n -> (m.group(n): Any)
    }.toMap
    PyMatch(groups, named, m.start.toLong, m.end.toLong)
  }

  /** `re.<name>(...)` dispatch. Python surface: search / match /
    * fullmatch / findall / split / sub / escape, with optional flags. */
  private def reCall(name: String, args: Seq[Any], ctx: Ctx): Any = {
    def pat = args.head match {
      case s: String => s
      case other => throw new PyError("TypeError", s"re.$name: pattern must be str, got ${pyStr(other)}")
    }
    def str(i: Int) = args(i) match {
      case s: String => s
      case other => throw new PyError("TypeError", s"re.$name: expected str, got ${pyStr(other)}")
    }
    name match {
      case "search" | "match" | "fullmatch" =>
        val flags = if (args.size > 2) asLong(args(2)).toInt else 0
        val m = reCompile(pat, flags).matcher(str(1))
        val hit = name match {
          case "search" => m.find()
          case "match" => m.lookingAt()
          case _ => m.matches()
        }
        if (hit) mkMatch(pat, m) else null
      case "findall" =>
        val flags = if (args.size > 2) asLong(args(2)).toInt else 0
        val m = reCompile(pat, flags).matcher(str(1))
        val out = ArrayBuffer.empty[Any]
        while (m.find()) {
          out += (m.groupCount match {
            case 0 => m.group(0)
            case 1 => if (m.group(1) == null) "" else m.group(1)
            case n => (1 to n).map(i => (if (m.group(i) == null) "" else m.group(i)): Any).toVector
          })
        }
        out
      case "split" =>
        val flags = if (args.size > 2) asLong(args(2)).toInt else 0
        val m = reCompile(pat, flags).matcher(str(1))
        val s = str(1)
        val out = ArrayBuffer.empty[Any]
        var prev = 0
        while (m.find()) {
          out += s.substring(prev, m.start)
          // CPython keeps capture groups in the result
          (1 to m.groupCount).foreach(i => out += (m.group(i): Any))
          prev = m.end
        }
        out += s.substring(prev)
        out
      case "sub" | "subn" =>
        val repl = args(1)
        val flags = if (args.size > 4) asLong(args(4)).toInt else 0
        val count = if (args.size > 3) asLong(args(3)).toInt else 0
        val s = str(2)
        val m = reCompile(pat, flags).matcher(s)
        val sb = new java.lang.StringBuilder
        var prev = 0
        var n = 0
        while ((count == 0 || n < count) && m.find()) {
          sb.append(s, prev, m.start)
          repl match {
            case r: String => sb.append(expandReplacement(r, m))
            case f => sb.append(applyCallable(f, Seq(mkMatch(pat, m)), ctx) match {
              case rs: String => rs
              case other => throw new PyError("TypeError",
                s"re.sub repl returned non-str: ${pyStr(other)}")
            })
          }
          prev = m.end
          n += 1
          if (m.end == m.start) { // zero-width match: avoid infinite loop
            if (prev < s.length) sb.append(s.charAt(prev))
            prev += 1
            if (prev > s.length) prev = s.length
          }
        }
        sb.append(s.substring(math.min(prev, s.length)))
        if (name == "sub") sb.toString else Vector(sb.toString, n.toLong)
      case "escape" =>
        str(0).map(c =>
          if (c.isLetterOrDigit || c == '_') c.toString else "\\" + c).mkString
      case other =>
        throw new IllegalArgumentException(s"py: re.$other is unsupported")
    }
  }

  /** Expand a Python replacement template against a match: `\1`, `\g<1>`,
    * `\g<name>`, escaped backslashes. */
  private def expandReplacement(repl: String, m: java.util.regex.Matcher): String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < repl.length) {
      val c = repl.charAt(i)
      if (c == '\\' && i + 1 < repl.length) {
        val n = repl.charAt(i + 1)
        if (n.isDigit) {
          var j = i + 1
          while (j < repl.length && repl.charAt(j).isDigit && j - i <= 2) j += 1
          val g = repl.substring(i + 1, j).toInt
          sb.append(Option(m.group(g)).getOrElse(""))
          i = j
        } else if (n == 'g' && i + 2 < repl.length && repl.charAt(i + 2) == '<') {
          val close = repl.indexOf('>', i + 3)
          require(close > 0, s"py: bad replacement group in '$repl'")
          val gname = repl.substring(i + 3, close)
          val v = if (gname.forall(_.isDigit)) m.group(gname.toInt) else m.group(gname)
          sb.append(Option(v).getOrElse(""))
          i = close + 1
        } else {
          n match {
            case '\\' => sb.append('\\')
            case 'n' => sb.append('\n')
            case 't' => sb.append('\t')
            case o => sb.append('\\').append(o)
          }
          i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def eval(e: PExpr, env: HashMap[String, Any], ctx: Ctx): Any = e match {
    case PInt(v) => v
    case PFloat(v) => v
    case PStr(v) => v
    case PBool(v) => v
    case PNone => null
    // env.get (not contains): an unbound LOCAL named math/re must raise
    // UnboundLocalError from the lookup, not resolve to the module
    case PName("math") if env.get("math").isEmpty => MathModule
    case PName("re") if ctx.imported("re") && env.get("re").isEmpty => ReModule
    case PName(n) =>
      env.getOrElse(n, ctx.defs.getOrElse(n, ctx.classes.getOrElse(n,
        if (Builtins(n) || ctx.imported(n)) BuiltinRef(n)
        else throw new IllegalArgumentException(s"py: undefined name '$n'"))))
    case PYieldExpr(ve) =>
      val emit = yieldEmit.get()
      require(emit != null, "py: yield outside a generator frame")
      emit(eval(ve, env, ctx)) // evaluates to the consumer's send() payload
    case PLambda(params, body) => PyLambda(params, body, env)
    case PUnary("-", x) => eval(x, env, ctx) match {
      case l: Long => -l
      case d: Double => -d
      case b: Boolean => -asLong(b)
      case other => throw new IllegalArgumentException(s"py: cannot negate $other")
    }
    case PUnary("not", x) => !truthy(eval(x, env, ctx))
    case PUnary(op, _) => throw new IllegalArgumentException(s"py: unary $op")
    case PBoolOp("and", parts) =>
      var v: Any = true
      val it = parts.iterator
      while (it.hasNext) {
        v = eval(it.next(), env, ctx)
        if (!truthy(v)) return v // Python returns the operand itself
      }
      v
    case PBoolOp("or", parts) =>
      var v: Any = false
      val it = parts.iterator
      while (it.hasNext) {
        v = eval(it.next(), env, ctx)
        if (truthy(v)) return v
      }
      v
    case PBoolOp(op, _) => throw new IllegalArgumentException(s"py: boolop $op")
    case PCompare(first, ops, rest) =>
      // chained: a < b <= c ⟺ (a < b) and (b <= c), each operand once
      var left = eval(first, env, ctx)
      var i = 0
      while (i < ops.length) {
        val right = eval(rest(i), env, ctx)
        val ok = ops(i) match {
          case "in" => pyContains(right, left)
          case "not in" => !pyContains(right, left)
          case "is" => (left == null) == (right == null) &&
            (left == null || left.asInstanceOf[AnyRef].eq(right.asInstanceOf[AnyRef]))
          case "is not" => !((left == null) == (right == null) &&
            (left == null || left.asInstanceOf[AnyRef].eq(right.asInstanceOf[AnyRef])))
          case op => binop(op, left, right).asInstanceOf[Boolean]
        }
        if (!ok) return false
        left = right
        i += 1
      }
      true
    case PBin(op, l, r) => binop(op, eval(l, env, ctx), eval(r, env, ctx))
    case PTernary(c, t, f) =>
      if (truthy(eval(c, env, ctx))) eval(t, env, ctx) else eval(f, env, ctx)
    case PAttr(x, name) => (eval(x, env, ctx), name) match {
      case (d: LocalDate, "year") => d.getYear.toLong
      case (d: LocalDate, "month") => d.getMonthValue.toLong
      case (d: LocalDate, "day") => d.getDayOfMonth.toLong
      case (MathModule, "pi") => math.Pi
      case (MathModule, "e") => math.E
      case (MathModule, "tau") => 2 * math.Pi
      case (MathModule, "inf") => Double.PositiveInfinity
      case (MathModule, "nan") => Double.NaN
      // re flag constants (CPython values; translated to Java in reCompile)
      case (ReModule, "IGNORECASE" | "I") => 2L
      case (ReModule, "MULTILINE" | "M") => 8L
      case (ReModule, "DOTALL" | "S") => 16L
      case (inst: PyInstance, n) =>
        inst.attrs.getOrElse(n,
          if (inst.cls.findMethod(n).isDefined) BoundMethod(inst, n)
          else throw new PyError("AttributeError",
            s"'${inst.cls.name}' object has no attribute '$n'"))
      case (SuperProxy(inst, above), n) => SuperMethod(inst, above.parent, n)
      case (v, n) => BoundMethod(v, n) // resolved at call time
    }
    case PList(items) => ArrayBuffer[Any](items.map(eval(_, env, ctx)): _*)
    case PTuple(items) => items.map(eval(_, env, ctx)).toVector
    case PDict(ks, vs) =>
      val m = LinkedHashMap.empty[Any, Any]
      ks.zip(vs).foreach { case (k, v) => m(eval(k, env, ctx)) = eval(v, env, ctx) }
      m
    case PComp(elem, clauses) => compIter(elem, clauses, env, ctx)
    case PFStr(parts) =>
      val sb = new java.lang.StringBuilder
      parts.foreach {
        case Left(s) => sb.append(s)
        case Right((ex, spec)) => sb.append(formatSpec(eval(ex, env, ctx), spec))
      }
      sb.toString
    case PIndex(x, ix) =>
      eval(x, env, ctx) match {
        case c: PyCounter => // missing key reads as 0 without inserting
          c.getOrElse(eval(ix, env, ctx), 0L)
        case dd: PyDefaultDict => // missing key inserts factory() and returns it
          ddGet(dd, eval(ix, env, ctx), ctx)
        case d: LinkedHashMap[_, _] =>
          val k = eval(ix, env, ctx)
          d.asInstanceOf[LinkedHashMap[Any, Any]].getOrElse(k,
            throw new PyError("KeyError", pyRepr(k)))
        case s: String =>
          val i = asLong(eval(ix, env, ctx)).toInt
          val j = if (i < 0) s.length + i else i
          if (j < 0 || j >= s.length)
            throw new PyError("IndexError", "string index out of range")
          s.charAt(j).toString
        case seq: scala.collection.Seq[_] =>
          val i = asLong(eval(ix, env, ctx)).toInt
          val j = if (i < 0) seq.size + i else i
          if (j < 0 || j >= seq.size)
            throw new PyError("IndexError", "list index out of range")
          seq(j)
        case r: RangeVal =>
          val i = asLong(eval(ix, env, ctx))
          val j = if (i < 0) r.size + i else i
          if (j < 0 || j >= r.size)
            throw new PyError("IndexError", "range index out of range")
          r.start + j * r.step
        case other => throw new IllegalArgumentException(s"py: cannot index $other")
      }
    case PSliceIdx(x, lo, hi, stepE) =>
      val v = eval(x, env, ctx)
      val step = stepE.map(s => asLong(eval(s, env, ctx)).toInt).getOrElse(1)
      require(step != 0, "py: slice step cannot be zero")
      def idxs(len: Int): Seq[Int] = {
        def clamp(raw: Option[Int], dflt: Int): Int = raw match {
          case None => dflt
          case Some(i0) =>
            val i = if (i0 < 0) len + i0 else i0
            if (step > 0) math.max(0, math.min(len, i))
            else math.max(-1, math.min(len - 1, i))
        }
        val a = clamp(lo.map(e2 => asLong(eval(e2, env, ctx)).toInt),
          if (step > 0) 0 else len - 1)
        val b = clamp(hi.map(e2 => asLong(eval(e2, env, ctx)).toInt),
          if (step > 0) len else -1)
        (if (step > 0) a.until(b, step) else a.until(b, step)).toSeq
      }
      v match {
        case s: String => idxs(s.length).map(s.charAt).mkString
        case buf: ArrayBuffer[_] => ArrayBuffer[Any](idxs(buf.size).map(buf): _*)
        case t: Vector[_] => idxs(t.size).map(t).toVector
        case other => throw new IllegalArgumentException(s"py: cannot slice $other")
      }
    // sorted/min/max with keyword arguments (key=, reverse=): evaluated
    // here, not in `builtin`, because applying the key needs ctx/env
    case PCall(PName(bn @ ("sorted" | "min" | "max")), args)
        if args.exists(_.isInstanceOf[PKw]) && !args.exists(_.isInstanceOf[PStar])
           && !args.exists(_.isInstanceOf[PKwStar])
           && !ctx.defs.contains(bn) && !env.contains(bn) =>
      val (kwArgs, posArgs) = args.partition(_.isInstanceOf[PKw])
      val kw = kwArgs.collect { case PKw(n, v) => n -> eval(v, env, ctx) }.toMap
      val badKw = kw.keySet -- (if (bn == "sorted") Set("key", "reverse") else Set("key"))
      require(badKw.isEmpty, s"py: $bn() got unexpected keyword ${badKw.mkString(",")}")
      val keyF = kw.get("key")
      val rev = kw.get("reverse").exists(truthy)
      // min(a, b, key=f): multiple positionals ARE the items
      val items: Seq[Any] = posArgs.map(eval(_, env, ctx)) match {
        case Seq(one) => iterSeq(one)
        case many => many
      }
      def keyed(v: Any): Any = keyF.map(f => applyCallable(f, Seq(v), ctx)).getOrElse(v)
      bn match {
        case "sorted" =>
          val pairs = items.map(v => (keyed(v), v))
          // stable TimSort; equal keys keep source order in both directions
          val s = pairs.sortWith { (a, b) =>
            if (rev) pyCompare(a._1, b._1) > 0 else pyCompare(a._1, b._1) < 0 }
          ArrayBuffer[Any](s.map(_._2): _*)
        case "min" | "max" =>
          require(items.nonEmpty, s"py: $bn() arg is an empty sequence")
          val sign = if (bn == "min") -1 else 1
          // first-wins on ties, like CPython
          items.map(v => (keyed(v), v)).reduceLeft { (a, b) =>
            if (pyCompare(b._1, a._1) * sign > 0) b else a }._2
      }
    // name resolution order matches PName: a local binding shadows both
    // helper defs and builtins — a body that rebinds a builtin name
    // (`sum = 0` then `sum(xs)`) must hit the binding (and fail like
    // CPython's TypeError), not silently call the builtin
    case PCall(PName(bi), args) if Builtins(bi) && !ctx.defs.contains(bi)
        && !env.contains(bi) && !args.exists(_.isInstanceOf[PKw])
        && !args.exists(_.isInstanceOf[PStar])
        && !args.exists(_.isInstanceOf[PKwStar]) =>
      builtin(bi, args.map(eval(_, env, ctx)), ctx)
    // zero-arg super(): resolves against the class that DEFINED the
    // currently-executing method (threaded through the frame by every
    // method dispatch site) — CPython's common idiom for calling the
    // base __init__/method from an override
    case PCall(PName("super"), Nil)
        if env.contains("__graft_class__") && !env.contains("super") =>
      SuperProxy(env("__graft_self__").asInstanceOf[PyInstance],
        env("__graft_class__").asInstanceOf[PyClass])
    // argful form (round 10): super(C, obj) starts method lookup above C in
    // obj's class chain — works outside methods too, as in CPython
    case PCall(PName("super"), Seq(ce, se)) if !env.contains("super") =>
      (eval(ce, env, ctx), eval(se, env, ctx)) match {
        case (c: PyClass, inst: PyInstance) =>
          if (!inst.cls.isSubclassOf(c)) throw new PyError("TypeError",
            "super(type, obj): obj must be an instance or subtype of type")
          SuperProxy(inst, c)
        case (c, _) if !c.isInstanceOf[PyClass] =>
          throw new PyError("TypeError", "super() argument 1 must be a type")
        case _ => throw new PyError("TypeError",
          "super(type, obj): obj must be an instance or subtype of type")
      }
    case PCall(PName("super"), _) if !env.contains("__graft_class__") =>
      throw new PyError("RuntimeError", "super(): no arguments and not in a method")
    case PCall(f, rawArgs) =>
      val pos = ArrayBuffer.empty[Any]
      val kw = LinkedHashMap.empty[String, Any]
      rawArgs.foreach {
        case PKw(n, v) => kw(n) = eval(v, env, ctx)
        case PStar(e2) => pos ++= iterate(eval(e2, env, ctx))
        case PKwStar(e2) => eval(e2, env, ctx) match {
          case d: LinkedHashMap[_, _] => d.foreach { case (k, v) =>
            k match {
              case ks: String => kw(ks) = v
              case other => throw new PyError("TypeError",
                s"keywords must be strings, got ${pyStr(other)}")
            }
          }
          case other => throw new PyError("TypeError",
            s"argument after ** must be a dict, got ${pyStr(other)}")
        }
        case a => pos += eval(a, env, ctx)
      }
      applyCallable(eval(f, env, ctx), pos.toSeq, ctx, kw.toMap)
  }

  /** Apply a callable VALUE — helper def, lambda, class, builtin
    * reference, or bound method — to already-evaluated arguments. */
  private def applyCallable(f: Any, args: Seq[Any], ctx: Ctx,
      kwargs: Map[String, Any] = Map.empty): Any = f match {
    case BoundMethod(ReModule, name) => // needs ctx: re.sub repl may be callable
      require(kwargs.isEmpty, s"py: keyword arguments not supported on re.$name")
      reCall(name, args, ctx)
    case BoundMethod(inst: PyInstance, name) =>
      inst.cls.findMethodOwner(name) match {
        case Some((m, owner)) => callIn(m, inst +: args, ctx, kwargs,
          extraEnv = Map("__graft_class__" -> owner, "__graft_self__" -> inst))
        case None => throw new PyError("AttributeError",
          s"'${inst.cls.name}' object has no attribute '$name'")
      }
    case SuperMethod(inst, start, name) =>
      start.flatMap(_.findMethodOwner(name)) match {
        case Some((m, owner)) => callIn(m, inst +: args, ctx, kwargs,
          extraEnv = Map("__graft_class__" -> owner, "__graft_self__" -> inst))
        case None => throw new PyError("AttributeError",
          s"'super' object has no attribute '$name'")
      }
    case BoundMethod(recv, name) =>
      require(kwargs.isEmpty, s"py: keyword arguments not supported on method $name")
      callMethod(recv, name, args)
    case fn: PyFunc => callIn(fn, args, ctx, kwargs)
    case PyClosure(fn, captured) => callIn(fn, args, ctx, kwargs, Some(captured))
    case cls: PyClass => instantiate(cls, args, kwargs, ctx)
    case PyLambda(params, body, captured) =>
      require(kwargs.isEmpty, "py: keyword arguments not supported on lambda")
      require(args.size == params.size,
        s"py: lambda takes ${params.size} arguments, got ${args.size}")
      val lenv = HashMap.empty[String, Any]
      lenv ++= captured
      params.zip(args).foreach { case (p, v) => lenv(p) = v }
      eval(body, lenv, ctx)
    case BuiltinRef(n) => (n, kwargs) match {
      case (_, kw) if kw.isEmpty => builtin(n, args, ctx)
      // product(*its, repeat=n) = product of the iterables repeated n times
      case ("product", kw) if kw.keySet == Set("repeat") =>
        builtin("product", Seq.fill(asLong(kw("repeat")).toInt)(args).flatten, ctx)
      case ("groupby", kw) if kw.keySet == Set("key") && args.size == 1 =>
        builtin("groupby", args :+ kw("key"), ctx)
      case _ => throw new PyError("TypeError",
        s"py: keyword arguments are not supported on $n()")
    }
    case other => throw new PyError("TypeError", s"py: not callable: $other")
  }

  /** Instantiate `cls(...)`: class attributes evaluate into the instance
    * (per-instance; shared mutable class state is out of scope), then
    * `__init__` runs with `self` prepended. */
  private def instantiate(cls: PyClass, args: Seq[Any],
      kwargs: Map[String, Any], ctx: Ctx): Any = {
    val inst = new PyInstance(cls)
    val attrStmts = cls.allAttrs
    if (attrStmts.nonEmpty) {
      val tmp = HashMap.empty[String, Any]
      tmp ++= ctx.constEnv
      exec(attrStmts, tmp, ctx)
      attrStmts.foreach {
        case PAssign(n, _) => inst.attrs(n) = tmp(n)
        case _ =>
      }
    }
    cls.findMethodOwner("__init__") match {
      case Some((init, owner)) => callIn(init, inst +: args, ctx, kwargs,
        extraEnv = Map("__graft_class__" -> owner, "__graft_self__" -> inst))
      case None => require(args.isEmpty && kwargs.isEmpty,
        s"py: ${cls.name}() takes no arguments")
    }
    inst
  }

  /** defaultdict lookup: missing key materializes factory() and inserts. */
  private def ddGet(dd: PyDefaultDict, k: Any, ctx: Ctx): Any =
    dd.get(k) match {
      case Some(v) => v
      case None =>
        if (dd.factory == null) throw new PyError("KeyError", pyRepr(k))
        val v = applyCallable(dd.factory, Nil, ctx)
        dd(k) = v
        v
    }

  /** View a runtime value as a sequence of items (for sorted/min/max). */
  private def iterSeq(v: Any): Seq[Any] = iterate(v).toSeq

  /** Materialize a comprehension / generator expression into a list. */
  private def compIter(elem: PExpr, clauses: Seq[CompClause],
      env: HashMap[String, Any], ctx: Ctx): ArrayBuffer[Any] = {
    val out = ArrayBuffer.empty[Any]
    def go(cs: Seq[CompClause]): Unit = cs match {
      case Nil => out += eval(elem, env, ctx)
      case CFor(names, iterE) +: tail =>
        val it = iterate(eval(iterE, env, ctx))
        while (it.hasNext) { bindTarget(names, it.next(), env); go(tail) }
      case CIf(cond) +: tail =>
        if (truthy(eval(cond, env, ctx))) go(tail)
    }
    go(clauses)
    out
  }

  private def pyContains(container: Any, item: Any): Boolean = container match {
    case s: String => item match {
      case sub: String => s.contains(sub)
      case other => throw new IllegalArgumentException(s"py: 'in <str>' needs str, got $other")
    }
    case seq: scala.collection.Seq[_] => seq.exists(pyEq(_, item))
    case d: LinkedHashMap[_, _] => d.asInstanceOf[LinkedHashMap[Any, Any]].contains(item)
    case r: RangeVal => item match {
      case l: Long => l >= math.min(r.start, r.stop) && l <= math.max(r.start, r.stop) &&
        (l - r.start) % r.step == 0 &&
        (if (r.step > 0) l >= r.start && l < r.stop else l <= r.start && l > r.stop)
      case _ => false
    }
    case other => throw new IllegalArgumentException(s"py: not a container: $other")
  }

  // ------------------------------------------------------------ builtins

  private val Builtins = Set("len", "int", "float", "str", "bool", "abs", "min", "max",
    "sum", "round", "sorted", "reversed", "list", "tuple", "dict", "range",
    "enumerate", "zip", "any", "all", "next", "ord", "chr", "print", "repr",
    "map", "filter", "isinstance")

  /** An infinite itertools generator (count/cycle/argless repeat): a
    * [[LazyGen]] registered with the ctx so the top-level call closes it
    * when the consumer exits early; the 10M-yield budget guards a
    * full-consumption attempt. */
  private def infiniteGen(name: String, ctx: Ctx)(body: (Any => Unit) => Unit): LazyGen = {
    val g = new LazyGen(name, emit => body(v => { emit(v); () }))
    ctx.openGens += g
    g
  }

  /** Overflow-saturating multiply for combinator size guards. */
  private def satMul(a: Long, b: Long): Long =
    try Math.multiplyExact(a, b)
    catch { case _: ArithmeticException => Long.MaxValue }

  private def builtin(name: String, args: Seq[Any], ctx: Ctx): Any = (name, args) match {
    // map/filter return eager lists (CPython: lazy iterators) — every
    // supported consumer (list/sum/any/for/…) materializes anyway
    case ("map", Seq(f, seq)) =>
      ArrayBuffer[Any](iterate(seq).map(v => applyCallable(f, Seq(v), ctx)).toSeq: _*)
    case ("map", f +: seqs) if seqs.size >= 2 =>
      val its = seqs.map(iterate)
      val out = ArrayBuffer.empty[Any]
      while (its.forall(_.hasNext)) out += applyCallable(f, its.map(_.next()), ctx)
      out
    case ("filter", Seq(f, seq)) =>
      ArrayBuffer[Any](iterate(seq).filter(v =>
        if (f == null) truthy(v) else truthy(applyCallable(f, Seq(v), ctx))).toSeq: _*)
    // ------------------- functools / itertools subset (round 10; every
    // expectation CPython-mirrored in PyInterpSpec). Finite combinators
    // are EAGER (bounded by their inputs); count/cycle/argless repeat are
    // true lazy generators. Tuples are Vector, lists ArrayBuffer, as
    // everywhere in this interpreter.
    case ("reduce", Seq(f, it)) =>
      val xs = iterate(it)
      if (!xs.hasNext) throw new PyError("TypeError",
        "reduce() of empty iterable with no initial value")
      var acc = xs.next()
      while (xs.hasNext) acc = applyCallable(f, Seq(acc, xs.next()), ctx)
      acc
    case ("reduce", Seq(f, it, init)) =>
      var acc = init
      val xs = iterate(it)
      while (xs.hasNext) acc = applyCallable(f, Seq(acc, xs.next()), ctx)
      acc
    case ("chain", its) =>
      val out = ArrayBuffer.empty[Any]
      its.foreach(out ++= iterate(_))
      out
    case ("product", its) =>
      val pools = its.map(iterate(_).toVector).toVector
      // saturating multiply: unchecked n * size could overflow past the
      // min-cap (large pools -> small/negative product) and bypass the
      // guard, eagerly materializing an executor-OOM-sized cross product
      val total = pools.foldLeft(1L)((n, p) => satMul(n, math.max(p.size, 1)))
      require(total <= 10000000L, s"py: product() would yield $total tuples")
      val tuples = pools.foldLeft(Vector(Vector.empty[Any])) { (acc, pool) =>
        acc.flatMap(t => pool.map(x => t :+ x))
      }
      ArrayBuffer[Any](tuples: _*)
    case ("combinations", Seq(it, r)) =>
      // positional semantics (CPython): equal elements are NOT deduped —
      // Scala's .combinations treats them as indistinct, so roll our own
      val xs = iterate(it).toVector
      val k = asLong(r).toInt
      require(k >= 0, "py: combinations() r must be non-negative")
      def go(start: Int, k: Int): Seq[Vector[Any]] =
        if (k == 0) Seq(Vector.empty)
        else (start to xs.length - k).flatMap(i => go(i + 1, k - 1).map(xs(i) +: _))
      ArrayBuffer[Any](go(0, k).map(v => v: Any): _*)
    case ("permutations", it +: rest) if rest.size <= 1 =>
      val xs = iterate(it).toVector
      val k = rest.headOption.map(asLong(_).toInt).getOrElse(xs.length)
      require(k >= 0, "py: permutations() r must be non-negative")
      val count = (0 until k).foldLeft(1L)((n, i) =>
        satMul(n, math.max(xs.length - i, 1)))
      require(count <= 10000000L, s"py: permutations() would yield $count tuples")
      def go(pool: Vector[Any], k: Int): Seq[Vector[Any]] =
        if (k == 0) Seq(Vector.empty)
        else pool.indices.flatMap(i =>
          go(pool.patch(i, Nil, 1), k - 1).map(pool(i) +: _))
      ArrayBuffer[Any](go(xs, k).map(v => v: Any): _*)
    case ("accumulate", it +: rest) if rest.size <= 1 =>
      val xs = iterate(it)
      val out = ArrayBuffer.empty[Any]
      if (xs.hasNext) {
        var acc = xs.next(); out += acc
        while (xs.hasNext) {
          val x = xs.next()
          acc = rest.headOption match {
            case Some(f) => applyCallable(f, Seq(acc, x), ctx)
            case None => binop("+", acc, x)
          }
          out += acc
        }
      }
      out
    case ("islice", Seq(it, stop)) =>
      ArrayBuffer[Any](iterate(it).take(asLong(stop).toInt).toSeq: _*)
    case ("islice", Seq(it, start, stop)) =>
      ArrayBuffer[Any](
        iterate(it).slice(asLong(start).toInt, asLong(stop).toInt).toSeq: _*)
    case ("repeat", Seq(x, n)) => ArrayBuffer.fill[Any](asLong(n).toInt)(x)
    case ("repeat", Seq(x)) =>
      infiniteGen("repeat", ctx)(emit => while (true) emit(x))
    case ("count", as) if as.size <= 2 =>
      val start: Any = as.headOption.getOrElse(0L)
      val step: Any = if (as.size > 1) as(1) else 1L
      infiniteGen("count", ctx) { emit =>
        var cur = start
        while (true) { emit(cur); cur = binop("+", cur, step) }
      }
    case ("cycle", Seq(it)) =>
      val base = iterate(it).toVector // CPython caches the first pass too
      if (base.isEmpty) ArrayBuffer.empty[Any]
      else infiniteGen("cycle", ctx)(emit => while (true) base.foreach(emit))
    case ("groupby", it +: rest) if rest.size <= 1 =>
      // CPython: groups CONSECUTIVE equal-key runs; (key, group-list) pairs
      val out = ArrayBuffer.empty[Any]
      var curKey: Any = null
      var cur: ArrayBuffer[Any] = null
      iterate(it).foreach { x =>
        val k = rest.headOption.map(f => applyCallable(f, Seq(x), ctx)).getOrElse(x)
        if (cur == null || !pyEq(k, curKey)) {
          if (cur != null) out += Vector(curKey, cur)
          cur = ArrayBuffer.empty; curKey = k
        }
        cur += x
      }
      if (cur != null) out += Vector(curKey, cur)
      out
    case ("Counter", Nil) => new PyCounter
    case ("Counter", Seq(src)) =>
      val c = new PyCounter
      src match {
        case d: LinkedHashMap[_, _] =>
          d.asInstanceOf[LinkedHashMap[Any, Any]].foreach { case (k, v) => c(k) = v }
        case it if isIterable(it) =>
          iterate(it).foreach(k => c(k) = asLong(c.getOrElse(k, 0L)) + 1L)
        case other => throw new PyError("TypeError", s"Counter(${pyStr(other)})")
      }
      c
    case ("defaultdict", Nil) => new PyDefaultDict(null)
    case ("defaultdict", Seq(f)) => new PyDefaultDict(f)
    case ("isinstance", Seq(v, t)) =>
      def check(tp: Any): Boolean = tp match {
        case BuiltinRef("int") => v.isInstanceOf[Long] || v.isInstanceOf[Boolean]
        case BuiltinRef("float") => v.isInstanceOf[Double]
        case BuiltinRef("str") => v.isInstanceOf[String]
        case BuiltinRef("bool") => v.isInstanceOf[Boolean]
        case BuiltinRef("list") => v.isInstanceOf[ArrayBuffer[_]]
        case BuiltinRef("tuple") => v.isInstanceOf[Vector[_]]
        case BuiltinRef("dict") => v.isInstanceOf[LinkedHashMap[_, _]]
        case cls: PyClass => v match {
          case inst: PyInstance => inst.cls.isSubclassOf(cls)
          case _ => false
        }
        case other => throw new PyError("TypeError",
          s"isinstance() arg 2 must be a type, got ${pyStr(other)}")
      }
      t match {
        case types: Vector[_] => types.exists(check)
        case one => check(one)
      }
    case ("len", Seq(a)) => a match {
      case s: String => s.length.toLong
      case seq: scala.collection.Seq[_] => seq.size.toLong
      case d: LinkedHashMap[_, _] => d.size.toLong
      case r: RangeVal => r.size
      case other => throw new IllegalArgumentException(s"py: len($other)")
    }
    case ("int", Seq(a)) => a match {
      case l: Long => l
      case d: Double => d.toLong
      case s: String => try s.trim.toLong catch {
        case _: NumberFormatException =>
          throw new PyError("ValueError", s"invalid literal for int(): '$s'")
      }
      case b: Boolean => asLong(b)
      case other => throw new IllegalArgumentException(s"py: int($other)")
    }
    case ("int", Nil) => 0L
    case ("float", Nil) => 0.0
    case ("bool", Nil) => false
    case ("int", Seq(s: String, base: Long)) => java.lang.Long.parseLong(s.trim, base.toInt)
    case ("float", Seq(a)) => a match {
      case l: Long => l.toDouble
      case d: Double => d
      case s: String => s.trim.toDouble
      case b: Boolean => asLong(b).toDouble
      case other => throw new IllegalArgumentException(s"py: float($other)")
    }
    case ("abs", Seq(a)) => a match {
      case l: Long => Math.abs(l)
      case d: Double => Math.abs(d)
      case other => throw new IllegalArgumentException(s"py: abs($other)")
    }
    case ("str", Seq(a)) => pyStr(a)
    case ("str", Nil) => ""
    case ("repr", Seq(a)) => pyRepr(a)
    case ("bool", Seq(a)) => truthy(a)
    case ("ord", Seq(s: String)) =>
      require(s.length == 1, s"py: ord() expected a character, got '$s'")
      s.charAt(0).toLong
    case ("chr", Seq(l: Long)) => l.toChar.toString
    case ("min", Seq(seq)) if isIterable(seq) => reduceIter(seq, keepMin = true)
    case ("min", xs) if xs.size >= 2 => xs.reduce((a, b) => if (pyCompare(a, b) <= 0) a else b)
    case ("max", Seq(seq)) if isIterable(seq) => reduceIter(seq, keepMin = false)
    case ("max", xs) if xs.size >= 2 => xs.reduce((a, b) => if (pyCompare(a, b) >= 0) a else b)
    case ("sum", Seq(seq)) => iterate(seq).foldLeft(0L: Any)((acc, v) => binop("+", acc, v))
    case ("sum", Seq(seq, init)) => iterate(seq).foldLeft(init)((acc, v) => binop("+", acc, v))
    case ("round", Seq(d: Double)) => roundHalfEven(d, 0) match { case r => r.toLong }
    case ("round", Seq(l: Long)) => l
    case ("round", Seq(d: Double, n: Long)) => roundHalfEven(d, n.toInt)
    case ("round", Seq(l: Long, _: Long)) => l
    case ("sorted", Seq(seq)) =>
      ArrayBuffer[Any](iterate(seq).toSeq.sortWith((a, b) => pyCompare(a, b) < 0): _*)
    case ("reversed", Seq(seq)) => ArrayBuffer[Any](iterate(seq).toSeq.reverse: _*)
    case ("list", Nil) => ArrayBuffer.empty[Any]
    case ("list", Seq(seq)) => ArrayBuffer[Any](iterate(seq).toSeq: _*)
    case ("tuple", Nil) => Vector.empty[Any]
    case ("tuple", Seq(seq)) => iterate(seq).toVector
    case ("dict", Nil) => LinkedHashMap.empty[Any, Any]
    case ("dict", Seq(d: LinkedHashMap[_, _])) =>
      d.asInstanceOf[LinkedHashMap[Any, Any]].clone()
    case ("dict", Seq(seq)) if isIterable(seq) =>
      val m = LinkedHashMap.empty[Any, Any]
      iterate(seq).foreach {
        case kv: scala.collection.Seq[_] if kv.size == 2 => m(kv(0)) = kv(1)
        case other => throw new IllegalArgumentException(s"py: dict() needs pairs, got $other")
      }
      m
    case ("range", xs) =>
      val nums = xs.map(asLong)
      nums match {
        case Seq(u) => RangeVal(0, u, 1)
        case Seq(f, u) => RangeVal(f, u, 1)
        case Seq(f, u, s) => require(s != 0, "py: range() step cannot be zero"); RangeVal(f, u, s)
        case _ => throw new IllegalArgumentException("py: bad range()")
      }
    case ("enumerate", Seq(seq)) =>
      ArrayBuffer[Any](iterate(seq).zipWithIndex.map { case (v, i) =>
        Vector(i.toLong, v) }.toSeq: _*)
    case ("enumerate", Seq(seq, start: Long)) =>
      ArrayBuffer[Any](iterate(seq).zipWithIndex.map { case (v, i) =>
        Vector(i + start, v) }.toSeq: _*)
    case ("zip", xs) if xs.nonEmpty =>
      val its = xs.map(iterate)
      val out = ArrayBuffer.empty[Any]
      while (its.forall(_.hasNext)) out += its.map(_.next()).toVector
      out
    case ("any", Seq(seq)) => iterate(seq).exists(truthy)
    case ("all", Seq(seq)) => iterate(seq).forall(truthy)
    case ("next", Seq(g: LazyGen)) =>
      if (g.hasNext) g.next() else throw new PyError("StopIteration", "")
    case ("next", Seq(g: LazyGen, dflt)) =>
      if (g.hasNext) g.next() else dflt
    case ("print", xs) => // no stdout on executors; a no-op returning None
      null
    case (n, a) => throw new IllegalArgumentException(s"py: $n(${a.mkString(", ")})")
  }

  private def isIterable(v: Any): Boolean = v match {
    case _: scala.collection.Seq[_] | _: String | _: RangeVal
       | _: LinkedHashMap[_, _] | _: LazyGen => true
    case _ => false
  }

  private def reduceIter(seq: Any, keepMin: Boolean): Any = {
    val it = iterate(seq)
    require(it.hasNext, s"py: ${if (keepMin) "min" else "max"}() of empty sequence")
    it.reduce((a, b) =>
      if ((pyCompare(a, b) <= 0) == keepMin) a else b)
  }

  /** Python 3 banker's rounding to n digits — over the EXACT binary value
    * of the double (new BigDecimal(d)), like CPython: round(2.675, 2) is
    * 2.67 because 2.675 stores as 2.67499…; Scala's BigDecimal(Double)
    * would round the shortest decimal rendering and give 2.68. */
  private def roundHalfEven(d: Double, n: Int): Double =
    new java.math.BigDecimal(d).setScale(n, java.math.RoundingMode.HALF_EVEN).doubleValue()

  /** Python str() rendering (used for the StringType return conversion). */
  def pyStrPublic(v: Any): String = pyStr(v)

  private def pyStr(v: Any): String = v match {
    case null => "None"
    case true => "True"
    case false => "False"
    case d: Double =>
      if (d.isNaN) "nan"
      else if (d.isInfinite) { if (d > 0) "inf" else "-inf" }
      else if (d.isWhole && math.abs(d) < 1e16) d.toLong.toString + ".0"
      else d.toString
    case s: String => s
    case buf: ArrayBuffer[_] => buf.map(pyRepr).mkString("[", ", ", "]")
    case t: Vector[_] =>
      if (t.size == 1) s"(${pyRepr(t.head)},)" else t.map(pyRepr).mkString("(", ", ", ")")
    case d: LinkedHashMap[_, _] =>
      d.map { case (k, x) => s"${pyRepr(k)}: ${pyRepr(x)}" }.mkString("{", ", ", "}")
    case r: RangeVal =>
      if (r.step == 1) s"range(${r.start}, ${r.stop})"
      else s"range(${r.start}, ${r.stop}, ${r.step})"
    case inst: PyInstance => s"<${inst.cls.name} object>"
    case m: PyMatch => s"<re.Match span=(${m.startPos}, ${m.endPos}), " +
      s"match=${pyRepr(m.groupVals(0))}>"
    case other => String.valueOf(other)
  }

  private def pyRepr(v: Any): String = v match {
    case s: String => "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case other => pyStr(other)
  }

  /** `{v:spec}` formatting: supports `.Nf`, `.Ne`, `d`, `Nd` (width),
    * `0Nd`, `>N`/`<N` string padding; empty spec = str(). */
  private def formatSpec(v: Any, spec: String): String = {
    if (spec.isEmpty) return pyStr(v)
    val fixRe = "^\\.([0-9]+)f$".r
    val expRe = "^\\.([0-9]+)e$".r
    val intRe = "^(0?)([0-9]*)d$".r
    val padRe = "^([<>])([0-9]+)$".r
    spec match {
      case fixRe(n) => String.format(s"%.${n}f", Double.box(num2(v, 0L) match {
        case Left((a, _)) => a.toDouble; case Right((a, _)) => a }))
      case expRe(n) => String.format(s"%.${n}e", Double.box(num2(v, 0L) match {
        case Left((a, _)) => a.toDouble; case Right((a, _)) => a }))
      case intRe(zero, w) =>
        val l = asLong(v)
        if (w.isEmpty) l.toString
        else String.format(s"%${if (zero == "0") "0" else ""}${w}d", Long.box(l))
      case padRe(dir, w) =>
        val s = pyStr(v); val pad = w.toInt - s.length
        if (pad <= 0) s
        else if (dir == "<") s + " " * pad
        else " " * pad + s
      case _ => throw new IllegalArgumentException(s"py: unsupported format spec '$spec'")
    }
  }

  /** Python `%` string formatting: `'%s=%d' % (k, v)` / `'%s' % x`.
    * Subset: flags `-`/`0`, width, `.prec`, conversions s r d i f e g x X o %%. */
  private def pyPercentFormat(fmt: String, arg: Any): String = {
    val args: Seq[Any] = arg match {
      case t: Vector[_] => t
      case other => Seq(other)
    }
    val sb = new java.lang.StringBuilder
    var i = 0
    var ai = 0
    def nextArg(): Any = {
      require(ai < args.size, "py: not enough arguments for format string")
      val v = args(ai); ai += 1; v
    }
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c != '%') { sb.append(c); i += 1 }
      else {
        require(i + 1 < fmt.length, "py: incomplete format")
        val s = i + 1
        var j = s
        while (j < fmt.length && "-0+ #".indexOf(fmt.charAt(j)) >= 0) j += 1
        while (j < fmt.length && fmt.charAt(j).isDigit) j += 1
        if (j < fmt.length && fmt.charAt(j) == '.') {
          j += 1
          while (j < fmt.length && fmt.charAt(j).isDigit) j += 1
        }
        require(j < fmt.length, "py: incomplete format")
        val conv = fmt.charAt(j)
        val spec = fmt.substring(s, j) // flags+width+precision, printf-compatible
        conv match {
          case '%' => sb.append('%')
          case 's' => sb.append(String.format(s"%${spec}s", pyStr(nextArg())))
          case 'r' => sb.append(String.format(s"%${spec}s", pyRepr(nextArg())))
          case 'd' | 'i' => sb.append(String.format(s"%${spec}d", Long.box(asLong(nextArg()))))
          case 'x' | 'X' | 'o' =>
            sb.append(String.format(s"%$spec$conv", Long.box(asLong(nextArg()))))
          case 'f' | 'e' | 'g' =>
            val d = num2(nextArg(), 0L) match {
              case Left((a, _)) => a.toDouble; case Right((a, _)) => a
            }
            sb.append(String.format(s"%$spec$conv", Double.box(d)))
          case other => throw new IllegalArgumentException(
            s"py: unsupported format character '$other'")
        }
        i = j + 1
      }
    }
    require(ai == args.size || !arg.isInstanceOf[Vector[_]],
      "py: not all arguments converted during string formatting")
    sb.toString
  }

  private final case class BoundMethod(recv: Any, name: String)

  /** `super()` inside a method: method lookup starts ABOVE the class that
    * defined the currently-executing method (zero-arg CPython form; the
    * defining class rides the frame as __graft_class__, round 9). */
  private final case class SuperProxy(inst: PyInstance, above: PyClass)
  private final case class SuperMethod(inst: PyInstance, start: Option[PyClass],
    name: String)

  /** A `lambda` value: params + body expression + the DEFINING frame's env
    * (shared by reference, so reads see the enclosing frame's current
    * bindings — CPython closure cells for the read-only case; writes are
    * out of scope, as for defs). */
  private final case class PyLambda(params: Seq[String], body: PExpr,
    captured: HashMap[String, Any])

  /** A nested `def` bound as a value: full statement body + the DEFINING
    * frame's env, shared by reference (CPython closure cells). Reads fall
    * through to the enclosing frame; assignment is local (CPython:
    * assignment without `nonlocal` creates a local) unless declared
    * `nonlocal`, which writes through to the enclosing frame — see
    * [[ChainedEnv]]. Self- and sibling-recursion work because the closure
    * name is bound in the defining frame before any call. */
  private final case class PyClosure(fn: PyFunc, captured: HashMap[String, Any])

  /** Frame env: lookup chains to the parent scope (the defining frame for
    * closures, the module env for top-level defs — live, by reference);
    * writes stay local (CPython: assignment is local) unless the name was
    * declared `nonlocal` (→ parent frame; closures only) or `global`
    * (→ module env). Reading a statically-determined local (`locals` —
    * [[PyFunc.localNames]]) before its first binding raises
    * UnboundLocalError with CPython 3.11's wording instead of leaking the
    * enclosing binding through (round 10 — closes the last documented
    * scoping divergence). */
  private final class ChainedEnv(parent: HashMap[String, Any],
      val moduleEnv: HashMap[String, Any], val isClosure: Boolean,
      locals: Set[String] = Set.empty)
      extends HashMap[String, Any] {
    val nonlocals = scala.collection.mutable.HashSet.empty[String]
    val globals = scala.collection.mutable.HashSet.empty[String]
    override def get(k: String): Option[Any] =
      if (globals(k)) moduleEnv.get(k)
      else if (nonlocals(k)) parent.get(k)
      else super.get(k) match {
        case s @ Some(_) => s
        case None if locals(k) => throw new PyError("UnboundLocalError",
          s"cannot access local variable '$k' where it is not associated with a value")
        case None => parent.get(k)
      }
    override def apply(k: String): Any =
      get(k).getOrElse(throw new NoSuchElementException(s"key not found: $k"))
    override def getOrElse[V1 >: Any](k: String, default: => V1): V1 =
      get(k).getOrElse(default)
    override def contains(k: String): Boolean =
      if (globals(k)) moduleEnv.contains(k)
      else super.contains(k) || (!locals(k) && parent.contains(k))
    override def put(k: String, v: Any): Option[Any] =
      if (globals(k)) moduleEnv.put(k, v)
      else if (nonlocals(k)) parent.put(k, v)
      else super.put(k, v)
    override def update(k: String, v: Any): Unit = { put(k, v); () }
  }

  /** A builtin referenced as a value (`key=len`). */
  private final case class BuiltinRef(name: String)

  /** A Python-visible runtime error: `kind` is the exception class name
    * (`ValueError`, `KeyError`, …) that `except <kind>` matches on;
    * `pyMsg` is what `str(e)` yields in CPython (no class prefix). */
  final class PyError(val kind: String, val pyMsg: String)
    extends RuntimeException(s"$kind: $pyMsg")

  private def callMethod(recv: Any, name: String, args: Seq[Any]): Any = (recv, name) match {
    case (g: LazyGen, "send") =>
      require(args.size == 1, "py: send() takes exactly one argument")
      g.send(args.head)
    case (g: LazyGen, "close") => g.close(); null
    case (s: String, "upper") => s.toUpperCase
    case (s: String, "lower") => s.toLowerCase
    case (s: String, "strip" | "lstrip" | "rstrip") =>
      val drop: Char => Boolean = args match {
        case Nil => _.isWhitespace
        case Seq(chars: String) => chars.contains(_)
        case other => throw new IllegalArgumentException(s"py: $name($other)")
      }
      val l = if (name == "rstrip") s else s.dropWhile(drop)
      if (name == "lstrip") l else l.reverse.dropWhile(drop).reverse
    case (s: String, "startswith") => s.startsWith(args.head.asInstanceOf[String])
    case (s: String, "endswith") => s.endsWith(args.head.asInstanceOf[String])
    case (s: String, "replace") =>
      s.replace(args(0).asInstanceOf[String], args(1).asInstanceOf[String])
    case (s: String, "split") => args match {
      case Nil => ArrayBuffer[Any](s.split("\\s+").filter(_.nonEmpty).toSeq: _*)
      case Seq(sep: String) =>
        // Python split keeps empty fields; Java's split drops trailing ones
        val out = ArrayBuffer.empty[Any]
        var from = 0
        var i = s.indexOf(sep)
        while (i >= 0) { out += s.substring(from, i); from = i + sep.length; i = s.indexOf(sep, from) }
        out += s.substring(from)
        out
      case _ => throw new IllegalArgumentException("py: split(sep, maxsplit) unsupported")
    }
    case (s: String, "join") =>
      iterate(args.head).map {
        case x: String => x
        case other => throw new IllegalArgumentException(s"py: join() needs strings, got $other")
      }.mkString(s)
    case (s: String, "find") => s.indexOf(args.head.asInstanceOf[String]).toLong
    case (s: String, "rfind") => s.lastIndexOf(args.head.asInstanceOf[String]).toLong
    case (s: String, "index") =>
      val i = s.indexOf(args.head.asInstanceOf[String])
      require(i >= 0, "py: ValueError: substring not found")
      i.toLong
    case (s: String, "count") =>
      val sub = args.head.asInstanceOf[String]
      if (sub.isEmpty) (s.length + 1).toLong
      else { var c = 0L; var i = s.indexOf(sub); while (i >= 0) { c += 1; i = s.indexOf(sub, i + sub.length) }; c }
    case (s: String, "isdigit") => s.nonEmpty && s.forall(_.isDigit)
    case (s: String, "isalpha") => s.nonEmpty && s.forall(_.isLetter)
    case (s: String, "isalnum") => s.nonEmpty && s.forall(_.isLetterOrDigit)
    case (s: String, "isspace") => s.nonEmpty && s.forall(_.isWhitespace)
    case (s: String, "islower") => s.exists(_.isLetter) && s.filter(_.isLetter).forall(_.isLower)
    case (s: String, "isupper") => s.exists(_.isLetter) && s.filter(_.isLetter).forall(_.isUpper)
    case (s: String, "zfill") =>
      val w = asLong(args.head).toInt
      if (s.length >= w) s
      else if (s.startsWith("-") || s.startsWith("+"))
        s.head + ("0" * (w - s.length)) + s.tail
      else ("0" * (w - s.length)) + s
    case (s: String, "capitalize") =>
      if (s.isEmpty) s else s.head.toUpper + s.tail.toLowerCase
    case (s: String, "title") =>
      val sb = new java.lang.StringBuilder
      var prevLetter = false
      s.foreach { c =>
        sb.append(if (c.isLetter && !prevLetter) c.toUpper else c.toLower)
        prevLetter = c.isLetter
      }
      sb.toString
    case (s: String, "format") =>
      // positional {} / {0} only (no format specs in .format —
      // f-strings carry those)
      var i = -1
      "\\{([0-9]*)\\}".r.replaceAllIn(s, m => {
        val idx = if (m.group(1).isEmpty) { i += 1; i } else m.group(1).toInt
        java.util.regex.Matcher.quoteReplacement(pyStr(args(idx)))
      })

    case (m: PyMatch, "group") => args match {
      case Nil => m.groupVals(0)
      case Seq(i: Long) =>
        if (i < 0 || i >= m.groupVals.size)
          throw new PyError("IndexError", "no such group")
        m.groupVals(i.toInt)
      case Seq(s: String) => m.named.getOrElse(s,
        throw new PyError("IndexError", s"no such group '$s'"))
      case many => many.map {
        case i: Long => m.groupVals(i.toInt)
        case s: String => m.named.getOrElse(s,
          throw new PyError("IndexError", s"no such group '$s'"))
        case other => throw new PyError("TypeError", s"group(${pyStr(other)})")
      }.toVector
    }
    case (m: PyMatch, "groups") => m.groupVals.drop(1)
    case (m: PyMatch, "start") => m.startPos
    case (m: PyMatch, "end") => m.endPos
    case (m: PyMatch, "span") => Vector(m.startPos, m.endPos)
    case (m: PyMatch, "groupdict") =>
      val d = LinkedHashMap.empty[Any, Any]
      m.named.foreach { case (k, v) => d(k) = v }
      d

    case (c: PyCounter, "most_common") =>
      // count-descending, insertion order on ties (CPython 3.7+)
      val sorted = c.toSeq.sortWith((a, b) => pyCompare(a._2, b._2) > 0)
      val n = if (args.isEmpty) sorted.size else asLong(args.head).toInt
      ArrayBuffer[Any](sorted.take(n).map { case (k, v) => Vector(k, v) }: _*)
    case (c: PyCounter, "update") =>
      args.head match {
        case d: LinkedHashMap[_, _] =>
          d.asInstanceOf[LinkedHashMap[Any, Any]].foreach { case (k, v) =>
            c(k) = binop("+", c.getOrElse(k, 0L), v) }
        case it => iterate(it).foreach(k => c(k) = asLong(c.getOrElse(k, 0L)) + 1L)
      }
      null

    case (buf: ArrayBuffer[_], m) =>
      val b = buf.asInstanceOf[ArrayBuffer[Any]]
      m match {
        case "append" => b += args.head; null
        case "pop" =>
          require(b.nonEmpty, "py: pop from empty list")
          val i0 = if (args.isEmpty) b.size - 1 else {
            val i = asLong(args.head).toInt; if (i < 0) b.size + i else i
          }
          require(i0 >= 0 && i0 < b.size, "py: pop index out of range")
          b.remove(i0)
        case "insert" =>
          val i = math.max(0, math.min(b.size, asLong(args.head).toInt))
          b.insert(i, args(1)); null
        case "extend" => iterate(args.head).foreach(b += _); null
        case "remove" =>
          val i = b.indexWhere(pyEq(_, args.head))
          require(i >= 0, "py: ValueError: list.remove(x): x not in list")
          b.remove(i); null
        case "index" =>
          val i = b.indexWhere(pyEq(_, args.head))
          require(i >= 0, "py: ValueError: not in list")
          i.toLong
        case "count" => b.count(pyEq(_, args.head)).toLong
        case "sort" =>
          val sorted = b.sortWith((a, c) => pyCompare(a, c) < 0)
          b.clear(); b ++= sorted; null
        case "reverse" =>
          val rev = b.reverse
          b.clear(); b ++= rev; null
        case "copy" => b.clone()
        case other => throw new IllegalArgumentException(s"py: no list method $other")
      }

    case (d0: LinkedHashMap[_, _], m) =>
      val d = d0.asInstanceOf[LinkedHashMap[Any, Any]]
      m match {
        case "get" => d.getOrElse(args.head, if (args.size > 1) args(1) else null)
        case "keys" => ArrayBuffer[Any](d.keys.toSeq: _*)
        case "values" => ArrayBuffer[Any](d.values.toSeq: _*)
        case "items" => ArrayBuffer[Any](d.map { case (k, v) => Vector(k, v) }.toSeq: _*)
        case "pop" =>
          d.remove(args.head) match {
            case Some(v) => v
            case None if args.size > 1 => args(1)
            case None => throw new PyError("KeyError", pyRepr(args.head))
          }
        case "setdefault" =>
          d.getOrElseUpdate(args.head, if (args.size > 1) args(1) else null)
        case "update" =>
          args.head.asInstanceOf[LinkedHashMap[Any, Any]].foreach { case (k, v) => d(k) = v }
          null
        case "copy" => d.clone()
        case other => throw new IllegalArgumentException(s"py: no dict method $other")
      }

    case (MathModule, fname) =>
      def d1 = num2(args.head, 0L) match { case Left((a, _)) => a.toDouble; case Right((a, _)) => a }
      def d2v = num2(args(1), 0L) match { case Left((a, _)) => a.toDouble; case Right((a, _)) => a }
      fname match {
        case "sqrt" => math.sqrt(d1)
        case "floor" => math.floor(d1).toLong // Python 3 math.floor → int
        case "ceil" => math.ceil(d1).toLong
        case "trunc" => d1.toLong
        case "log" => if (args.size > 1) math.log(d1) / math.log(d2v) else math.log(d1)
        case "log2" => math.log(d1) / math.log(2)
        case "log10" => math.log10(d1)
        case "exp" => math.exp(d1)
        case "pow" => math.pow(d1, d2v)
        case "sin" => math.sin(d1)
        case "cos" => math.cos(d1)
        case "tan" => math.tan(d1)
        case "asin" => math.asin(d1)
        case "acos" => math.acos(d1)
        case "atan" => math.atan(d1)
        case "atan2" => math.atan2(d1, d2v)
        case "fabs" => math.abs(d1)
        case "hypot" => math.hypot(d1, d2v)
        case "fmod" => d1 % d2v // C semantics, unlike Python's %
        case "isnan" => d1.isNaN
        case "isinf" => d1.isInfinite
        case "degrees" => math.toDegrees(d1)
        case "radians" => math.toRadians(d1)
        case "copysign" => math.copySign(d1, d2v)
        case "gcd" =>
          var (a, b) = (math.abs(asLong(args.head)), math.abs(asLong(args(1))))
          while (b != 0) { val t = a % b; a = b; b = t }
          a
        case other => throw new IllegalArgumentException(s"py: math.$other unsupported")
      }

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
    case (v2, StringType) => UTF8String.fromString(PyInterp.pyStrPublic(v2))
    case (d: LocalDate, DateType) => d.toEpochDay.toInt
    case (b: Boolean, IntegerType) => if (b) 1 else 0
    case other =>
      throw new IllegalArgumentException(s"py: cannot convert $other to $retType")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
