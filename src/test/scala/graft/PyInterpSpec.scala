package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PyInterp
import scala.collection.mutable.ArrayBuffer

/** Direct interpreter tests for the structured-Python subset (no Spark
  * session needed). Each expectation mirrors CPython 3 output exactly —
  * run any of these bodies through `python3` to re-verify. */
class PyInterpSpec extends AnyFunSuite {

  private def run(src: String, args: Any*): Any =
    PyInterp.call(PyInterp.parse(src.stripMargin), args.toSeq)

  test("while loop with break/continue") {
    val src =
      """def f(n):
        |    total = 0
        |    i = 0
        |    while True:
        |        i += 1
        |        if i > n:
        |            break
        |        if i % 2 == 0:
        |            continue
        |        total += i
        |    return total"""
    assert(run(src, 10L) == 25L) // 1+3+5+7+9
  }

  test("elif chains") {
    val src =
      """def grade(x):
        |    if x >= 90:
        |        return 'A'
        |    elif x >= 80:
        |        return 'B'
        |    elif x >= 70:
        |        return 'C'
        |    else:
        |        return 'F'"""
    assert(run(src, 95L) == "A")
    assert(run(src, 85L) == "B")
    assert(run(src, 71L) == "C")
    assert(run(src, 3L) == "F")
  }

  test("and/or return the operand (Python value semantics), not in") {
    val src =
      """def f(x, y):
        |    a = x or 'default'
        |    b = x and y
        |    c = 'z' not in y
        |    return a + '|' + str(b) + '|' + str(c)"""
    assert(run(src, "", "abc") == "default||True")
    assert(run(src, "v", "xyz") == "v|xyz|False")
  }

  test("chained comparisons evaluate each operand once, short-circuit") {
    val src =
      """def f(x):
        |    return 1 <= x < 10 == 10"""
    assert(run(src, 5L) == true)
    assert(run(src, 10L) == false)
    assert(run(src, 0L) == false)
  }

  test("ternary expression") {
    val src =
      """def f(x):
        |    return 'neg' if x < 0 else ('zero' if x == 0 else 'pos')"""
    assert(run(src, -3L) == "neg")
    assert(run(src, 0L) == "zero")
    assert(run(src, 9L) == "pos")
  }

  test("dict literal, subscript get/set, get/keys/values/items, in") {
    val src =
      """def f(k):
        |    d = {'a': 1, 'b': 2}
        |    d['c'] = d['a'] + d['b']
        |    d['a'] += 10
        |    has = k in d
        |    return str(d['c']) + '|' + str(d.get(k, -1)) + '|' + str(has) + '|' + str(len(d))"""
    assert(run(src, "a") == "3|11|True|3")
    assert(run(src, "z") == "3|-1|False|3")
  }

  test("dict iteration preserves insertion order; items unpack in for") {
    val src =
      """def f():
        |    d = {'x': 1, 'y': 2, 'z': 3}
        |    out = ''
        |    for k, v in d.items():
        |        out = out + k + str(v)
        |    return out"""
    assert(run(src) == "x1y2z3")
  }

  test("tuples: literals, indexing, comparison, str()") {
    val src =
      """def f():
        |    t = (1, 'two', 3.5)
        |    u = (1, 2) < (1, 3)
        |    return str(t[1]) + '|' + str(u) + '|' + str(t)"""
    assert(run(src) == "two|True|(1, 'two', 3.5)")
  }

  test("list methods: append/pop/insert/extend/sort/reverse/remove/index/count") {
    val src =
      """def f():
        |    xs = [3, 1]
        |    xs.append(2)
        |    xs.extend([5, 1])
        |    xs.sort()
        |    a = xs.pop()
        |    xs.remove(1)
        |    xs.insert(0, 9)
        |    xs.reverse()
        |    return str(xs) + '|' + str(a) + '|' + str(xs.index(3)) + '|' + str(xs.count(1))"""
    assert(run(src) == "[3, 2, 1, 9]|5|0|1")
  }

  test("slicing with negatives, steps, and reversal") {
    val src =
      """def f(s):
        |    return s[1:4] + '|' + s[-3:] + '|' + s[::2] + '|' + s[::-1]"""
    assert(run(src, "abcdefg") == "bcd|efg|aceg|gfedcba")
  }

  test("list slicing returns a new list") {
    val src =
      """def f():
        |    xs = [1, 2, 3, 4, 5]
        |    ys = xs[1:3]
        |    ys.append(99)
        |    return str(xs) + '|' + str(ys)"""
    assert(run(src) == "[1, 2, 3, 4, 5]|[2, 3, 99]")
  }

  test("list comprehension with condition; nested fors") {
    val src =
      """def f(n):
        |    sq = [x * x for x in range(n) if x % 2 == 1]
        |    pairs = [(a, b) for a in range(2) for b in range(2)]
        |    return str(sq) + '|' + str(len(pairs))"""
    assert(run(src, 6L) == "[1, 9, 25]|4")
  }

  test("generator expression inside sum/min/max/any/all") {
    val src =
      """def f(n):
        |    s = sum(x * x for x in range(n))
        |    m = max(x % 7 for x in range(n))
        |    e = any(x > 90 for x in range(n))
        |    a = all(x < 100 for x in range(n))
        |    return str(s) + '|' + str(m) + '|' + str(e) + '|' + str(a)"""
    assert(run(src, 100L) == "328350|6|True|True")
  }

  test("helper functions and recursion with default args") {
    val src =
      """def fib(n):
        |    if n < 2:
        |        return n
        |    return fib(n - 1) + fib(n - 2)
        |
        |def main(n, scale=2):
        |    return fib(n) * scale"""
    assert(PyInterp.call(PyInterp.parse(src.stripMargin, Some("main")), Seq(10L)) == 110L)
  }

  test("entry selection: named entry vs last def") {
    val src =
      """def helper(x):
        |    return x + 1
        |
        |def target(x):
        |    return helper(x) * 10"""
    // default: last def
    assert(run(src, 4L) == 50L)
    // explicit entry name
    assert(PyInterp.call(PyInterp.parse(src.stripMargin, Some("helper")), Seq(4L)) == 5L)
  }

  test("module-level constants are visible inside functions") {
    val src =
      """FACTOR = 3
        |NAMES = ['a', 'b']
        |
        |def f(x):
        |    return x * FACTOR + len(NAMES)"""
    assert(run(src, 5L) == 17L)
  }

  test("import math: functions and constants") {
    val src =
      """import math
        |
        |def f(x):
        |    r = math.sqrt(x) + math.floor(2.7) + math.ceil(2.1)
        |    return r + math.pi"""
    val got = run(src, 16L).asInstanceOf[Double]
    assert(math.abs(got - (4.0 + 2 + 3 + math.Pi)) < 1e-12)
  }

  test("from math import binds names; floor returns int") {
    val src =
      """from math import sqrt, floor
        |
        |def f(x):
        |    return floor(sqrt(x))"""
    assert(run(src, 10L) == 3L)
  }

  test("f-strings with expressions and format specs") {
    val src =
      """def f(name, v):
        |    return f"{name}: {v:.2f} ({v * 100:.0f}%)""""
    assert(run(src, "acc", 0.8756) == "acc: 0.88 (88%)")
  }

  test("string methods: split/join/find/count/zfill/title/format") {
    val src =
      """def f(s):
        |    parts = s.split(',')
        |    j = '-'.join(parts)
        |    return j + '|' + str(s.find('b')) + '|' + str(s.count(',')) + '|' + '7'.zfill(3) + '|' + 'a b'.title() + '|' + '{} and {}'.format(1, 'x')"""
    assert(run(src, "a,b,c") == "a-b-c|2|2|007|A B|1 and x")
  }

  test("split keeps empty fields like Python") {
    val src =
      """def f(s):
        |    return str(len(s.split(',')))"""
    assert(run(src, "a,,b,") == "4")
  }

  test("builtins: sorted/reversed/enumerate/zip/ord/chr/round half-even") {
    val src =
      """def f():
        |    xs = sorted([3, 1, 2])
        |    ys = list(reversed(xs))
        |    pairs = list(zip('ab', [10, 20]))
        |    out = ''
        |    for i, c in enumerate('xy'):
        |        out = out + str(i) + c
        |    r = str(round(2.5)) + str(round(3.5)) + str(round(2.675, 2))
        |    return str(ys) + '|' + str(pairs[1][1]) + '|' + out + '|' + str(ord('A')) + chr(66) + '|' + r"""
    assert(run(src) == "[3, 2, 1]|20|0x1y|65B|242.67")
  }

  test("range as a value: len, index, membership, list()") {
    val src =
      """def f():
        |    r = range(2, 20, 3)
        |    return str(len(r)) + '|' + str(r[2]) + '|' + str(8 in r) + '|' + str(9 in r) + '|' + str(list(range(3)))"""
    assert(run(src) == "6|8|True|False|[0, 1, 2]")
  }

  test("while-loop string builder: collatz length") {
    val src =
      """def collatz(n):
        |    steps = 0
        |    while n != 1:
        |        if n % 2 == 0:
        |            n = n // 2
        |        else:
        |            n = 3 * n + 1
        |        steps += 1
        |    return steps"""
    assert(run(src, 27L) == 111L)
  }

  test("multi-line expressions join implicitly inside brackets") {
    val src =
      """def f():
        |    xs = [1,
        |          2,
        |          3]
        |    return sum(xs)"""
    assert(run(src) == 6L)
  }

  test("inline comments are stripped outside strings") {
    val src =
      """def f(s):  # trailing comment
        |    x = 1  # add one
        |    y = '#notacomment'
        |    return s + y + str(x)"""
    assert(run(src, "a") == "a#notacomment1")
  }

  test("is / is not None") {
    val src =
      """def f(x):
        |    if x is None:
        |        return 'none'
        |    return 'value'"""
    assert(run(src, null) == "none")
    assert(run(src, 0L) == "value")
  }

  test("str() of containers matches CPython repr rules") {
    val src =
      """def f():
        |    return str([1, 'a', 2.0, None, True, (1,)])"""
    assert(run(src) == "[1, 'a', 2.0, None, True, (1,)]")
  }

  test("escape sequences in string literals") {
    val src =
      "def f():\n    return 'a\\tb' + \"\\n\" + 'it\\'s'"
    assert(run(src) == "a\tb\nit's")
  }

  test("recursion limit guards the stack") {
    val src =
      """def f(n):
        |    return f(n + 1)"""
    val e = intercept[IllegalArgumentException](run(src, 0L))
    assert(e.getMessage.contains("recursion"))
  }

  test("an undefined base class is rejected") {
    // (nested defs, inheritance, yield statements and — since round 10 —
    // coroutine-style `x = yield v` are supported; a base that was never
    // defined must still fail at parse, like CPython's NameError)
    intercept[IllegalArgumentException](
      run("class C(Base):\n    pass\ndef f(x):\n    return x", 1L))
  }

  test("imports beyond math are rejected") {
    val e = intercept[IllegalArgumentException](
      run("import os\n\ndef f(x):\n    return x", 1L))
    assert(e.getMessage.contains("math"))
  }

  test("realistic UDF: word-frequency top token") {
    val src =
      """def top_token(text):
        |    counts = {}
        |    for w in text.lower().split():
        |        w = w.strip('.,')
        |        if len(w) < 2:
        |            continue
        |        counts[w] = counts.get(w, 0) + 1
        |    best = None
        |    best_n = -1
        |    for w in counts:
        |        if counts[w] > best_n or (counts[w] == best_n and w < best):
        |            best = w
        |            best_n = counts[w]
        |    return f"{best}:{best_n}""""
    // strip('.,') needs arg support — strip with argument
    assert(run(src, "the cat and the dog and the bird") == "the:3")
  }

  test("quality-score style UDF with math and comprehension") {
    val src =
      """import math
        |
        |def score(text):
        |    words = text.split()
        |    if not words:
        |        return 0.0
        |    avg = sum(len(w) for w in words) / len(words)
        |    caps = sum(1 for w in words if w[0].isupper())
        |    return round(math.log(1 + avg) * (1 + caps / len(words)), 4)"""
    val got = run(src, "The quick Brown fox").asInstanceOf[Double]
    val words = Seq("The", "quick", "Brown", "fox")
    val avg = words.map(_.length).sum.toDouble / 4
    val expect = BigDecimal(math.log(1 + avg) * 1.5)
      .setScale(4, BigDecimal.RoundingMode.HALF_EVEN).toDouble
    assert(got == expect)
  }
  // ---- round 8: lambdas, key=/reverse= kwargs, try/except, module globals
  // (every expectation below re-verified against python3 this round)

  test("sorted with lambda key") {
    val src =
      """def f(xs):
        |    return sorted(xs, key=lambda t: t[1])"""
    assert(run(src, ArrayBuffer(ArrayBuffer(1L, 3L), ArrayBuffer(2L, 1L), ArrayBuffer(3L, 2L)))
      == ArrayBuffer(ArrayBuffer(2L, 1L), ArrayBuffer(3L, 2L), ArrayBuffer(1L, 3L)))
  }

  test("sorted key= reverse= is stable (equal keys keep source order)") {
    val src =
      """def f(xs):
        |    return sorted(xs, key=lambda s: len(s), reverse=True)"""
    assert(run(src, ArrayBuffer("aa", "b", "cccc", "dd"))
      == ArrayBuffer("cccc", "aa", "dd", "b"))
  }

  test("max with key returns FIRST maximal element, like CPython") {
    val src =
      """def f(xs):
        |    return max(xs, key=lambda s: len(s))"""
    assert(run(src, ArrayBuffer("aa", "bbb", "cc", "ddd")) == "bbb")
  }

  test("min with key= and a helper def as the key") {
    val src =
      """def keyfn(s):
        |    return len(s)
        |def f(xs):
        |    return min(xs, key=keyfn)"""
    assert(run(src, ArrayBuffer("bbb", "a", "cc")) == "a")
  }

  test("lambda bound to a name and called directly") {
    val src =
      """def f(a, b):
        |    g = lambda x, y: x * 10 + y
        |    return g(a, b) + g(b, a)"""
    assert(run(src, 3L, 4L) == 77L)
  }

  test("lambda reads enclosing frame bindings (read-only closure)") {
    val src =
      """def f(xs, n):
        |    return sorted(xs, key=lambda x: abs(x - n))"""
    assert(run(src, ArrayBuffer(1L, 5L, 9L), 6L) == ArrayBuffer(5L, 9L, 1L))
  }

  test("builtin passed as a value (f = abs)") {
    val src =
      """def f(x):
        |    g = abs
        |    return g(x)"""
    assert(run(src, -3L) == 3L)
  }

  test("try/except ValueError around int()") {
    val src =
      """def f(s):
        |    try:
        |        return int(s)
        |    except ValueError:
        |        return -1"""
    assert(run(src, "12") == 12L)
    assert(run(src, "x") == -1L)
  }

  test("except KeyError as e binds str(e) with CPython's repr quoting") {
    val src =
      """def f(d, k):
        |    try:
        |        return d[k]
        |    except KeyError as e:
        |        return 'missing ' + str(e)"""
    val d = scala.collection.mutable.LinkedHashMap[Any, Any]("a" -> 1L)
    assert(run(src, d, "a") == 1L)
    assert(run(src, d, "b") == "missing 'b'") // python3: str(KeyError('b')) == "'b'"
  }

  test("try/except ZeroDivisionError with else and finally") {
    val src =
      """def f(a, b):
        |    try:
        |        r = a % b
        |    except ZeroDivisionError:
        |        return -1
        |    else:
        |        return r
        |    finally:
        |        pass"""
    assert(run(src, 7L, 3L) == 1L)
    assert(run(src, 7L, 0L) == -1L)
  }

  test("raise ValueError caught by except as e") {
    val src =
      """def f(x):
        |    try:
        |        if x < 0:
        |            raise ValueError('negative')
        |        return x
        |    except ValueError as e:
        |        return str(e)"""
    assert(run(src, 5L) == 5L)
    assert(run(src, -5L) == "negative")
  }

  test("unmatched except kind propagates") {
    val src =
      """def f(s):
        |    try:
        |        return int(s)
        |    except KeyError:
        |        return -1"""
    val e = intercept[Exception] { run(src, "zz") }
    assert(e.getMessage.contains("ValueError"))
  }

  test("module-level mutable global is shared with helper frames") {
    // the old per-frame consts re-evaluation gave add() a fresh SEEN copy
    // and f returned 0; CPython (and now PyInterp) returns 14
    val src =
      """SEEN = []
        |def add(x):
        |    SEEN.append(x)
        |def f(n):
        |    for i in range(n):
        |        add(i * i)
        |    return sum(SEEN)"""
    assert(run(src, 4L) == 14L)
    // and the module env resets per top-level call (per row): same again
    assert(run(src, 4L) == 14L)
  }

  test("rebinding a builtin name shadows it (CPython TypeError)") {
    val src =
      """def f(xs):
        |    sum = 0
        |    try:
        |        return sum(xs)
        |    except Exception:
        |        return -99"""
    assert(run(src, ArrayBuffer(1L, 2L)) == -99L)
  }

  test("Boolean vs non-numeric equality is False, not an error") {
    val src =
      """def f(x):
        |    return [x == 'x', True == 'x', 1 == True, 0.0 == False]"""
    assert(run(src, true) == ArrayBuffer(false, false, true, true))
  }

  test("escaped quote inside a tuple-assign RHS string") {
    val src =
      """def f():
        |    a, b = 'x\'s, y', 2
        |    return a + str(b)"""
    assert(run(src) == "x's, y2")
  }

  // ------------------------------------------------- round-8 additions
  // (bitwise ops, % formatting, map/filter/isinstance, re, kwargs/*args,
  // collections, classes — each expectation re-verified against python3)

  test("bitwise operators with Python precedence") {
    val src =
      """def f(a, b):
        |    return str((a | b, a & b, a ^ b, a << 2, b >> 1))"""
    assert(run(src, 12L, 10L) == "(14, 8, 6, 48, 5)")
  }

  test("percent string formatting: s d f width zero-pad hex") {
    val src =
      """def f(k, v, x):
        |    return '%s=%d|%.2f|%05d|%6.1f|%x' % (k, v, x, v, x, 255)"""
    assert(run(src, "n", 42L, 3.14159) == "n=42|3.14|00042|   3.1|ff")
  }

  test("map and filter with lambdas (eager lists)") {
    val src =
      """def f(xs):
        |    return str((sum(map(lambda x: x*x, xs)), list(filter(lambda x: x % 2, range(10)))))"""
    assert(run(src, ArrayBuffer(1L, 2L, 3L, 4L)) == "(30, [1, 3, 5, 7, 9])")
  }

  test("isinstance with single type, type tuple, and bool-is-int") {
    val src =
      """def f(x):
        |    return '%s|%s|%s' % (isinstance(x, int), isinstance(x, (str, float)), isinstance(x, bool))"""
    assert(run(src, 3L) == "True|False|False")
    assert(run(src, 2.5) == "False|True|False")
    assert(run(src, true) == "True|False|True")
  }

  test("re.search with groups, start/end; None on miss") {
    val src =
      """import re
        |def f(s):
        |    m = re.search(r'(\d+)-(\d+)', s)
        |    if m:
        |        return int(m.group(1)) + int(m.group(2)) + m.start() + m.end()
        |    return -1"""
    assert(run(src, "ab 12-34 cd") == 57L)
    assert(run(src, "none") == -1L)
  }

  test("re.sub with backreference template") {
    val src =
      """import re
        |def f(s):
        |    return re.sub(r'(\w+)@(\w+)', r'\2 at \1', s)"""
    assert(run(src, "joe@example and amy@test") == "example at joe and test at amy")
  }

  test("re.sub with callable replacement") {
    val src =
      """import re
        |def f(s):
        |    return re.sub(r'\d+', lambda m: str(int(m.group(0)) * 2), s)"""
    assert(run(src, "a1 b22 c333") == "a2 b44 c666")
  }

  test("re.subn returns (result, count)") {
    val src =
      """import re
        |def f(s):
        |    return str(re.subn(r'a', 'b', s))"""
    assert(run(src, "banana") == "('bbnbnb', 3)")
  }

  test("re.findall: no groups, and tuple-per-match with 2 groups") {
    val src =
      """import re
        |def f(s):
        |    return str((re.findall(r'[aeiou]', s), re.findall(r'(\w)(\d)', s)))"""
    assert(run(src, "hello a1 b2") == "(['e', 'o', 'a'], [('a', '1'), ('b', '2')])")
  }

  test("re.split, with and without capture groups") {
    val src =
      """import re
        |def f(s):
        |    return str((re.split(r'\s*,\s*', s), re.split(r'(\s+)', s)))"""
    assert(run(src, "a, b ,c") == "(['a', 'b', 'c'], ['a,', ' ', 'b', ' ', ',c'])")
  }

  test("re.match anchors at start, search anywhere, fullmatch whole") {
    val src =
      """import re
        |def f(s):
        |    return '%s|%s|%s' % (bool(re.match(r'\d+', s)), bool(re.search(r'\d+', s)), bool(re.fullmatch(r'\w+', s)))"""
    assert(run(src, "ab12") == "False|True|True")
    assert(run(src, "12ab") == "True|True|True")
  }

  test("re.IGNORECASE flag through re.sub") {
    val src =
      """import re
        |def f(s):
        |    return re.sub(r'cat', 'dog', s, 0, re.IGNORECASE)"""
    assert(run(src, "Cat CAT cat") == "dog dog dog")
  }

  test("keyword arguments on user defs, with defaults") {
    val src =
      """def kw(a, b=2, c=3):
        |    return a*100 + b*10 + c
        |def f(x):
        |    return str((kw(1, c=9), kw(1, 5), kw(a=4)))"""
    assert(run(src, 0L) == "(129, 153, 423)")
  }

  test("*args parameter and call-site splat") {
    val src =
      """def star(*xs):
        |    return sum(xs) + len(xs)
        |def f(x):
        |    return str((star(1, 2, 3), star(), star(*[5, 6])))"""
    assert(run(src, 0L) == "(9, 0, 13)")
  }

  test("positional params before *args") {
    val src =
      """def mixed(a, *rest):
        |    return '%s:%s' % (a, list(rest))
        |def f(x):
        |    return mixed(1, 2, 3)"""
    assert(run(src, 0L) == "1:[2, 3]")
  }

  test("collections.Counter: counts, most_common, missing key is 0") {
    val src =
      """from collections import Counter
        |def f(s):
        |    c = Counter(s.split())
        |    mc = c.most_common(2)
        |    return '%s|%s|%s' % (mc, c['the'], c['zzz'])"""
    assert(run(src, "the cat and the dog and the bird") ==
      "[('the', 3), ('and', 2)]|3|0")
  }

  test("collections.defaultdict with int and list factories") {
    val src =
      """from collections import defaultdict
        |def f(words):
        |    d = defaultdict(int)
        |    g = defaultdict(list)
        |    for w in words:
        |        d[w[0]] += 1
        |        g[len(w)].append(w)
        |    return '%s|%s' % (sorted(d.items()), sorted(g.items()))"""
    assert(run(src, ArrayBuffer("apple", "ant", "bee", "cow")) ==
      "[('a', 2), ('b', 1), ('c', 1)]|[(3, ['ant', 'bee', 'cow']), (5, ['apple'])]")
  }

  test("class with __init__, methods, attribute mutation, class attr") {
    val src =
      """class Point:
        |    count = 0
        |    def __init__(self, x, y):
        |        self.x = x
        |        self.y = y
        |    def dist2(self):
        |        return self.x * self.x + self.y * self.y
        |    def shift(self, dx, dy=0):
        |        self.x += dx
        |        self.y += dy
        |        return self
        |def f(a, b):
        |    p = Point(a, b)
        |    p.shift(1, dy=2)
        |    return '%s,%s,%s,%s' % (p.x, p.y, p.dist2(), p.count)"""
    assert(run(src, 3L, 4L) == "4,6,52,0")
  }

  test("class whose methods call other methods through self") {
    val src =
      """class Acc:
        |    def __init__(self):
        |        self.items = []
        |    def add(self, v):
        |        self.items.append(v)
        |        return self.total()
        |    def total(self):
        |        return sum(self.items)
        |def f(xs):
        |    a = Acc()
        |    r = [a.add(x) for x in xs]
        |    return str(r)"""
    assert(run(src, ArrayBuffer(1L, 2L, 3L)) == "[1, 3, 6]")
  }

  test("raw strings keep backslashes literal") {
    val src =
      """def f():
        |    return len(r'\n\t') + len('\n\t')"""
    assert(run(src) == 6L)
  }

  // ---- round 9: nested defs / closures / nonlocal / **kwargs / inheritance

  test("nested def: closure reads the enclosing frame live") {
    val src =
      """def f(n):
        |    base = 10
        |    def scaled(x):
        |        return x * base + n
        |    base = 100
        |    return scaled(3)"""
    assert(run(src, 7L) == 307L) // reads base=100 at call time, like CPython cells
  }

  test("nested def: assignment without nonlocal stays local") {
    val src =
      """def f():
        |    x = 1
        |    def g():
        |        x = 99
        |        return x
        |    r = g()
        |    return [r, x]"""
    assert(run(src).asInstanceOf[ArrayBuffer[Any]].toSeq == Seq(99L, 1L))
  }

  test("nonlocal: counter closure mutates the enclosing frame") {
    val src =
      """def f(n):
        |    count = 0
        |    def bump(step):
        |        nonlocal count
        |        count += step
        |        return count
        |    for i in range(n):
        |        bump(i)
        |    return count"""
    assert(run(src, 5L) == 10L) // 0+1+2+3+4
  }

  test("nested def: self-recursion and capture of helper args") {
    val src =
      """def f(n):
        |    def fact(k):
        |        if k <= 1:
        |            return 1
        |        return k * fact(k - 1)
        |    return fact(n)"""
    assert(run(src, 6L) == 720L)
  }

  test("closures as values: key= and map over a nested def") {
    val src =
      """def f(xs):
        |    offset = 100
        |    def dist(x):
        |        return abs(x - offset)
        |    return sorted(xs, key=dist)[0]"""
    assert(run(src, ArrayBuffer(1L, 90L, 250L)) == 90L)
  }

  test("**kwargs: unmatched keywords collect into a dict") {
    val src =
      """def tag(name, **attrs):
        |    parts = [name]
        |    for k in sorted(attrs.keys()):
        |        parts.append(k + '=' + str(attrs[k]))
        |    return ','.join(parts)
        |def f():
        |    return tag('a', href=1, rel='x')"""
    assert(run(src) == "a,href=1,rel=x")
  }

  test("**kwargs: declared params still bind by name; empty kwargs is {}") {
    val src =
      """def g(a, b=2, **rest):
        |    return a * 10 + b + len(rest)
        |def f():
        |    return [g(1), g(1, b=5), g(1, c=0, d=0)]"""
    assert(run(src).asInstanceOf[ArrayBuffer[Any]].toSeq == Seq(12L, 15L, 14L))
  }

  test("single inheritance: method and __init__ lookup through the base") {
    val src =
      """class Animal:
        |    def __init__(self, name):
        |        self.name = name
        |    def greet(self):
        |        return 'I am ' + self.name
        |class Dog(Animal):
        |    def speak(self):
        |        return self.greet() + ', woof'
        |def f():
        |    d = Dog('rex')
        |    return d.speak()"""
    assert(run(src) == "I am rex, woof")
  }

  test("inheritance: child overrides a method; isinstance honors the chain") {
    val src =
      """class Base:
        |    def kind(self):
        |        return 'base'
        |class Child(Base):
        |    def kind(self):
        |        return 'child'
        |def f():
        |    b = Base()
        |    c = Child()
        |    flags = [isinstance(c, Base), isinstance(c, Child), isinstance(b, Child)]
        |    return c.kind() + '/' + b.kind() + '/' + str(flags)"""
    assert(run(src) == "child/base/[True, True, False]")
  }

  test("yield: generator def is iterable; sum/list/for see yields in order") {
    val src =
      """def evens(n):
        |    for i in range(n):
        |        if i % 2 == 0:
        |            yield i
        |def f(n):
        |    total = 0
        |    for v in evens(n):
        |        total += v
        |    return [total, sum(evens(n)), list(evens(n))[-1]]"""
    assert(run(src, 10L).asInstanceOf[ArrayBuffer[Any]].toSeq == Seq(20L, 20L, 8L))
  }

  test("yield: bare return ends iteration early") {
    val src =
      """def firstk(xs, k):
        |    n = 0
        |    for x in xs:
        |        if n >= k:
        |            return
        |        yield x
        |        n += 1
        |def f(xs):
        |    return ','.join([str(v) for v in firstk(xs, 2)])"""
    assert(run(src, ArrayBuffer(7L, 8L, 9L, 10L)) == "7,8")
  }

  test("yield: INFINITE generator with an early-exit zip does not materialize") {
    // CPython: zip stops at the shortest iterable; an eager-list generator
    // implementation would hang here
    val src =
      """def naturals():
        |    n = 0
        |    while True:
        |        yield n
        |        n += 1
        |def f(k):
        |    out = []
        |    for p in zip(naturals(), range(k)):
        |        out.append(p[0] * 10 + p[1])
        |    return out"""
    assert(run(src, 3L).asInstanceOf[ArrayBuffer[Any]].toSeq == Seq(0L, 11L, 22L))
  }

  test("yield: for-loop break over an infinite generator") {
    val src =
      """def powers():
        |    p = 1
        |    while True:
        |        yield p
        |        p = p * 2
        |def f(limit):
        |    total = 0
        |    for v in powers():
        |        if v > limit:
        |            break
        |        total += v
        |    return total"""
    assert(run(src, 100L) == 127L) // 1+2+4+8+16+32+64
  }

  test("yield: next(gen), next(gen, default), StopIteration on exhaustion") {
    val src =
      """def two():
        |    yield 'a'
        |    yield 'b'
        |def f():
        |    g = two()
        |    first = next(g)
        |    second = next(g)
        |    fallback = next(g, 'z')
        |    return first + second + fallback"""
    assert(run(src) == "abz")
    val src2 =
      """def one():
        |    yield 1
        |def f():
        |    g = one()
        |    next(g)
        |    return next(g)"""
    val e = intercept[Exception](run(src2))
    assert(e.getMessage == null || e.getMessage.isEmpty ||
      e.toString.contains("StopIteration"), e.toString)
  }

  test("yield: no body code runs at call time; a spent generator iterates empty") {
    val src =
      """def f():
        |    log = []
        |    def g():
        |        log.append('ran')
        |        yield 1
        |    h = g()
        |    before = len(log)
        |    first = list(h)
        |    again = list(h)
        |    return [before, len(log), first, again]"""
    val r = run(src).asInstanceOf[ArrayBuffer[Any]]
    assert(r(0) == 0L, "body must not run at call time")
    assert(r(1) == 1L)
    assert(r(2).asInstanceOf[ArrayBuffer[Any]].toSeq == Seq(1L))
    assert(r(3).asInstanceOf[ArrayBuffer[Any]].isEmpty, "spent generator must iterate empty")
  }

  test("yield: a body exception surfaces at the pull that triggers it") {
    val src =
      """def bad():
        |    yield 1
        |    yield 1 // 0
        |def f():
        |    g = bad()
        |    first = next(g)
        |    try:
        |        second = next(g)
        |    except ZeroDivisionError:
        |        return first + 100
        |    return -1"""
    assert(run(src) == 101L)
  }

  test("yield: generator returned from the UDF materializes to a list") {
    val src =
      """def f(n):
        |    def squares(k):
        |        for i in range(k):
        |            yield i * i
        |    return squares(n)"""
    assert(run(src, 4L).asInstanceOf[ArrayBuffer[Any]].toSeq == Seq(0L, 1L, 4L, 9L))
  }

  test("global: a helper mutates a module-level counter") {
    val src =
      """calls = 0
        |def bump():
        |    global calls
        |    calls += 1
        |    return calls
        |def f(n):
        |    for i in range(n):
        |        bump()
        |    return calls"""
    assert(run(src, 4L) == 4L)
  }

  test("call-site **d splat expands into keyword arguments") {
    val src =
      """def box(w, h, unit='px'):
        |    return str(w) + 'x' + str(h) + unit
        |def f():
        |    opts = {'h': 2, 'unit': 'em'}
        |    return box(1, **opts)"""
    assert(run(src) == "1x2em")
  }

  test("**d splat merges with explicit keywords into **kwargs") {
    val src =
      """def render(tag, **attrs):
        |    keys = sorted(attrs.keys())
        |    return tag + ':' + ','.join([k + '=' + str(attrs[k]) for k in keys])
        |def f():
        |    d = {'b': 2}
        |    return render('p', a=1, **d)"""
    assert(run(src) == "p:a=1,b=2")
  }

  test("super(): child __init__ extends the base initializer") {
    val src =
      """class Point:
        |    def __init__(self, x, y):
        |        self.x = x
        |        self.y = y
        |class Point3(Point):
        |    def __init__(self, x, y, z):
        |        super().__init__(x, y)
        |        self.z = z
        |def f():
        |    p = Point3(1, 2, 3)
        |    return p.x * 100 + p.y * 10 + p.z"""
    assert(run(src) == 123L)
  }

  test("super(): overridden method calls the base version") {
    val src =
      """class Greeter:
        |    def greet(self):
        |        return 'hello'
        |class Loud(Greeter):
        |    def greet(self):
        |        return super().greet().upper() + '!'
        |def f():
        |    return Loud().greet()"""
    assert(run(src) == "HELLO!")
  }

  test("super() outside a method raises like CPython") {
    val src =
      """def f(x):
        |    return super().foo() + x"""
    val e = intercept[Exception](run(src, 1L))
    assert(e.getMessage.contains("super"))
  }

  test("inheritance: class attrs flow base-first, child overrides") {
    val src =
      """class A:
        |    limit = 10
        |    tag = 'a'
        |class B(A):
        |    tag = 'b'
        |def f():
        |    x = B()
        |    return str(x.limit) + x.tag"""
    assert(run(src) == "10b")
  }

  // ---------------------------------------------------- round 10 semantics

  test("UnboundLocalError: read before assignment of a function local") {
    // CPython 3.11: UnboundLocalError even though module-level g exists
    val src =
      """g = 10
        |def f1():
        |    y = g
        |    g = 5
        |    return y"""
    val e = intercept[Exception](run(src))
    assert(e.getMessage.contains(
      "UnboundLocalError: cannot access local variable 'g' where it is not associated with a value"))
  }

  test("UnboundLocalError: closure assignment without nonlocal makes the name local") {
    val src =
      """def f2():
        |    c = 0
        |    def inner():
        |        v = c
        |        c = v + 1
        |        return c
        |    try:
        |        return inner()
        |    except UnboundLocalError as e:
        |        return 'UBL: ' + str(e)"""
    assert(run(src) ==
      "UBL: cannot access local variable 'c' where it is not associated with a value")
  }

  test("UnboundLocalError: a for-loop variable is a local") {
    val src =
      """def f3(n):
        |    y = i
        |    for i in range(n):
        |        pass
        |    return y"""
    val e = intercept[Exception](run(src, 3L))
    assert(e.getMessage.contains("UnboundLocalError") &&
      e.getMessage.contains("'i'"))
  }

  test("global declaration exempts the name from local classification") {
    val src =
      """tot = 1
        |def f4():
        |    global tot
        |    x = tot
        |    tot = x + 1
        |    return tot"""
    assert(run(src) == 2L)
  }

  test("nonlocal declaration exempts the name: counter still works") {
    val src =
      """def f():
        |    c = 0
        |    def inc():
        |        nonlocal c
        |        c = c + 1
        |        return c
        |    inc()
        |    inc()
        |    return inc()"""
    assert(run(src) == 3L)
  }

  test("coroutine: running average via gen.send") {
    // CPython: next(a)=None, then send(10)=10.0, send(20)=15.0, send(30)=20.0
    val src =
      """def avg():
        |    total = 0.0
        |    n = 0
        |    val = yield None
        |    while True:
        |        total += val
        |        n += 1
        |        val = yield total / n
        |def f():
        |    a = avg()
        |    first = next(a)
        |    r = [a.send(10), a.send(20), a.send(30)]
        |    return [first] + r"""
    assert(run(src) == ArrayBuffer(null, 10.0, 15.0, 20.0))
  }

  test("coroutine: x = yield v receive points, StopIteration at exhaustion") {
    // CPython: next(e)=7, send(3)=6, send(4)=7, then StopIteration
    val src =
      """def echo(start):
        |    x = yield start
        |    y = yield x * 2
        |    yield x + y
        |def f():
        |    e = echo(7)
        |    out = [next(e), e.send(3), e.send(4)]
        |    try:
        |        e.send(0)
        |    except StopIteration:
        |        out.append('done')
        |    return out"""
    assert(run(src) == ArrayBuffer(7L, 6L, 7L, "done"))
  }

  test("coroutine: non-None send to a just-started generator is a TypeError") {
    val src =
      """def g7():
        |    yield 1
        |def f():
        |    gg = g7()
        |    try:
        |        gg.send(9)
        |    except TypeError as t:
        |        return str(t)"""
    assert(run(src) == "can't send non-None value to a just-started generator")
  }

  test("bare yield yields None") {
    val src =
      """def g():
        |    yield
        |    yield 2
        |def f():
        |    return list(g())"""
    assert(run(src) == ArrayBuffer(null, 2L))
  }

  test("argful super(C, self): base method and base __init__ dispatch") {
    val src =
      """class Shape:
        |    def __init__(self, name):
        |        self.name = name
        |    def describe(self):
        |        return 'shape ' + self.name
        |class Circle(Shape):
        |    def __init__(self, r):
        |        super(Circle, self).__init__('circle')
        |        self.r = r
        |    def describe(self):
        |        return super(Circle, self).describe() + ' r=' + str(self.r)
        |def f():
        |    c = Circle(2)
        |    return c.describe()"""
    assert(run(src) == "shape circle r=2")
  }

  test("functools.reduce: fold, initializer, empty-iterable TypeError") {
    val src =
      """from functools import reduce
        |def f():
        |    a = reduce(lambda a, b: a * b, [1, 2, 3, 4])
        |    b = reduce(lambda a, b: a + b, [], 10)
        |    try:
        |        reduce(lambda a, b: a + b, [])
        |    except TypeError as e:
        |        return [a, b, str(e)]"""
    assert(run(src) == ArrayBuffer(24L, 10L,
      "reduce() of empty iterable with no initial value"))
  }

  test("itertools.chain flattens mixed iterables incl. strings") {
    val src =
      """from itertools import chain
        |def f():
        |    return list(chain([1, 2], (3, 4), 'ab'))"""
    assert(run(src) == ArrayBuffer(1L, 2L, 3L, 4L, "a", "b"))
  }

  test("itertools.product: two pools and repeat=") {
    val src =
      """from itertools import product
        |def f():
        |    a = list(product([1, 2], 'xy'))
        |    b = list(product([1, 2], repeat=2))
        |    return [a, b]"""
    assert(run(src) == ArrayBuffer(
      ArrayBuffer(Vector(1L, "x"), Vector(1L, "y"), Vector(2L, "x"), Vector(2L, "y")),
      ArrayBuffer(Vector(1L, 1L), Vector(1L, 2L), Vector(2L, 1L), Vector(2L, 2L))))
  }

  test("itertools.combinations/permutations use positional semantics") {
    val src =
      """from itertools import combinations, permutations
        |def f():
        |    a = list(combinations('abcd', 2))
        |    b = list(permutations([1, 2, 3], 2))
        |    c = list(combinations([1, 1, 2], 2))
        |    return [a, b, c]"""
    // CPython: combinations([1,1,2],2) keeps the duplicate-element pairs
    assert(run(src) == ArrayBuffer(
      ArrayBuffer(Vector("a", "b"), Vector("a", "c"), Vector("a", "d"),
        Vector("b", "c"), Vector("b", "d"), Vector("c", "d")),
      ArrayBuffer(Vector(1L, 2L), Vector(1L, 3L), Vector(2L, 1L),
        Vector(2L, 3L), Vector(3L, 1L), Vector(3L, 2L)),
      ArrayBuffer(Vector(1L, 1L), Vector(1L, 2L), Vector(1L, 2L))))
  }

  test("itertools.accumulate: running sum and custom func") {
    val src =
      """from itertools import accumulate
        |def f():
        |    a = list(accumulate([1, 2, 3, 4]))
        |    b = list(accumulate([1, 2, 3], lambda a, b: a * b))
        |    return [a, b]"""
    assert(run(src) == ArrayBuffer(
      ArrayBuffer(1L, 3L, 6L, 10L), ArrayBuffer(1L, 2L, 6L)))
  }

  test("itertools.count/cycle/repeat are lazy; islice bounds them") {
    val src =
      """from itertools import islice, count, cycle, repeat
        |def f():
        |    a = list(islice(count(5), 4))
        |    b = list(islice(count(0, 3), 2, 5))
        |    c = list(repeat('x', 3))
        |    d = list(islice(cycle([1, 2, 3]), 7))
        |    e = list(islice(repeat(9), 2))
        |    return [a, b, c, d, e]"""
    assert(run(src) == ArrayBuffer(
      ArrayBuffer(5L, 6L, 7L, 8L),
      ArrayBuffer(6L, 9L, 12L),
      ArrayBuffer("x", "x", "x"),
      ArrayBuffer(1L, 2L, 3L, 1L, 2L, 3L, 1L),
      ArrayBuffer(9L, 9L)))
  }

  test("itertools.groupby groups consecutive runs, identity and key=") {
    val src =
      """from itertools import groupby
        |def f():
        |    a = [(k, list(g)) for k, g in groupby('aabbbca')]
        |    b = [(k, list(g)) for k, g in groupby([1, 2, 4, 3, 5], key=lambda x: x % 2)]
        |    return [a, b]"""
    assert(run(src) == ArrayBuffer(
      ArrayBuffer(
        Vector("a", ArrayBuffer("a", "a")), Vector("b", ArrayBuffer("b", "b", "b")),
        Vector("c", ArrayBuffer("c")), Vector("a", ArrayBuffer("a"))),
      ArrayBuffer(
        Vector(1L, ArrayBuffer(1L)), Vector(0L, ArrayBuffer(2L, 4L)),
        Vector(1L, ArrayBuffer(3L, 5L)))))
  }

  test("unknown itertools/functools names are rejected at parse") {
    val e = intercept[IllegalArgumentException](
      run("from itertools import tee\n\ndef f(x):\n    return x", 1L))
    assert(e.getMessage.contains("unsupported itertools import"))
  }

  test("argful super outside a method; wrong-instance TypeError") {
    val src =
      """class Shape:
        |    def __init__(self, name):
        |        self.name = name
        |    def describe(self):
        |        return 'shape ' + self.name
        |class Circle(Shape):
        |    def describe(self):
        |        return 'circle'
        |class Other:
        |    def __init__(self):
        |        self.name = 'o'
        |def f():
        |    c = Circle('x')
        |    a = super(Circle, c).describe()
        |    try:
        |        super(Circle, Other())
        |    except TypeError as t:
        |        return a + '|' + str(t)"""
    assert(run(src) ==
      "shape x|super(type, obj): obj must be an instance or subtype of type")
  }
}
