package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers referenced from generated code — keep them Java-simple so
  * whole-stage codegen can call them directly. */
object ExprUtil {
  /** Gauss error function via commons-math3 (public Spark dependency).
    * Reference surface: the `Erf` runtime function in LingoDB's registry
    * (reference src/compiler/Dialect/DB/RuntimeFunctions/RuntimeFunctions.cpp:338,
    * impl src/runtime/FloatRuntime.cpp). Spark has no built-in erf. */
  def erf(x: Double): Double = org.apache.commons.math3.special.Erf.erf(x)

  /** 61-bit polynomial rolling hash over UTF-8 bytes (base 131, mod 2^61-1) —
    * a deterministic document fingerprint for dedup pipelines. Equivalent role
    * to LingoDB's runtime `Hash` function
    * (reference RuntimeFunctions.cpp:341, include/lingodb/runtime/helpers.h),
    * but specified here so results are stable across engines/versions. */
  private final val HashMod = (1L << 61) - 1

  /** h*2^k mod 2^61-1 for h < 2^61-1, k < 61: split h at bit 61-k and use
    * 2^61 ≡ 1 (mod 2^61-1). Exact, no 64-bit overflow. */
  private def shlMod(h: Long, k: Int): Long = {
    val r = ((h & ((1L << (61 - k)) - 1)) << k) + (h >>> (61 - k))
    if (r >= HashMod) r - HashMod else r
  }

  /** One-pass text statistics over the raw UTF-8 bytes, replicating the exact
    * semantics of the array-HOF formulation (`split(text, ' ')` with Spark's
    * keep-empty-tokens default, character = codepoint):
    *   n_chars     = length(text)
    *   n_tokens    = size(split(text,' '))          = #spaces + 1
    *   n_stop      = size(filter(tokens, _ in stopwords))   (byte-exact match)
    *   sum_tok_len = aggregate(transform(tokens, length), 0, +)
    *               = n_chars - #spaces   (each delimiter is exactly one char)
    * No token array is ever materialized: the HOF form allocates a UTF8String
    * per token per lambda pass; this is a single scan counting non-continuation
    * bytes (codepoints) and matching stopword byte slices at token boundaries.
    * 0x20 can only encode the space codepoint in UTF-8 (continuation bytes are
    * >= 0x80), so the byte scan is exact for multibyte text. */
  def textStats(s: UTF8String, stops: Array[Array[Byte]]): org.apache.spark.sql.catalyst.InternalRow = {
    val b = s.getBytes
    val n = b.length
    var nChars = 0L
    var nSpaces = 0L
    var nStop = 0L
    var tokStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || b(i) == 0x20) {
        val len = i - tokStart
        var k = 0
        var matched = false
        while (k < stops.length && !matched) {
          val st = stops(k)
          if (st.length == len) {
            var j = 0
            while (j < len && b(tokStart + j) == st(j)) j += 1
            if (j == len) { nStop += 1; matched = true }
          }
          k += 1
        }
        if (i < n) nSpaces += 1
        tokStart = i + 1
      }
      if (i < n && (b(i) & 0xc0) != 0x80) nChars += 1
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nChars, nSpaces + 1L, nStop, nChars - nSpaces))
  }

  /** Unicode NFC normalization with an ASCII fast path. Training corpora mix
    * composed and decomposed encodings of the same text (e.g. é vs e+U+0301);
    * canonicalizing before fingerprinting/dedup is a standard pipeline stage.
    * The fast path matters at scale: web text is overwhelmingly ASCII, and
    * java.text.Normalizer allocates — so a byte scan skips it entirely when
    * no byte has the high bit set (ASCII is closed under NFC). */
  def nfc(s: UTF8String): UTF8String = {
    val b = s.getBytes
    var i = 0
    while (i < b.length) {
      if ((b(i) & 0x80) != 0) {
        val str = s.toString
        return if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
        else UTF8String.fromString(
          java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
      }
      i += 1
    }
    s
  }

  /** splitmix64 finalizer (Steele et al. 2014, public-domain constants):
    * closed-form 64-bit mixer whose every step — wrapping add, logical
    * shifts, wrapping multiplies — is reproducible in plain SQL (DuckDB:
    * HUGEINT arithmetic mod 2^64, see graft.util.OracleSql.sm64Select).
    * Used wherever a hash VALUE (not just hash equality) must be mirrored
    * bit-exactly by the oracle: the minhash signature family and the
    * simhash bit-majority input. xxhash64 stays for engine-internal
    * bucket/band KEYS where only equality matters. */
  def sm64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** See [[SignBits]]: bit i (0-based) ⇔ element i+1 ≥ 0, first 64 elems.
    * `!(x < 0)` not `x >= 0`: Spark SQL orders NaN above every value, so
    * the CASE-WHEN formulation this replaces sets the bit for NaN — Java's
    * `NaN >= 0` would not. A NULL element leaves the bit UNSET, matching
    * that formulation's `WHEN null THEN ... ELSE 0` (getFloat on a null
    * slot is undefined, so the isNullAt guard is load-bearing). */
  def signBits(a: ArrayData): Long = {
    val n = math.min(64, a.numElements())
    var bits = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !(a.getFloat(i) < 0f)) bits |= 1L << i
      i += 1
    }
    bits
  }

  def rollingHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      // h = (h*131 + b) mod 2^61-1 with 131 = 2^7 + 2^1 + 2^0; each term is
      // < 2^61 so the sum stays below 2^63 before the final reduction.
      var t = shlMod(h, 7) + shlMod(h, 1) + h + (bytes(i) & 0xffL)
      while (t >= HashMod) t -= HashMod
      h = t
      i += 1
    }
    h
  }
}

/** Companion statics for [[ArrayDot]] — sequential index-order accumulation
  * so results are BIT-IDENTICAL to the `aggregate(zip_with(a, b, _*_), 0.0,
  * _+_)` HOF formulation they replace (the DuckDB oracle hashes depend on
  * that exact double-add order). */
object ArrayDotUtil {
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }
  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }
}

/** array_dot(a, b) → Σ aᵢ·bᵢ as a native codegen expression over
  * array<float>/array<double>. Replaces the zip_with + aggregate HOF chain
  * in the similarity/dedup pillar hot paths: the HOF pair materializes an
  * intermediate array and evaluates a lambda per element outside
  * whole-stage codegen; this is one tight loop over the underlying
  * ArrayData (measured: sim_cosine_topk 11.9 → see PERF). Assumes
  * non-null elements (the embeddings corpus guarantees it). */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"
  private def fn: String = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => "dotF"
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => "dotD"
    case other => throw new IllegalArgumentException(
      s"array_dot needs two float arrays or two double arrays, got $other")
  }
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (fn == "dotF") ArrayDotUtil.dotF(x, y) else ArrayDotUtil.dotD(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ArrayDotUtil.$fn($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDot =
    copy(left = l, right = r)
}

/** erf(x) as a native Catalyst expression with codegen — stays inside
  * whole-stage codegen instead of a Scala UDF's boxing boundary. */
case class Erf(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "erf"
  override def nullSafeEval(v: Any): Any = ExprUtil.erf(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprUtil.erf($c)")
  override protected def withNewChildInternal(c: Expression): Erf = copy(child = c)
}

/** rolling_hash(str) → 61-bit fingerprint, codegen-native. */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"
  override def nullSafeEval(v: Any): Any = ExprUtil.rollingHash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprUtil.rollingHash($c)")
  override protected def withNewChildInternal(c: Expression): RollingHash = copy(child = c)
}

/** splitmix64(long) → mixed long, codegen-native (see ExprUtil.sm64). */
case class SplitMix64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "splitmix64"
  override def nullSafeEval(v: Any): Any = ExprUtil.sm64(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprUtil.sm64($c)")
  override protected def withNewChildInternal(c: Expression): SplitMix64 = copy(child = c)
}

/** sign_bits(array<float>) → long with bit i set iff element i+1 ≥ 0
  * (first 64 elements). One codegen-native node replacing the 96-deep
  * CASE-WHEN band construction in the sign-LSH pipelines: semantics are
  * IDENTICAL to `Σ CASE WHEN element_at(v, i+1) >= 0 THEN 2ⁱ END` per
  * 16-bit band (band j = bits >>> 16j & 0xFFFF), so the closed-form DuckDB
  * oracles are untouched — but the Catalyst tree shrinks from ~64 KB
  * (which the self-join duplicated onto both sides, costing ~2.8 s of
  * whole-stage codegen source generation PER RUN at any SF) to one node.
  * NaN SETS the bit: Spark SQL comparison semantics order NaN above every
  * numeric, so the CASE WHEN it replaces evaluates `NaN >= 0` to true. */
case class SignBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_bits"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sign_bits needs array<float>, got $other")
    }
  override def nullSafeEval(v: Any): Any = ExprUtil.signBits(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprUtil.signBits($c)")
  override protected def withNewChildInternal(c: Expression): SignBits = copy(child = c)
}

/** nfc_normalize(str) → Unicode NFC canonical form, codegen-native (Spark has
  * no built-in normalizer; the reference's string runtime is byte-oriented and
  * sidesteps the question — this is the pipeline-grade answer). Oracle:
  * DuckDB's nfc_normalize. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(v: Any): Any = ExprUtil.nfc(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprUtil.nfc($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(child = c)
}

/** text_stats(str, stopwords) → struct<n_chars, n_tokens, n_stop, sum_tok_len>
  * — the quality-scoring signals of SURVEY's text-analysis pillar in one
  * codegen-native byte scan (see ExprUtil.textStats for the exact semantics
  * contract vs the split/filter/aggregate HOF formulation it replaces). */
case class TextStats(child: Expression, stopwords: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_chars", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_tokens", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_stop", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("sum_tok_len", LongType, nullable = false)))
  override def prettyName: String = "text_stats"
  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stopwords.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
  override def nullSafeEval(v: Any): Any =
    ExprUtil.textStats(v.asInstanceOf[UTF8String], stopBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopsRef = ctx.addReferenceObj("stopBytes", stopBytes, "byte[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprUtil.textStats($c, $stopsRef)")
  }
  override protected def withNewChildInternal(c: Expression): TextStats = copy(child = c)
}

/** Column-level entry points + SQL registration (the engine's function
  * registry, mirroring LingoDB's builtin table — SURVEY §2.3). */
object GraftFunctions {
  def erf(c: Column): Column =
    GraftColumnBridge.column(Erf(GraftColumnBridge.expression(c.cast("double"))))
  def rolling_hash(c: Column): Column =
    GraftColumnBridge.column(RollingHash(GraftColumnBridge.expression(c.cast("string"))))
  def splitmix64(c: Column): Column =
    GraftColumnBridge.column(SplitMix64(GraftColumnBridge.expression(c.cast("long"))))
  def nfc_normalize(c: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(c.cast("string"))))
  def text_stats(c: Column, stopwords: Seq[String]): Column =
    GraftColumnBridge.column(TextStats(GraftColumnBridge.expression(c.cast("string")), stopwords))
  def sign_bits(c: Column): Column =
    GraftColumnBridge.column(SignBits(GraftColumnBridge.expression(c)))
  def array_dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(ArrayDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  /** ‖v‖₂ via array_dot(v, v) — same accumulation order as the
    * transform+aggregate HOF norm it replaces. */
  def array_norm(c: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(array_dot(c, c))
  }
  def erf(name: String): Column = erf(col(name))

  /** random_in_range(from, to) → uniform long in [from, to). Reference
    * surface: `RandomInRange` (RuntimeFunctions.cpp:310, impl
    * IntegerRuntime.cpp:26-30 — seeded mt19937, half-open range). The
    * reference draws from ONE process-global generator; a distributed
    * engine can't serialize rows through a single RNG, so this composes
    * Spark's per-partition-seeded `rand` (the idiomatic distributed
    * equivalent: deterministic per (seed, partition, row-position),
    * embarrassingly parallel, stays in codegen). */
  def random_in_range(from: Column, to: Column, seed: Long = 0L): Column = {
    import org.apache.spark.sql.functions.{floor, rand}
    (floor(rand(seed) * (to.cast("double") - from.cast("double"))) +
      from.cast("double")).cast("long")
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{Add, Cast, Floor, Literal, Multiply, Rand, Subtract}
    val reg = spark.sessionState.functionRegistry
    // Explicit casts stand in for ImplicitCastInputTypes (private[sql] in
    // Spark 4): erf(1.0) parses as a Decimal literal otherwise.
    reg.createOrReplaceTempFunction("erf",
      exprs => Erf(Cast(exprs.head, DoubleType)), "built-in")
    reg.createOrReplaceTempFunction("rolling_hash",
      exprs => RollingHash(Cast(exprs.head, StringType)), "built-in")
    reg.createOrReplaceTempFunction("nfc_normalize",
      exprs => NfcNormalize(Cast(exprs.head, StringType)), "built-in")
    reg.createOrReplaceTempFunction("array_dot",
      exprs => ArrayDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("random_in_range",
      exprs => {
        // arity 2 = unseeded, arity 3 = explicit seed (mirrors the Scala
        // API); anything else is a user error, not something to ignore
        if (exprs.length < 2 || exprs.length > 3)
          throw new IllegalArgumentException(
            s"random_in_range(from, to[, seed]) takes 2 or 3 arguments, got ${exprs.length}")
        val from = Cast(exprs(0), DoubleType)
        val to = Cast(exprs(1), DoubleType)
        val seed = if (exprs.length == 3) Cast(exprs(2), LongType) else Literal(0L)
        Cast(Add(Floor(Multiply(new Rand(seed), Subtract(to, from))), from), LongType)
      }, "built-in")
  }
}
