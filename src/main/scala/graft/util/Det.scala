package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Determinism helpers for oracle parity.
  *
  * The driver hash-compares our parquet output against a DuckDB oracle running
  * "the same" SQL. Floating-point aggregation order differs between engines
  * (Spark partial/final aggregation vs DuckDB's), so a plain `sum(double)` is
  * not bit-reproducible. The reference engine sidesteps this by computing on
  * 128-bit decimals (LingoDB: `db.decimal` arithmetic on i128,
  * reference include/lingodb/compiler/Dialect/DB/IR/DBOps.td:121-129,
  * src/compiler/Conversion/DBToStd/LowerToStd.cpp:1079-1081). We take the same
  * route: cast each operand to an exact decimal *before* summing, so the sum is
  * order-independent and identical in both engines, then cast the final result
  * back to double for a stable output schema.
  */
object Det {
  /** Exact 2-decimal cast — matches `CAST(x AS DECIMAL(18,2))` in DuckDB. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact 4-decimal cast with headroom for squared terms. */
  def dec4(c: Column): Column = c.cast(DecimalType(24, 4))

  // -------------------------------------------------------- long-cents sums
  //
  // sum(decimal) in Spark leaves the compact-long fast path whenever the
  // aggregation buffer exceeds 18 digits (buffer precision = input + 10), and
  // the double→decimal CAST itself allocates a BigDecimal per row — together
  // ~7× slower than a plain double sum (measured at sf1, tools/Q1Probe).
  // Money-domain values are exact integers in sub-unit scale, so we scale to
  // LONG (round(x·10^s), HALF_UP like both engines' decimal cast — exact
  // because table doubles sit ~1e-9 from a sub-unit value, far from any
  // rounding boundary), sum in pure codegen'd long arithmetic, and convert
  // to decimal once per GROUP, not once per row.
  //
  // Long sums wrap silently at 2^63, so each value is split at 10^6 into
  // (hi, lo) and the two parts are summed separately: |lo| < 10^6 and
  // |hi| < |v|/10^6 keep both partial sums in-range past 10^12 rows per
  // group at the audited per-row magnitudes (≤ ~10^12) — 100 TB headroom.
  // The exact total is reassembled per group in decimal(38) and divided by
  // 10^scale (exact: result scale ≥ input scale), so the final
  // decimal→double conversion still rounds exactly once, preserving
  // bit-parity with DuckDB's sum(decimal)::double.

  private val Split = 1000000L

  /** HALF_UP integer scaling of a money-domain double to a long.
    * Per-row |x·10^s| must stay ≪ 2^53 (all audited callers ≤ ~10^12).
    *
    * Not Spark's `round()`: Round on DoubleType round-trips through
    * java.math.BigDecimal.valueOf(...).setScale(...) — one allocation per
    * row per operand, and tpch_q1 evaluates ~10 operands per lineitem row
    * (FloorProbe sf10: 39 CPU-s of task compute, the bench's dominant
    * cost). Cast-truncation toward zero of scaled ± 0.5 is branch-only
    * codegen and agrees with BigDecimal HALF_UP at every representable
    * double: ties round away from zero in both, and off-tie values are
    * ≥1 ulp from a boundary so the exact ±0.5 add (|x·10^s| ≪ 2^52)
    * cannot cross it. */
  private def scaledLong(c: Column, scale: Int): Column = {
    val scaled = c * math.pow(10, scale).toLong
    when(scaled >= 0, scaled + lit(0.5)).otherwise(scaled - lit(0.5)).cast(LongType)
  }

  /** Exact order-independent total of integer-scaled longs, as a decimal in
    * the original unit. */
  private def exactScaledTotal(v: Column, scale: Int): Column = {
    val lo = v % Split
    // (v - lo) is a multiple of Split and |v| < 2^53, so the double division
    // below is exact
    val hi = ((v - lo) / Split).cast(LongType)
    (sum(hi).cast(DecimalType(38, 0)) * lit(Split).cast(DecimalType(7, 0)) +
      sum(lo).cast(DecimalType(38, 0))) /
      lit(math.pow(10, scale).toLong).cast(DecimalType(7, 0))
  }

  /** Order-independent sum of a double column, output double. */
  def dsum(c: Column): Column =
    exactScaledTotal(scaledLong(c, 2), 2).cast(DoubleType)

  /** Order-independent sum with 4-decimal precision (squares etc.). */
  def dsum4(c: Column): Column =
    exactScaledTotal(scaledLong(c, 4), 4).cast(DoubleType)

  /** Order-independent average: exact decimal sum / count, both engines agree. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Narrow 2-decimal cast for factors of a product. Raw table doubles sit
    * within ~1e-9 of an exact cent value, so Spark's BigDecimal HALF_UP cast
    * and DuckDB's scaled-double cast agree; products of already-cast decimals
    * are then exact in both engines (a double product cast to decimal is NOT —
    * the two engines disagree near half-cent boundaries). decimal(12,2)
    * operands keep a 3-factor product inside the 38-digit limit with no
    * precision loss on either engine. */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Order-independent sum of an exact product of 2-decimal factors: the
    * factors are scaled to cent longs, multiplied in long space (exact — the
    * audited caller products stay ≤ ~10^12), and split-summed; the group
    * total is reassembled in decimal at scale 2·n and converted to double
    * once, identical to summing the decimal products directly. */
  def msum(factors: Column*): Column =
    exactScaledTotal(factors.map(scaledLong(_, 2)).reduce(_ * _),
      2 * factors.length).cast(DoubleType)

  /** Cast int-ish column to BIGINT — DuckDB `sum(int)` yields HUGEINT and
    * `count` yields BIGINT; standardizing every integer output on BIGINT keeps
    * schemas comparable. */
  def big(c: Column): Column = c.cast(LongType)
}
