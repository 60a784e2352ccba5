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

  /** Order-independent sum of a double column, output double. */
  def dsum(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Order-independent sum with 4-decimal precision (squares etc.). */
  def dsum4(c: Column): Column = sum(dec4(c)).cast(DoubleType)

  /** Order-independent average: exact decimal sum / count, both engines agree. */
  def davg(c: Column): Column = sum(dec2(c)).cast(DoubleType) / count(c)

  /** Narrow 2-decimal cast for factors of a product. Raw table doubles sit
    * within ~1e-9 of an exact cent value, so Spark's BigDecimal HALF_UP cast
    * and DuckDB's scaled-double cast agree; products of already-cast decimals
    * are then exact in both engines (a double product cast to decimal is NOT —
    * the two engines disagree near half-cent boundaries). decimal(12,2)
    * operands keep a 3-factor product inside the 38-digit limit with no
    * precision loss on either engine. */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Order-independent sum of an exact decimal product of factors. */
  def msum(factors: Column*): Column =
    sum(factors.map(money).reduce(_ * _)).cast(DoubleType)

  /** Cast int-ish column to BIGINT — DuckDB `sum(int)` yields HUGEINT and
    * `count` yields BIGINT; standardizing every integer output on BIGINT keeps
    * schemas comparable. */
  def big(c: Column): Column = c.cast(LongType)
}
