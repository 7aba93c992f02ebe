package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Order-independent numeric aggregation.
  *
  * IEEE-754 double addition is not associative, so a grouped
  * `sum(double)` differs in the last ulp depending on partition/merge
  * order — `round(sum(double), k)` is only stable when the jitter lands
  * away from a rounding boundary (a lottery, not a guarantee). These
  * helpers sum exactly instead: per-row values are cast to
  * decimal(18,6) — every money/ratio input in the fixture carries <= 6
  * significant decimals, and the per-row double sits ~1e-11 from the
  * decimal grid, so the cast is unambiguous in any engine — summed
  * exactly in decimal space, and the exact result is cast back to
  * double (round-to-nearest: identical bits in Spark and DuckDB).
  *
  * This is also the right production choice at 100 TB: decimal sums
  * are exact and order-independent under AQE re-partitioning, and the
  * decimal(28,6) sum intermediate holds 10^22 — no overflow at any
  * realistic scale. The per-row cast is codegen'd; the aggregate stays
  * inside whole-stage codegen with partial/final split intact.
  */
object Exact {

  // When NOT to use this: integer-valued double columns (quantities,
  // counts) sum exactly in plain doubles at any order as long as the
  // sum stays below 2^53 — plain sum() is then both exact and ~2.5x
  // cheaper than the wide-decimal aggregation buffer. Reserve these
  // helpers for genuinely fractional inputs (money, rates, ratios).

  private val D = DecimalType(18, 6)

  /** Exact order-independent sum of a (<=6 dp) double expression,
    * returned as double. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast(DoubleType)

  /** Exact sum kept in decimal space (for intermediate columns that are
    * re-aggregated downstream — cast to double only at the very end). */
  def dsumDec(c: Column): Column = sum(c.cast(D))

  /** Order-independent mean: exact decimal sum over non-null count.
    * (Oracle-side twin: `CAST(sum(CAST(e AS DECIMAL(18,6))) AS DOUBLE)
    * / count(e)` — both engines divide identical doubles by identical
    * counts.) */
  def davg(c: Column): Column = sum(c.cast(D)).cast(DoubleType) / count(c)
}
