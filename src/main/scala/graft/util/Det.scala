package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers for oracle-paired queries.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * same SQL, so float aggregates must be *bit*-identical across two
  * independent engines. Double summation order is not deterministic under
  * shuffle, so every float aggregate goes through exact arithmetic:
  *
  *   double --cast--> DECIMAL (exact, order-free sum) --cast--> double
  *
  * The double->decimal cast rounds to `s` fractional digits; a tie would
  * need the double to be exactly k.5 * 10^-s, which no binary double can be
  * (10^-s has a factor 5^s), so both engines round identically.
  *
  * Precision budget: factors are cast narrow enough that products stay
  * within DECIMAL(38) in BOTH engines (DuckDB errors on overflow rather
  * than losing scale; Spark silently reduces scale — both are avoided).
  */
object Det {
  /** Quantities / prices: < 10^8 with 4 fractional digits. */
  def dec4(c: Column): Column = c.cast("decimal(12,4)")

  /** Rates in [-99, 99]: discounts, taxes. */
  def rate(c: Column): Column = c.cast("decimal(8,6)")

  /** Order-insensitive exact sum of a price-like double, back to double. */
  def dsum(c: Column): Column = sum(dec4(c)).cast("double")

  /** Exact mean: decimal sum cast to double, divided by the count — the
    * same two IEEE ops in both engines. */
  def davg(c: Column): Column =
    sum(dec4(c)).cast("double") / count(lit(1))

  /** lineitem revenue term: extendedprice * (1 - discount), exact. */
  def revenueTerm(price: Column, discount: Column): Column =
    dec4(price) * (lit(1).cast("decimal(8,6)") - rate(discount))

  /** Exact revenue sum as double.
    *
    * Product terms carry scale 10+, so the exact sum times 10^scale can
    * exceed 2^53 — DuckDB's decimal->double cast then differs from Spark's
    * by an ulp. ROUND(.., 4) first (HALF_UP in both engines) keeps the
    * scaled integer below 2^53 so both casts are correctly rounded.
    */
  def revenue(price: Column, discount: Column): Column =
    round(sum(revenueTerm(price, discount)), 4).cast("double")

  /** Same scale-4 re-rounding for any high-scale decimal sum. */
  def sumr4(c: Column): Column = round(sum(c), 4).cast("double")
}
