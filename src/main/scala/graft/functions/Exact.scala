package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Engine-portable exact arithmetic helpers.
  *
  * The driver hash-compares query output against DuckDB, so every
  * aggregated numeric must be bit-identical across engines. Raw
  * `SUM(double)` is accumulation-order-dependent (Spark partial aggs run
  * in nondeterministic order), so money/quantity columns are cast to
  * DECIMAL(18,2) first — exact, order-independent — and the final value
  * is cast back to DOUBLE (a single deterministic IEEE conversion both
  * engines perform identically).
  */
object Exact {
  /** Cast a 2-decimal-valued double column to exact decimal. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact SUM of a 2-decimal double column, returned as double. */
  def sumD(c: Column): Column = sum(dec2(c)).cast("double")

  /** Exact SUM of an already-decimal expression, returned as double. */
  def sumExpr(e: Column): Column = sum(e).cast("double")

  /** Order-independent AVG: exact decimal sum / count, double division. */
  def avgD(c: Column): Column =
    sum(dec2(c)).cast("double") / count(c).cast("double")

  /** l_extendedprice * (1 - l_discount) in exact decimal. */
  def discPrice(price: Column, discount: Column): Column =
    dec2(price) * (lit(1).cast(DecimalType(18, 2)) - dec2(discount))

  /** Quantized natural log, floor(ln(x)·10⁴ + 0.5) as BIGINT — the ONE
    * definition of the engine-portable ln ladder (entropy/MI/PSI/
    * Kaplan–Meier/PMI all sum these as integers; summed raw doubles
    * would be partition-order-dependent). Oracle SQL mirrors the same
    * expression verbatim. Hoisted here after a review found 6 inline
    * copies — a rounding-convention change must happen in exactly one
    * place or the cross-engine hash gates diverge silently. */
  def ln4(c: Column): Column =
    floor(log(c.cast("double")) * lit(10000.0) + lit(0.5))

  /** SQL-string twin of [[ln4]] — interpolate into BOTH the Spark
    * `expr(...)` string and the DuckDB oracle (the shared-literal
    * rule). Hoisted after a review found the fragment re-typed in ten
    * places across operator/oracle files: a rounding-convention edit
    * to ONE copy silently breaks that entry's cross-engine hash. */
  def ln4Sql(e: String): String =
    s"CAST(floor(ln(CAST(($e) AS DOUBLE)) * 10000.0 + 0.5) AS BIGINT)"

  /** Sample stddev via exact decimal sums: sqrt((Σx² − (Σx)²/n)/(n−1)),
    * evaluated in double with a fixed operation order both engines share. */
  def stddevD(c: Column): Column = {
    val n = count(c).cast("double")
    val s = sum(dec2(c)).cast("double")
    val s2 = sum(dec2(c) * dec2(c)).cast("double")
    sqrt((s2 - s * s / n) / (n - lit(1.0)))
  }
}
