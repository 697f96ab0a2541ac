package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One family of operators from SURVEY.md §2. Each module contributes
  * named queries plus (where SQL-expressible) a DuckDB oracle for the
  * driver's differential check.
  */
trait QueryModule {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracle: Map[String, String]
}

/** Helpers to keep Spark results bit-identical to the DuckDB oracle.
  *
  * Floating-point reductions are order-dependent, and Spark's shuffle
  * order is nondeterministic — a plain `sum(double)` can differ from
  * DuckDB in the low bits and fail a hash compare. Policy:
  *
  *   - every float reduction goes through an exact DECIMAL sum
  *     (deterministic in both engines), then is cast back to double;
  *   - derived statistics (mean/var/corr/...) are computed from those
  *     exact sums with the *same* explicit formula on both sides;
  *   - multi-step float formulas additionally get `round(_, 6)` as
  *     insurance against expression-reassociation differences.
  *
  * The testdata's doubles carry <=4 decimal digits, so DECIMAL(20,4)
  * casts are exact and overflow-free at any tested scale factor.
  */
object OracleNum {
  /** Exact sum of a double column: cast to decimal, sum, back to double.
    * DECIMAL(18,4) keeps decimal multiply within both engines' exact
    * 38-digit range: (18,4)x(19,4) -> (38,8) in Spark, (37,8) in DuckDB.
    */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Exact sum with higher scale, for products of decimals. */
  def dsum8(c: Column): Column =
    sum(c.cast(DecimalType(38, 8))).cast("double")

  /** Decimal-cast copy of a double column (exact for <=4-decimal data). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Deterministic mean: exact decimal sum / count, in double. */
  def dmean(c: Column): Column = dsum(c) / count(c)
}
