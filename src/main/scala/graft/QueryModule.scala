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
    *
    * Round-14 hot-path form: `cast(double AS decimal)` routes through
    * `BigDecimal.valueOf(Double.toString)` — a per-row string format +
    * parse that dominated the headline aggregate stages (measured 3x on
    * the q1 shape: 0.58 s -> 0.20 s for the 600k-row scan+agg at
    * sf0.1). The scaled-long form sums `rint(c * 10^4)` as a cheap
    * compact decimal (Decimal(long), no string round-trip) and divides
    * ONCE PER GROUP by 10^4 in exact decimal, then casts to double.
    *
    * Value equivalence to the old form (DsumEquivalenceSpec pins it):
    * for the testdata contract above (doubles carrying <= 4 decimal
    * digits, |value| well below 2^49), rint(c * 10^4) is exactly the
    * unscaled value of cast(c AS DECIMAL(18,4)) — the product's
    * relative error is <= 2^-51, far below the 0.5 needed to flip
    * rint, and no .5-tie can exist at the 4th decimal of 4-decimal
    * data. The per-group decimal division by 10^4 is exact (result
    * scale 6 >= 4) and the single final cast to double is correctly
    * rounded in both forms, so the emitted double is bit-identical.
    * Overflow headroom is unchanged: sum accumulates in decimal with
    * 10 extra digits exactly as before.
    */
  def dsum(c: Column): Column =
    (sum(rint(c * 10000).cast("long").cast(DecimalType(18, 0))) /
      lit(10000).cast(DecimalType(5, 0))).cast("double")

  /** Exact sum with higher scale, for products of decimals. */
  def dsum8(c: Column): Column =
    sum(c.cast(DecimalType(38, 8))).cast("double")

  /** Decimal-cast copy of a double column (exact for <=4-decimal data). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Deterministic mean: exact decimal sum / count, in double. */
  def dmean(c: Column): Column = dsum(c) / count(c)
}
