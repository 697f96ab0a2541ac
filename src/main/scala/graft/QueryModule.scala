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
    * for 4-decimal doubles with |value| <= ~2*10^11, rint(c * 10^4) is
    * exactly the unscaled value of cast(c AS DECIMAL(18,4)). The
    * correct bound (round-15, ADVICE r14): the 4-decimal value's
    * nearest-double representation error is <= ulp(c)/2 and the
    * multiply adds <= (c*10^4)*2^-53, so rint is guaranteed unflipped
    * while 10^4*ulp(c) < 0.5-ish — i.e. |c| < ~2.7*10^11 (ulp(2^38) =
    * 2^-14); conservatively 2*10^11. (The r14 comment claimed "well
    * below 2^49", comparing a relative error to the absolute 0.5
    * flip threshold — wrong, though far above any tested magnitude.)
    * Between ~2*10^11 and the old form's 10^14 DECIMAL(18,4) ceiling
    * the scaled-long form may differ by 1 in the 4th decimal; the
    * testdata contract keeps every sum-input orders of magnitude
    * below either bound. The per-group decimal division by 10^4 is
    * exact (result scale 6 >= 4) and the single final cast to double
    * is correctly rounded in both forms, so the emitted double is
    * bit-identical. Overflow headroom is unchanged: sum accumulates
    * in decimal with 10 extra digits exactly as before.
    *
    * The abs(c) < 10^14 guard (round-15, VERDICT r14 #7) restores the
    * old form's NULL classes exactly: cast(x AS DECIMAL(18,4)) turned
    * NaN, +-Inf and |x| >= 10^14 into NULL (which sum then SKIPPED),
    * where bare rint(x*10^4).cast(long) would contribute 0 /
    * +-Long.MaxValue rows to the sum. NaN fails the < comparison
    * (null branch), +-Inf and overflow fail it too — one codegen'd
    * compare per row, measured free on the q1 microbench shape.
    */
  def dsum(c: Column): Column =
    (sum(when(abs(c) < 1e14, rint(c * 10000).cast("long").cast(DecimalType(18, 0)))) /
      lit(10000).cast(DecimalType(5, 0))).cast("double")

  /** Exact sum with higher scale, for products of decimals. */
  def dsum8(c: Column): Column =
    sum(c.cast(DecimalType(38, 8))).cast("double")

  /** Decimal-cast copy of a double column (exact for <=4-decimal data). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Deterministic mean: exact decimal sum / count, in double. */
  def dmean(c: Column): Column = dsum(c) / count(c)
}
