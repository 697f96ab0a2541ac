package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** OracleNum.dsum's scaled-long form must emit the exact double the
  * original decimal-cast form emitted, for the testdata contract
  * (doubles carrying <= 4 decimal digits) — including signs, nulls,
  * empty groups, magnitudes through the documented ~2*10^11 exactness
  * bound (QueryModule.scala; the r14 "2^49" claim was wrong — fixed
  * per ADVICE r14). The round-15 guard classes — NaN, +-Inf,
  * |x| >= 10^14 — are pinned separately: under this engine's ANSI
  * default the old DECIMAL(18,4) cast THREW on them (NULL-skip was
  * the pre-ANSI behavior), while the unguarded r14 scaled-long form
  * silently summed 0 / +-Long.MaxValue; the guard makes dsum
  * null-skip those rows, strictly more defined than either.
  */
class DsumEquivalenceSpec extends SparkSpec {

  /** the pre-round-14 formulation, kept here as the reference */
  private def dsumOld(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  test("dsum == decimal-cast dsum on adversarial 4-decimal doubles") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vals: Seq[java.lang.Double] =
      Seq[java.lang.Double](0.0, -0.0, 0.0001, -0.0001, 1.0, -1.0,
        104949.5, 0.01, 0.02, 0.04, 0.1, 99999999999.9999,
        -99999999999.9999, 0.3, 0.7, 12345.6789, null,
        // adversarial rows at the documented ~2*10^11 exactness bound
        // (ulp(c) = 2^-15 here, so 10^4*ulp/2 = 0.15 < 0.5 — the last
        // guaranteed-exact octave)
        199999999999.0001, -199999999999.0001, 274877906943.0001) ++
        (1 to 2000).map(_ =>
          java.lang.Double.valueOf(
            math.rint(rnd.nextDouble() * 2e9 - 1e9) / 10000.0)) ++
        (1 to 2000).map(_ =>
          java.lang.Double.valueOf(math.rint(rnd.nextDouble() * 2e5 - 1e5) / 100.0))
    val df = vals.zipWithIndex
      .map { case (v, i) => (i % 7, v) }.toDF("g", "x")
    val out = df.groupBy($"g")
      .agg(OracleNum.dsum($"x").as("nu"), dsumOld($"x").as("old"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nu = r.getAs[Any]("nu"); val old = r.getAs[Any]("old")
      assert(nu == old, s"group ${r.get(0)}: new=$nu old=$old")
    }
  }

  test("guard null-skips NaN, +-Inf and >= 1e14 rows (round-15)") {
    import spark.implicits._
    // one group mixing valid 4-decimal rows with every guard class;
    // dsum must equal the sum of the valid rows alone. (The old
    // decimal-cast form THROWS on these under ANSI — asserted below —
    // and the unguarded r14 form summed 0 / +-Long.MaxValue.)
    val df = Seq[java.lang.Double](1.5, 2.25, Double.NaN,
      Double.PositiveInfinity, Double.NegativeInfinity, 1.0e15, -1.0e15,
      1.0e14 /* exactly the guard boundary: excluded */)
      .toDF("x").withColumn("g", lit(1))
    val r = df.groupBy($"g").agg(OracleNum.dsum($"x").as("s")).collect()(0)
    assert(r.getDouble(1) == 3.75, s"guarded dsum: ${r.getDouble(1)}")
    val thrown = intercept[Exception] {
      df.groupBy($"g").agg(dsumOld($"x").as("s")).collect()
    }
    assert(thrown.getMessage.contains("NUMERIC_VALUE_OUT_OF_RANGE") ||
      thrown.getMessage.contains("CAST_OVERFLOW") ||
      Option(thrown.getCause).exists(c =>
        c.getMessage.contains("NUMERIC_VALUE_OUT_OF_RANGE") ||
        c.getMessage.contains("CAST_OVERFLOW")),
      s"old form should overflow under ANSI, got: ${thrown.getMessage.take(200)}")
  }

  test("dsum of all-null / empty input stays null") {
    import spark.implicits._
    val df = Seq[(Int, java.lang.Double)]((1, null), (1, null)).toDF("g", "x")
    val r = df.groupBy($"g").agg(OracleNum.dsum($"x").as("s")).collect()(0)
    assert(r.isNullAt(1))
  }

  test("q1 sum_disc_price scaled-long form matches the decimal form") {
    import spark.implicits._
    val li = Tables(spark, sf(), "lineitem")
    val out = li.groupBy($"l_returnflag")
      .agg(
        ((sum(rint($"l_extendedprice" * 100).cast("long")
            .cast("decimal(18,0)")) / lit(100).cast("decimal(3,0)")) -
          (sum((rint($"l_extendedprice" * 100).cast("long") *
              rint($"l_discount" * 100).cast("long")).cast("decimal(20,0)")) /
            lit(10000).cast("decimal(5,0)")))
          .cast("double").as("nu"),
        (sum($"l_extendedprice".cast("decimal(12,2)")).cast("decimal(38,4)") -
          sum(($"l_extendedprice".cast("decimal(12,2)") * $"l_discount".cast("decimal(6,2)"))
            .cast("decimal(38,4)")))
          .cast("double").as("old"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"flag ${r.get(0)}: new=${r.getDouble(1)} old=${r.getDouble(2)}")
    }
  }
}
