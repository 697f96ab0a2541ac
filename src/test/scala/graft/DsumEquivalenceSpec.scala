package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** OracleNum.dsum's round-14 scaled-long form must emit the exact
  * double the original decimal-cast form emitted, for the testdata
  * contract (doubles carrying <= 4 decimal digits) — including signs,
  * nulls, empty groups, and magnitudes through the 2^49 safety margin
  * documented in QueryModule.scala.
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
        -99999999999.9999, 0.3, 0.7, 12345.6789, null) ++
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
