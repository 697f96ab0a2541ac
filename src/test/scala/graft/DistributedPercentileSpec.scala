package graft

import graft.operators.DistributedPercentile
import org.apache.spark.sql.functions._

/** DistributedPercentile must be value-for-value exact against Spark's
  * own exact `percentile` aggregate (pandas linear interpolation,
  * core/nanops.py nanpercentile semantics) — the operator exists so the
  * exact path survives scale (Spark's aggregate merges every distinct
  * value on one reducer; the sf100 differential priced that at 517 s,
  * SCALE.md r8), not to approximate.
  */
class DistributedPercentileSpec extends SparkSpec {

  private def sparkExact(df: org.apache.spark.sql.DataFrame, c: String,
                         ps: Seq[Double]): Seq[Double] =
    df.select(expr(
        s"percentile($c, array(${ps.mkString(",")}))").as("p"))
      .head().getSeq[Double](0)

  test("matches Spark's exact percentile on a real column") {
    val li = Tables(spark, sf(), "lineitem")
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val got = DistributedPercentile.exact(li, "l_extendedprice", ps)
    val want = sparkExact(
      li.select(col("l_extendedprice").cast("double").as("v")), "v", ps)
    got.zip(want).zip(ps).foreach { case ((g, w), p) =>
      assert(math.abs(g - w) <= math.abs(w) * 1e-12,
        s"p=$p: got $g want $w")
    }
  }

  test("heavy ties: interpolation across a run of equal values") {
    import spark.implicits._
    // 1000 rows, only 3 distinct values — every window lands inside
    // a tie run, exercising the order-statistic walk across counts
    val df = (Seq.fill(500)(1.0) ++ Seq.fill(499)(2.0) ++ Seq(3.0)).toDF("v")
    val ps = Seq(0.1, 0.4995, 0.5, 0.999, 1.0)
    val got = DistributedPercentile.exact(df, "v", ps)
    val want = sparkExact(df, "v", ps)
    got.zip(want).zip(ps).foreach { case ((g, w), p) =>
      assert(g == w, s"p=$p: got $g want $w")
    }
  }

  test("single row, empty, and null-only inputs") {
    import spark.implicits._
    val one = Seq(42.0).toDF("v")
    assert(DistributedPercentile.exact(one, "v", Seq(0.0, 0.5, 1.0)) ==
      Seq(42.0, 42.0, 42.0))
    val empty = Seq.empty[Double].toDF("v")
    assert(DistributedPercentile.exact(empty, "v", Seq(0.5))
      .forall(_.isNaN))
    val nulls = Seq[Option[Double]](None, None).toDF("v")
    assert(DistributedPercentile.exact(nulls, "v", Seq(0.5))
      .forall(_.isNaN))
  }

  test("nulls are ignored, matching Spark/pandas") {
    import spark.implicits._
    val df = Seq[Option[Double]](Some(1.0), None, Some(2.0), Some(3.0),
      None, Some(4.0)).toDF("v")
    val got = DistributedPercentile.exact(df, "v", Seq(0.5))
    assert(got == Seq(2.5))
  }

  test("rejects out-of-range percentiles") {
    val li = Tables(spark, sf(), "lineitem")
    intercept[IllegalArgumentException] {
      DistributedPercentile.exact(li, "l_extendedprice", Seq(1.5))
    }
  }

  test("stacked multi-column form == per-column exactGrouped join") {
    // the round-15 scan-sharing variant must be row-identical to
    // running one exactGrouped pipeline per column and joining —
    // including a group where one column is all-null (dropped by the
    // inner join in both forms) and heavy ties
    import spark.implicits._
    val df = Seq(
      ("a", Some(1.0), Some(10.0)), ("a", Some(2.0), Some(10.0)),
      ("a", Some(2.0), Some(30.0)), ("a", Some(9.0), None),
      ("b", Some(5.0), None), ("b", Some(5.0), None),
      ("b", Some(7.0), None), ("c", None, Some(1.0))).toDF("g", "x", "y")
    val ps1 = Seq(0.5, 0.25, 0.75); val ps2 = Seq(0.9)
    val sep = DistributedPercentile.exactGrouped(
        df.select($"g", $"x"), Seq("g"), "x", ps1, Seq("m", "q25", "q75"))
      .join(DistributedPercentile.exactGrouped(
        df.select($"g", $"y"), Seq("g"), "y", ps2, Seq("q90")), Seq("g"))
    val stacked = DistributedPercentile.exactGroupedStacked(
      df.selectExpr("g", "stack(2, 'x', x, 'y', y) as (cn, v)"),
      Seq("g"), "cn", "v",
      Seq(("x", ps1, Seq("m", "q25", "q75")), ("y", ps2, Seq("q90"))))
    assert(sep.exceptAll(stacked).isEmpty && stacked.exceptAll(sep).isEmpty,
      s"stacked=${stacked.collect().toSeq} separate=${sep.collect().toSeq}")
  }
}
