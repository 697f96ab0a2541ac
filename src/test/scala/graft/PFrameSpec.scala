package graft

import graft.api.PFrame
import org.apache.spark.sql.functions._

/** The pandas-shaped API compiles to the same results as the direct
  * Spark formulation.
  */
class PFrameSpec extends SparkSpec {

  private def li = PFrame(Tables(spark, sf(), "lineitem"))
  private def orders = PFrame(Tables(spark, sf(), "orders"))

  test("query + select + assign mirror pandas chains") {
    import spark.implicits._
    val got = li
      .query("l_quantity >= 45 AND l_returnflag = 'R'")
      .assign("net" -> ($"l_extendedprice" * (lit(1.0) - $"l_discount")))
      .apply("l_orderkey", "net")
      .count()
    val want = Tables(spark, sf(), "lineitem")
      .filter($"l_quantity" >= 45 && $"l_returnflag" === "R")
      .count()
    assert(got == want && got > 0)
  }

  test("groupby agg with pandas func names") {
    val out = li.groupby("l_returnflag")
      .agg("l_quantity" -> "sum", "l_quantity" -> "mean",
        "l_partkey" -> "nunique", "l_extendedprice" -> "max")
      .toDF.collect()
    assert(out.length == 3)
    assert(out.head.schema.fieldNames.contains("l_quantity_sum"))
  }

  test("merge applies suffixes to colliding columns") {
    val a = orders.apply("o_orderkey", "o_custkey", "o_totalprice")
    val b = orders.apply("o_orderkey", "o_totalprice")
    val m = a.merge(b, on = Seq("o_orderkey"))
    assert(m.columns.contains("o_totalprice_x"))
    assert(m.columns.contains("o_totalprice_y"))
    assert(m.count() == orders.count())
  }

  test("isinFrame is a semi join") {
    import spark.implicits._
    val big = orders.query("o_totalprice > 300000")
      .toDF.select($"o_custkey").distinct()
    val c = PFrame(Tables(spark, sf(), "customer"))
    val got = c.isinFrame("c_custkey", PFrame(big), "o_custkey").count()
    assert(got == big.count())
  }

  test("dropDuplicates keep=first picks min order") {
    import spark.implicits._
    val df = Seq((1, "a", 10), (1, "b", 20), (2, "c", 30))
      .toDF("k", "v", "ord")
    val out = PFrame(df).dropDuplicates(Seq("k"), Seq("ord"))
      .toDF.orderBy($"k").as[(Int, String, Int)].collect()
    assert(out.toSeq == Seq((1, "a", 10), (2, "c", 30)))
  }

  test("rolling sum honors min_periods") {
    import spark.implicits._
    val df = Seq((1, 1, 1.0), (1, 2, 2.0), (1, 3, 3.0)).toDF("k", "o", "x")
    val out = PFrame(df).rolling(2, order = "o", partition = Seq("k"), minPeriods = 2)
      .sum("x", "rsum")
      .toDF.orderBy($"o").select($"rsum").as[Option[Double]].collect()
    assert(out.toSeq == Seq(None, Some(3.0), Some(5.0)))
  }

  test("concat unions by name with missing columns") {
    import spark.implicits._
    val a = PFrame(Seq((1, "x")).toDF("id", "s"))
    val b = PFrame(Seq((2, 9.5)).toDF("id", "extra"))
    val out = PFrame.concat(Seq(a, b)).toDF
    assert(out.count() == 2 && out.columns.toSet == Set("id", "s", "extra"))
  }

  test("melt produces long form") {
    import spark.implicits._
    val df = Seq((1, 2.0, 3.0)).toDF("id", "a", "b")
    val out = PFrame(df).melt(Seq("id"), Seq("a", "b")).toDF
    assert(out.count() == 2)
    assert(out.columns.toSeq == Seq("id", "variable", "value"))
  }

  test("groupby rank average matches pandas method=average") {
    import spark.implicits._
    val df = Seq((1, 10.0), (1, 10.0), (1, 20.0)).toDF("k", "x")
    val out = PFrame(df).groupby("k").rank("x", method = "average", as = "r")
      .toDF.select($"x", $"r").as[(Double, Double)].collect().sortBy(_._1)
    // pandas: [1.5, 1.5, 3.0]
    assert(out.map(_._2).toSeq == Seq(1.5, 1.5, 3.0))
  }
}
