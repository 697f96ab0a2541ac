package graft

import org.apache.spark.sql.functions._

/** SearchSorted (binary-search range bucketing) must be bit-equal to
  * the literal when-chain fold it replaced in GlobalOrder and the
  * keyless as-of — including the null → 0 and NaN-greatest corners
  * (Spark SQL comparison orders NaN above every double, so the fold
  * counts every bound for NaN; so does binarySearch's insertion
  * point) — in both codegen and interpreted eval.
  */
class SearchSortedSpec extends SparkSpec {

  private val bounds = Seq(-3.5, 0.0, 1.25, 7.0, 100.0)

  test("matches the when-chain fold on both strictness modes") {
    import spark.implicits._
    val vals: Seq[java.lang.Double] =
      Seq[java.lang.Double](-10.0, -3.5, -3.4999, 0.0, 0.5, 1.25, 6.9,
        7.0, 99.0, 100.0, 1e9, null, Double.NaN,
        Double.NegativeInfinity, Double.PositiveInfinity)
    val df = vals.toDF("v").cache()
    val foldStrict = bounds.foldLeft(lit(0)) { (a, b) =>
      a + when($"v" > lit(b), 1).otherwise(0) }
    val foldIncl = bounds.foldLeft(lit(0)) { (a, b) =>
      a + when($"v" >= lit(b), 1).otherwise(0) }
    val got = df.select($"v",
      graft.functions.SearchSorted.bucketOf($"v", bounds, inclusive = false)
        .as("ss_s"),
      graft.functions.SearchSorted.bucketOf($"v", bounds, inclusive = true)
        .as("ss_i"),
      foldStrict.as("f_s"), foldIncl.as("f_i")).collect()
    got.foreach { r =>
      assert(r.getInt(1) === r.getInt(3),
        s"strict mismatch at v=${r.get(0)}: ss=${r.getInt(1)} fold=${r.getInt(3)}")
      assert(r.getInt(2) === r.getInt(4),
        s"inclusive mismatch at v=${r.get(0)}: ss=${r.getInt(2)} fold=${r.getInt(4)}")
    }
  }

  test("interpreted eval agrees with codegen") {
    val e = graft.functions.SearchSorted(
      org.apache.spark.sql.catalyst.expressions.Literal(42.0),
      bounds.toArray, inclusive = false)
    assert(e.eval(null) === 4)
    val eNull = graft.functions.SearchSorted(
      org.apache.spark.sql.catalyst.expressions.Literal(null,
        org.apache.spark.sql.types.DoubleType),
      bounds.toArray, inclusive = true)
    assert(eNull.eval(null) === 0)
  }

  test("±0.0 follows Spark comparison semantics (-0.0 == 0.0)") {
    import spark.implicits._
    // Spark's nanSafeCompareDoubles treats -0.0 == 0.0; the fold
    // (`v > b` / `v >= b`) therefore can't tell them apart, and
    // neither may the binary search — with a 0.0 bound and -0.0
    // values (and vice versa) both must land in the same bucket.
    val vals = Seq(-0.0, 0.0, -1.0, 1.0)
    for (zeroBound <- Seq(0.0, -0.0)) {
      val bs = Seq(-3.5, zeroBound, 1.25)
      val df = vals.toDF("v")
      val foldS = bs.foldLeft(lit(0)) { (a, b) =>
        a + when($"v" > lit(b), 1).otherwise(0) }
      val foldI = bs.foldLeft(lit(0)) { (a, b) =>
        a + when($"v" >= lit(b), 1).otherwise(0) }
      val got = df.select($"v",
        graft.functions.SearchSorted.bucketOf($"v", bs, inclusive = false).as("ss_s"),
        graft.functions.SearchSorted.bucketOf($"v", bs, inclusive = true).as("ss_i"),
        foldS.as("f_s"), foldI.as("f_i")).collect()
      got.foreach { r =>
        assert(r.getInt(1) === r.getInt(3),
          s"strict mismatch (bound=$zeroBound) at v=${r.get(0)}")
        assert(r.getInt(2) === r.getInt(4),
          s"inclusive mismatch (bound=$zeroBound) at v=${r.get(0)}")
      }
      // -0.0 and 0.0 values are Spark-equal: identical buckets
      val byV = got.map(r => r.getDouble(0) -> (r.getInt(1), r.getInt(2))).toMap
      assert(byV(-0.0) === byV(0.0))
    }
  }

  test("unsorted or duplicated bounds are normalized by bucketOf") {
    import spark.implicits._
    val df = Seq(0.5, 2.0).toDF("v")
    val got = df.select(graft.functions.SearchSorted
      .bucketOf($"v", Seq(1.25, 0.0, 1.25, -3.5), inclusive = false)
      .as("b")).collect().map(_.getInt(0)).toSeq
    assert(got === Seq(2, 3))
  }
}
