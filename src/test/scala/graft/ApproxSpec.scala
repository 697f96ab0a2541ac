package graft

import org.apache.spark.sql.functions._

/** The approx= 100TB-mode switches have no SQL oracle (sketches are
  * engine-specific), so their accuracy contract is pinned here against
  * the exact answers: HLL++ count-distinct within 5% relative error,
  * approx_percentile within 2% of the exact percentile. */
class ApproxSpec extends SparkSpec {

  test("agg_approx_stats tracks the exact answers within bounds") {
    import spark.implicits._
    val approx = SparkEntry.queries("agg_approx_stats")(spark, sf()).collect()(0)
    val li = Tables(spark, sf(), "lineitem")
    val exact = li.agg(
      countDistinct($"l_partkey").cast("double").as("cd"),
      expr("percentile(l_extendedprice, array(0.5, 0.9))").as("p"))
      .select($"cd", element_at($"p", 1).as("p50"), element_at($"p", 2).as("p90"))
      .collect()(0)
    val cdErr = math.abs(approx.getLong(0) - exact.getDouble(0)) / exact.getDouble(0)
    assert(cdErr < 0.05, s"HLL count-distinct off by ${cdErr * 100}%")
    val p50Err = math.abs(approx.getDouble(1) - exact.getDouble(1)) / exact.getDouble(1)
    val p90Err = math.abs(approx.getDouble(2) - exact.getDouble(2)) / exact.getDouble(2)
    assert(p50Err < 0.02, s"approx p50 off by ${p50Err * 100}%")
    assert(p90Err < 0.02, s"approx p90 off by ${p90Err * 100}%")
  }
}
