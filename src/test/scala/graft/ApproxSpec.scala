package graft

import org.apache.spark.sql.functions._

/** The approx= 100TB-mode switches have no SQL oracle (sketches are
  * engine-specific), so two things are pinned here instead:
  *
  *   1. the accuracy CONTRACT each sketch actually documents — HLL++
  *      relative error (default rsd 0.05), and percentile_approx's
  *      rank-error bound (<= 1/accuracy), checked as a bracket of
  *      exact quantiles rather than a value-error tolerance the
  *      sketch never promises;
  *   2. the plan SHAPE that makes them 100TB switches at all: the
  *      sketch must partial-aggregate map-side (one merged buffer per
  *      partition crosses the exchange, not the distinct keys).
  */
class ApproxSpec extends SparkSpec {

  test("agg_approx_stats honors the sketches' documented error contracts") {
    import spark.implicits._
    val approx = SparkEntry.queries("agg_approx_stats")(spark, sf()).collect()(0)
    val li = Tables(spark, sf(), "lineitem")
    val exact = li.agg(
      countDistinct($"l_partkey").cast("double").as("cd"),
      // rank-error bracket: percentile_approx(accuracy=1000) guarantees
      // a value whose RANK is within 1/1000 of the target; the bracket
      // uses 2/1000 — the documented bound plus one rank step, since
      // exact `percentile` interpolates between data values while the
      // sketch returns an actual sample
      expr("percentile(l_extendedprice, array(0.498, 0.502, 0.898, 0.902))")
        .as("p"))
      .select($"cd",
        element_at($"p", 1).as("p50lo"), element_at($"p", 2).as("p50hi"),
        element_at($"p", 3).as("p90lo"), element_at($"p", 4).as("p90hi"))
      .collect()(0)
    val cdErr = math.abs(approx.getLong(0) - exact.getDouble(0)) / exact.getDouble(0)
    assert(cdErr < 0.05, s"HLL count-distinct off by ${cdErr * 100}% (rsd contract 5%)")
    val p50 = approx.getDouble(1)
    assert(p50 >= exact.getDouble(1) && p50 <= exact.getDouble(2),
      s"approx p50 $p50 outside exact rank bracket [${exact.getDouble(1)}, ${exact.getDouble(2)}]")
    val p90 = approx.getDouble(2)
    assert(p90 >= exact.getDouble(3) && p90 <= exact.getDouble(4),
      s"approx p90 $p90 outside exact rank bracket [${exact.getDouble(3)}, ${exact.getDouble(4)}]")
  }

  test("the sketches partial-aggregate map-side (the 100TB property)") {
    val plan = SparkEntry.queries("agg_approx_stats")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_count_distinct"),
      "approx_count_distinct must show a partial (map-side) aggregate — " +
      "a plan that shuffles raw keys defeats the sketch")
    assert(!plan.contains("Expand"),
      "no Expand node: the sketch path must not fall back to exact distinct")
  }
}
