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
    // the error brackets now live INSIDE the query (r8: the dump
    // carries contract booleans the DuckDB oracle asserts TRUE, so
    // the driver's hash gate machine-checks the bound); here the
    // booleans are asserted in-JVM too so a contract break fails the
    // suite even without the oracle harness
    val row = SparkEntry.queries("agg_approx_stats")(spark, sf()).collect()(0)
    assert(row.getLong(0) > 0, "exact distinct count must be positive")
    assert(row.getBoolean(1), "HLL count-distinct outside the rsd 0.05 contract")
    assert(row.getBoolean(2), "approx p50 outside the exact rank bracket")
    assert(row.getBoolean(3), "approx p90 outside the exact rank bracket")
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
