package graft

import org.apache.spark.sql.functions._

/** Pins the error contract of the 100 TB approximate switches.
  *
  * Every oracle-checked query uses EXACT kernels (percentile,
  * count(distinct)) so results hash-match DuckDB. SCALE.md documents
  * the at-scale switch — `percentile` -> `percentile_approx` (GK
  * sketch, rank error <= n/accuracy) and `count(distinct)` ->
  * `approx_count_distinct` (HLL++, relative std dev parameter) — with
  * the claim that it is a drop-in with bounded error and an identical
  * plan shape (partial -> final sketch merge instead of a dedup
  * shuffle). These tests hold that claim against real testdata; both
  * sketches are deterministic for a given input, so the assertions are
  * stable, not flaky.
  */
class ApproxSpec extends SparkSpec {

  private lazy val lineitem =
    spark.read.parquet(sf("0.01") + "/lineitem.parquet")

  test("approx_count_distinct stays within the HLL++ rsd envelope") {
    val rsd = 0.05
    val r = lineitem.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), rsd).as("approx")).head()
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    val relErr = math.abs(approx - exact) / exact
    // rsd is one standard deviation of relative error; 3x is the
    // conventional confidence envelope
    assert(relErr < 3 * rsd,
      s"HLL++ rel error $relErr exceeds 3*rsd (exact=$exact approx=$approx)")
  }

  test("percentile_approx respects the GK rank-error bound") {
    val acc = 1000 // rank error <= n/acc, i.e. quantile error <= 1/acc
    val delta = 1.0 / acc
    val r = lineitem.agg(
      expr(s"percentile(l_quantity, ${0.5 - delta})").as("lo"),
      expr(s"percentile_approx(l_quantity, 0.5, $acc)").as("approx"),
      expr(s"percentile(l_quantity, ${0.5 + delta})").as("hi")).head()
    val lo = r.getDouble(0)
    val approx = r.getAs[Number](1).doubleValue()
    val hi = r.getDouble(2)
    assert(lo <= approx && approx <= hi,
      s"approx median $approx outside exact-quantile bracket [$lo, $hi]")
  }

  test("approx plan keeps the partial->final aggregate shape") {
    // the whole point of the switch: the sketch travels as a partial
    // aggregate (objHashAggregate), so the shuffle carries one sketch
    // per partition instead of every distinct key
    val p = lineitem
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")))
      .queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), "expected hash aggregate")
    assert(p.toLowerCase.contains("partial_approx_count_distinct"),
      "sketch must partial-aggregate map-side before the exchange")
  }
}
