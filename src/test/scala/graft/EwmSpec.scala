package graft

import graft.functions.Ewm
import org.apache.spark.sql.functions._

/** EWM semantics against hand-computed pandas values
  * (window/ewm.py docstring formulas).
  */
class EwmSpec extends SparkSpec {

  test("ewm mean matches pandas adjust=True and adjust=False") {
    import spark.implicits._
    val df = Seq(
      (1L, 1000L, 1.0), (1L, 2000L, 2.0), (1L, 3000L, 3.0),
      (2L, 1000L, 10.0))
      .toDF("k", "tsm", "x")
      .withColumn("ts", timestamp_micros($"tsm")).drop("tsm")

    val out = Ewm.ewmMean(spark, df, "k", "ts", "x", alpha = 0.5)
      .orderBy($"k", $"ts")
      .select($"k", $"ewm_adj", $"ewm_noadj")
      .as[(Long, Double, Double)]
      .collect()

    // alpha=0.5, x=[1,2,3]:
    // adjust=True:  1, (2+0.5)/1.5=1.666..., (3+1+0.25)/1.75=2.428571...
    // adjust=False: 1, 1.5, 2.25
    val eps = 1e-9
    assert(math.abs(out(0)._2 - 1.0) < eps)
    assert(math.abs(out(1)._2 - 5.0 / 3.0) < eps)
    assert(math.abs(out(2)._2 - 4.25 / 1.75) < eps)
    assert(math.abs(out(0)._3 - 1.0) < eps)
    assert(math.abs(out(1)._3 - 1.5) < eps)
    assert(math.abs(out(2)._3 - 2.25) < eps)
    // single-element group
    assert(out(3)._1 == 2L && math.abs(out(3)._2 - 10.0) < eps)
  }
}
