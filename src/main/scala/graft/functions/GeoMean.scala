package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (the pandas `agg(func)` UDF surface,
  * SURVEY.md §2.11): geometric mean as an `Aggregator[IN, BUF, OUT]`
  * registered through `functions.udaf`.
  *
  * The buffer is (sum of logs, count) — associative and commutative,
  * so Spark runs it with map-side partial aggregation exactly like a
  * built-in; at 100 TB it shuffles one (double, long) pair per group
  * per partition. (pandas runs per-group Python lambdas instead —
  * `_agg_py_fallback`, groupby.py:1502.)
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    (b._1 + math.log(x), b._2 + 1)
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Double, Long)): Double = math.exp(r._1 / r._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
