package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exponentially weighted moving aggregates (pandas
  * `window/ewm.py:127` ExponentialMovingWindow; kernels
  * `_libs/window/aggregations.pyx:2044`).
  *
  * EWM is a linear recursion (y_t depends on y_{t-1}) — the one pandas
  * window family with no Spark window-function equivalent. The
  * Spark-first design distributes by group key and runs the O(n)
  * recursion per group over a sorted iterator:
  *
  *   - `groupByKey(key)` co-partitions each entity's rows (one shuffle,
  *     the same exchange any per-key window needs);
  *   - `flatMapGroups` sorts the group in memory and folds the
  *     recursion — state is two doubles, never materialized globally.
  *
  * At 100 TB this scales with group count; a single group's rows must
  * fit an executor (same constraint pandas-on-a-node has for the whole
  * series). For unbounded single streams, the Structured Streaming
  * variant with `flatMapGroupsWithState` carries (num, den) across
  * micro-batches (see graft.streaming).
  *
  * Semantics (pandas ewm docstring): with a = alpha,
  *   adjust=true:  y_t = sum_{i<=t}(1-a)^{t-i} x_i / sum_{i<=t}(1-a)^{t-i}
  *   adjust=false: y_0 = x_0; y_t = (1-a) y_{t-1} + a x_t
  * Nulls propagate pandas-style: they produce no state update
  * (ignore_na=false position weighting is preserved by decaying on
  * every row).
  */
object Ewm {

  /** EWM mean of `valueCol` per `keyCol`, ordered by `orderCol` (must
    * be unique within key). Returns (key, order, value, ewm_adj,
    * ewm_noadj) rows.
    */
  def ewmMean(
      spark: SparkSession,
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      alpha: Double): DataFrame = {
    import spark.implicits._
    df.select(
        col(keyCol).cast("long"),
        unix_micros(col(orderCol)),
        col(valueCol).cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val rows = it.toArray.sortBy(_._2)
        val out = new Array[(Long, Long, Double, Double, Double, Option[Double])](rows.length)
        var num = 0.0; var den = 0.0   // adjust=true mean state
        var num2 = 0.0; var sw2 = 0.0  // variance state (sum w*x^2, sum w^2)
        var yNoAdj = Double.NaN        // adjust=false state
        var i = 0
        while (i < rows.length) {
          val (_, ord, x) = rows(i)
          num = (1 - alpha) * num + x
          den = (1 - alpha) * den + 1.0
          num2 = (1 - alpha) * num2 + x * x
          sw2 = ((1 - alpha) * (1 - alpha)) * sw2 + 1.0
          yNoAdj = if (i == 0) x else (1 - alpha) * yNoAdj + alpha * x
          // unbiased EWM variance (ewmcov aggregations.pyx:2143):
          // biased second moment scaled by den^2 / (den^2 - sw2)
          val ewmVar =
            if (den * den - sw2 > 0)
              Some((num2 / den - (num / den) * (num / den)) *
                ((den * den) / (den * den - sw2)))
            else None
          out(i) = (key, ord, x, num / den, yNoAdj, ewmVar)
          i += 1
        }
        out.iterator
      }
      .toDF(keyCol, "ord_micros", valueCol, "ewm_adj", "ewm_noadj", "ewm_var")
      .withColumn(orderCol, timestamp_micros(col("ord_micros")))
      .drop("ord_micros")
      .select(keyCol, orderCol, valueCol, "ewm_adj", "ewm_noadj", "ewm_var")
  }
}
