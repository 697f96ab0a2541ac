package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exponentially weighted moving aggregates (pandas
  * `window/ewm.py:127` ExponentialMovingWindow; kernels
  * `_libs/window/aggregations.pyx:2044` ewm / `:2143` ewmcov).
  *
  * EWM is a linear recursion (y_t depends on y_{t-1}) — the one pandas
  * window family with no Spark window-function equivalent. The
  * Spark-first design distributes by group key and runs the O(n)
  * recursion per group over a sorted iterator:
  *
  *   - `groupByKey(key)` co-partitions each entity's rows (one shuffle,
  *     the same exchange any per-key window needs);
  *   - `flatMapGroups` sorts the group in memory and folds the
  *     recursion — state is a handful of doubles, never materialized
  *     globally.
  *
  * At 100 TB this scales with group count; a single group's rows must
  * fit an executor (same constraint pandas-on-a-node has for the whole
  * series). For unbounded single streams, the Structured Streaming
  * variant with `flatMapGroupsWithState` carries (num, den) across
  * micro-batches (see graft.streaming).
  *
  * Null semantics (pandas ewm docstring, aggregations.pyx ewm kernel):
  * a missing value emits the carried-forward statistic; with
  * ignore_na=false (default) it still decays the accumulated weights by
  * one step (absolute-position weighting), with ignore_na=true it
  * leaves state untouched (relative-position weighting). Missing keys
  * or order values are rejected with a clear error, matching pandas
  * which disallows NaN in the grouping/ordering of a window op.
  */
object Ewm {

  /** alpha from the pandas smoothing parameterizations (ewm.py:127):
    * span >= 1, com >= 0, halflife > 0. */
  def alphaFromSpan(span: Double): Double = 2.0 / (span + 1.0)
  def alphaFromCom(com: Double): Double = 1.0 / (1.0 + com)
  def alphaFromHalflife(halflife: Double): Double =
    1.0 - math.exp(-math.log(2.0) / halflife)

  /** Per-group EWM mean/variance recursion (aggregations.pyx:2044
    * kernel state), shared verbatim by the shuffle path (`ewmMean`'s
    * flatMapGroups) and the zero-shuffle sorted-run path
    * (`ewmMeanSortedRuns`) so the two can never drift numerically. */
  private final class MeanState(alpha: Double, ignoreNa: Boolean) {
    private val decay = 1 - alpha
    private var num = 0.0; private var den = 0.0   // adjust=true mean
    private var num2 = 0.0; private var sw2 = 0.0  // variance (Σw·x², Σw²)
    private var yNoAdj = Double.NaN                // adjust=false state
    private var wNoAdj = 1.0                       // carried weight across gaps

    def reset(): Unit = {
      num = 0.0; den = 0.0; num2 = 0.0; sw2 = 0.0
      yNoAdj = Double.NaN; wNoAdj = 1.0
    }

    /** advance one row; returns (ewm_adj, ewm_noadj, ewm_var) */
    def step(vOpt: Option[Double]): (Option[Double], Option[Double], Option[Double]) = {
      vOpt match {
        case Some(x) =>
          num = decay * num + x
          den = decay * den + 1.0
          num2 = decay * num2 + x * x
          sw2 = (decay * decay) * sw2 + 1.0
          if (yNoAdj.isNaN) { yNoAdj = x; wNoAdj = 1.0 }
          else {
            val wd = wNoAdj * decay
            yNoAdj = (wd * yNoAdj + alpha * x) / (wd + alpha)
            wNoAdj = 1.0
          }
        case None if !ignoreNa =>
          // absolute-position weighting: one decay step, no value
          num = decay * num; den = decay * den
          num2 = decay * num2; sw2 = (decay * decay) * sw2
          wNoAdj = wNoAdj * decay
        case None => () // ignore_na=true: state untouched
      }
      val ewmVar =
        if (den > 0 && den * den - sw2 > 0)
          Some((num2 / den - (num / den) * (num / den)) *
            ((den * den) / (den * den - sw2)))
        else None
      (if (den > 0) Some(num / den) else None,
       if (yNoAdj.isNaN) None else Some(yNoAdj),
       ewmVar)
    }
  }

  /** EWM mean + unbiased variance of `valueCol` per `keyCol`, ordered
    * by `orderCol` (must be non-null and unique within key; null keys/
    * order values fail fast). Null values follow pandas semantics for
    * the given `ignoreNa`. Returns (key, order, value, ewm_adj,
    * ewm_noadj, ewm_var) rows — one per input row, carried-forward on
    * missing input.
    */
  def ewmMean(
      spark: SparkSession,
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      alpha: Double,
      ignoreNa: Boolean = false): DataFrame = {
    import spark.implicits._
    df.select(
        col(keyCol).cast("long").as("k"),
        unix_micros(col(orderCol)).as("o"),
        col(valueCol).cast("double").as("v"))
      .as[(Option[Long], Option[Long], Option[Double])]
      // null checks live in the key function / sort key: no extra
      // Serialize/Deserialize object stage before the groupByKey
      .groupByKey(_._1.getOrElse(throw new IllegalArgumentException(
        s"Ewm: null key in '$keyCol' — pandas rejects NaN group keys")))
      .flatMapGroups { (key, it) =>
        val rows = it.toArray.sortBy(_._2.getOrElse(
          throw new IllegalArgumentException(
            s"Ewm: null/invalid order in '$orderCol'")))
        val st = new MeanState(alpha, ignoreNa)
        rows.iterator.map { case (_, ordOpt, vOpt) =>
          val (adj, noadj, v2) = st.step(vOpt)
          (key, ordOpt.get, vOpt, adj, noadj, v2)
        }
      }
      .toDF(keyCol, "ord_micros", valueCol, "ewm_adj", "ewm_noadj", "ewm_var")
      .withColumn(orderCol, timestamp_micros(col("ord_micros")))
      .drop("ord_micros")
      .select(keyCol, orderCol, valueCol, "ewm_adj", "ewm_noadj", "ewm_var")
  }

  /** EWM mean over a frame ALREADY clustered by key and sorted by
    * (key, order) within each partition — a `BucketedLayout` read.
    * Zero shuffle, zero sort: one streaming pass per partition with
    * O(1) state; group boundaries are key changes. The required
    * lexicographic (key, order) run layout is asserted per row — a
    * regression in either column fails loudly instead of silently
    * folding rows into the wrong group's recursion. Same `MeanState`
    * kernel as `ewmMean`, so the two paths are numerically identical.
    */
  def ewmMeanSortedRuns(
      spark: SparkSession,
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      alpha: Double,
      ignoreNa: Boolean = false): DataFrame = {
    import spark.implicits._
    df.select(
        col(keyCol).cast("long").as("k"),
        unix_micros(col(orderCol)).as("o"),
        col(valueCol).cast("double").as("v"))
      .as[(Option[Long], Option[Long], Option[Double])]
      .mapPartitions { it =>
        val st = new MeanState(alpha, ignoreNa)
        var started = false
        var curKey = 0L
        var lastOrd = 0L
        it.map { case (kOpt, oOpt, vOpt) =>
          val k = kOpt.getOrElse(throw new IllegalArgumentException(
            s"Ewm: null key in '$keyCol' — pandas rejects NaN group keys"))
          val o = oOpt.getOrElse(throw new IllegalArgumentException(
            s"Ewm: null/invalid order in '$orderCol'"))
          if (!started) { started = true; curKey = k; lastOrd = o }
          else if (k == curKey) {
            require(o >= lastOrd,
              s"Ewm sorted-run: order regression within key $k — " +
                "input is not (key, order)-sorted; use ewmMean")
            lastOrd = o
          } else {
            require(k > curKey,
              s"Ewm sorted-run: key regression $curKey -> $k — " +
                "input is not clustered-sorted by key; use ewmMean")
            curKey = k; lastOrd = o; st.reset()
          }
          val (adj, noadj, v2) = st.step(vOpt)
          (k, o, vOpt, adj, noadj, v2)
        }
      }
      .toDF(keyCol, "ord_micros", valueCol, "ewm_adj", "ewm_noadj", "ewm_var")
      .withColumn(orderCol, timestamp_micros(col("ord_micros")))
      .drop("ord_micros")
      .select(keyCol, orderCol, valueCol, "ewm_adj", "ewm_noadj", "ewm_var")
  }

  /** EWM sum (pandas 1.4+ `ExponentialMovingWindow.sum`, window/ewm.py
    * family; kernel shares aggregations.pyx:2044's recursion without
    * the weight normalization): s_t = (1-alpha)*s_{t-1} + x_t. pandas
    * only defines sum for adjust=True — with adjust=False the
    * normalized recursion has no sum analogue — so no adjust knob here.
    * Missing values follow the same ignore_na split as ewmMean: a gap
    * decays the sum one step (ignore_na=false) or leaves it untouched.
    * Leading nulls emit null (no state yet).
    */
  def ewmSum(
      spark: SparkSession,
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      alpha: Double,
      ignoreNa: Boolean = false): DataFrame = {
    import spark.implicits._
    val decay = 1 - alpha
    df.select(
        col(keyCol).cast("long").as("k"),
        unix_micros(col(orderCol)).as("o"),
        col(valueCol).cast("double").as("v"))
      .as[(Option[Long], Option[Long], Option[Double])]
      // null checks live in the key function / sort key: no extra
      // Serialize/Deserialize object stage before the groupByKey
      .groupByKey(_._1.getOrElse(throw new IllegalArgumentException(
        s"Ewm: null key in '$keyCol' — pandas rejects NaN group keys")))
      .flatMapGroups { (key, it) =>
        val rows = it.toArray.sortBy(_._2.getOrElse(
          throw new IllegalArgumentException(
            s"Ewm: null/invalid order in '$orderCol'")))
        var s = 0.0
        var started = false
        rows.iterator.map { case (_, ordOpt, vOpt) =>
          val ord = ordOpt.get
          vOpt match {
            case Some(x) =>
              s = decay * s + x
              started = true
            case None if !ignoreNa && started =>
              s = decay * s
            case None => ()
          }
          (key, ord, vOpt, if (started) Some(s) else None)
        }
      }
      .toDF(keyCol, "ord_micros", valueCol, "ewm_sum")
      .withColumn(orderCol, timestamp_micros(col("ord_micros")))
      .drop("ord_micros")
      .select(keyCol, orderCol, valueCol, "ewm_sum")
  }

  /** EWM covariance (bias=False) + correlation of (`xCol`, `yCol`) per
    * `keyCol` (ewmcov aggregations.pyx:2143; cov/corr ewm.py:127).
    * A pair is an observation only when BOTH values are present.
    * `adjust` selects the pandas weight scheme: true → new weight 1,
    * false → new weight alpha with the first observation keeping
    * weight 1. Returns (key, order, x, y, ewm_cov, ewm_corr).
    */
  def ewmCov(
      spark: SparkSession,
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      xCol: String,
      yCol: String,
      alpha: Double,
      adjust: Boolean = true,
      ignoreNa: Boolean = false): DataFrame = {
    import spark.implicits._
    val decay = 1 - alpha
    df.select(
        col(keyCol).cast("long").as("k"),
        unix_micros(col(orderCol)).as("o"),
        col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y"))
      .as[(Option[Long], Option[Long], Option[Double], Option[Double])]
      .groupByKey(_._1.getOrElse(throw new IllegalArgumentException(
        s"Ewm: null key in '$keyCol' — pandas rejects NaN group keys")))
      .flatMapGroups { (key, it) =>
        val rows = it.toArray.sortBy(_._2.getOrElse(
          throw new IllegalArgumentException(
            s"Ewm: null/invalid order in '$orderCol'")))
        var numx = 0.0; var numy = 0.0; var numxy = 0.0
        var numx2 = 0.0; var numy2 = 0.0
        var den = 0.0; var sw2 = 0.0
        var started = false
        rows.iterator.map { case (_, ordOpt, xOpt, yOpt) =>
          val ord = ordOpt.get
          (xOpt, yOpt) match {
            case (Some(x), Some(y)) =>
              // first observation always has weight 1; later ones get
              // the scheme's new weight (1 for adjust, alpha otherwise)
              val nw = if (!started || adjust) 1.0 else alpha
              numx = decay * numx + nw * x
              numy = decay * numy + nw * y
              numxy = decay * numxy + nw * (x * y)
              numx2 = decay * numx2 + nw * (x * x)
              numy2 = decay * numy2 + nw * (y * y)
              den = decay * den + nw
              sw2 = (decay * decay) * sw2 + nw * nw
              started = true
            case _ if !ignoreNa && started =>
              numx = decay * numx; numy = decay * numy; numxy = decay * numxy
              numx2 = decay * numx2; numy2 = decay * numy2
              den = decay * den; sw2 = (decay * decay) * sw2
            case _ => ()
          }
          val (cov, corr) =
            if (den > 0) {
              val mx = numx / den; val my = numy / den
              val cxy = numxy / den - mx * my
              val m2x = numx2 / den - mx * mx
              val m2y = numy2 / den - my * my
              (if (den * den - sw2 > 0)
                 Some(cxy * ((den * den) / (den * den - sw2)))
               else None,
               if (m2x > 0 && m2y > 0) Some(cxy / math.sqrt(m2x * m2y))
               else None)
            } else (None, None)
          (key, ord, xOpt, yOpt, cov, corr)
        }
      }
      .toDF(keyCol, "ord_micros", xCol, yCol, "ewm_cov", "ewm_corr")
      .withColumn(orderCol, timestamp_micros(col("ord_micros")))
      .drop("ord_micros")
      .select(keyCol, orderCol, xCol, yCol, "ewm_cov", "ewm_corr")
  }

  /** EWM mean over IRREGULARLY-SPACED observations (pandas ewm.py:127
    * `times=` parameter with `halflife` given as a timedelta; pandas
    * restricts this form to `mean()` with adjust=True). The decay
    * applied between consecutive observations is 2^(-Δt/halflife), so
    * an observation's weight depends on wall-clock age rather than row
    * position — the financially common time-decay form.
    *
    * Null values contribute no weight; because time-decay is
    * multiplicative over Δt, skipping a null row and decaying across
    * the combined gap at the next observation is exact, so pandas'
    * ignore_na distinction collapses for this form.
    *
    * Same distribution shape as [[ewmMean]]: one shuffle by key, O(n)
    * fold per group, state = two doubles + a timestamp.
    */
  def ewmMeanTimes(
      spark: SparkSession,
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valueCol: String,
      halflifeSeconds: Double): DataFrame = {
    import spark.implicits._
    df.select(
        col(keyCol).cast("long").as("k"),
        unix_micros(col(timeCol)).as("o"),
        col(valueCol).cast("double").as("v"))
      .as[(Option[Long], Option[Long], Option[Double])]
      .groupByKey(_._1.getOrElse(throw new IllegalArgumentException(
        s"Ewm: null key in '$keyCol' — pandas rejects NaN group keys")))
      .flatMapGroups { (key, it) =>
        val rows = it.toArray.sortBy(_._2.getOrElse(
          throw new IllegalArgumentException(
            s"Ewm: null/invalid time in '$timeCol'")))
        var num = 0.0; var den = 0.0
        var lastObs = Long.MinValue
        rows.iterator.map { case (_, ordOpt, vOpt) =>
          val t = ordOpt.get
          vOpt.foreach { x =>
            val d =
              if (lastObs == Long.MinValue) 1.0
              else math.pow(2.0, -((t - lastObs) / 1e6) / halflifeSeconds)
            num = d * num + x
            den = d * den + 1.0
            lastObs = t
          }
          (key, t, vOpt, if (den > 0) Some(num / den) else None)
        }
      }
      .toDF(keyCol, "ord_micros", valueCol, "ewm_tmean")
      .withColumn(timeCol, timestamp_micros(col("ord_micros")))
      .drop("ord_micros")
      .select(keyCol, timeCol, valueCol, "ewm_tmean")
  }
}
