package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join (pandas `merge_asof`, reference
  * `core/reshape/merge.py:644` `_AsOfMerge` and the Cython pointer-walk
  * kernels at `_libs/join.pyx:725-900`).
  *
  * Spark has no built-in as-of join, and the reference's algorithm
  * (sorted two-pointer walk with a per-`by` last-seen table) is a
  * single-node design. The Spark-first rewrite is UNION + running
  * `last(_, ignoreNulls)` over a window partitioned by the `by` keys
  * and ordered by the timestamp:
  *
  *   - both sides are tagged and unioned on a common schema;
  *   - one shuffle co-partitions by the `by` keys (same exchange a
  *     sort-merge join would need), the in-partition sort orders by
  *     (ts, side) so that at equal timestamps the right row precedes
  *     the left row (pandas `allow_exact_matches=True`);
  *   - `last(value, ignoreNulls) over rowsBetween(-inf, 0)` carries the
  *     latest right-side value to every left row — a single pass, no
  *     per-row probe, no driver state.
  *
  * At 100 TB this scales with the `by`-key cardinality exactly like a
  * shuffled join; there is no broadcast, no collect, and AQE can split
  * skewed user keys. A global as-of (empty `by`) degenerates to a
  * single-partition sort — callers should prefer a `by` key, or a
  * range-partitioned two-pass variant (future custom SparkStrategy,
  * SURVEY.md §4).
  */
object AsofJoin {

  /** Backward as-of join: for each left row, the latest right row with
    * `right.tsCol <= left.tsCol` and equal `by` keys.
    *
    * @param valueCols right-side columns carried to the output
    * @param toleranceMicros optional max age of the matched right row
    *        (`pandas tolerance=`): matches older than this become NULL
    * @return left rows + `valueCols` (+ `__asof_ts` of the match)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      toleranceMicros: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(
        (by.map(col) :+ col("__ts") :+ col("__side")) ++
          leftCols.filterNot(by.contains).map(col) ++
          valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rTagged = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(
        (by.map(col) :+ col("__ts") :+ col("__side")) ++
          leftCols.filterNot(by.contains)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          valueCols.map(col): _*)

    val w = Window
      .partitionBy(by.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matchTs = last(when(col("__side") === 0, col("__ts")), ignoreNulls = true).over(w)
    val filled = valueCols.foldLeft(lTagged.unionByName(rTagged)) { (df, c) =>
      df.withColumn(s"__asof_$c", last(when(col("__side") === 0, col(c)), ignoreNulls = true).over(w))
    }.withColumn("__asof_ts", matchTs)

    val withTol = toleranceMicros match {
      case Some(tol) =>
        valueCols.foldLeft(filled) { (df, c) =>
          df.withColumn(s"__asof_$c",
            when(unix_micros(col("__ts")) - unix_micros(col("__asof_ts")) <= tol, col(s"__asof_$c")))
        }
      case None => filled
    }

    withTol
      .filter(col("__side") === 1)
      .select(
        (leftCols.map(col) ++
          valueCols.map(c => col(s"__asof_$c").as(c))): _*)
  }
}
