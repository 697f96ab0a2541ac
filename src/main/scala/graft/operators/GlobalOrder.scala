package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalable global ordinals (the `__order__` discipline of SURVEY §7.1
  * for operations that need a *total* order: iloc slices, factorize
  * codes, qcut bucket boundaries).
  *
  * A plain `row_number() over (orderBy ...)` collapses to a single
  * partition (WindowExec warns, and at 100 TB it simply doesn't run).
  * The distributed equivalent is the classic two-pass zip, expressed
  * here ENTIRELY in the DataFrame algebra (the round-2 version dropped
  * to `df.rdd.zipWithIndex`, leaving Tungsten and paying an
  * InternalRow→Row deserialization of every row — SCALE.md round-3
  * target):
  *
  *   1. a bounds pass collects ≤ n-1 approximate quantiles of the
  *      leading sort key (bounded driver state — the same footprint as
  *      RangePartitioner's sampled bounds, which this replaces);
  *   2. bucket id = a DETERMINISTIC literal-fold expression over those
  *      bounds. Determinism is the load-bearing property:
  *      `repartitionByRange` samples its bounds with an
  *      execution-seeded RNG, so two plan branches over the same input
  *      can land rows in DIFFERENT partitions — an offsets branch
  *      computed against one layout silently misaligns with a data
  *      branch computed against another (caught by GlobalOrderSpec's
  *      nested-call test; exchange reuse does NOT save you, because
  *      column pruning canonicalizes the two exchange subtrees
  *      differently). Literal bounds make every branch agree by
  *      construction;
  *   3. ONE hash exchange on the bucket id; `row_number() over
  *      (partition by bucket order by sortCols)` — the exchange
  *      satisfies the window's distribution, so no second shuffle and
  *      no partition-less window;
  *   4. bucket row counts = a tiny aggregate; bucket start offsets = a
  *      triangular self-join prefix sum over those ≤ n rows
  *      (no partition-less window — PlanHygieneSpec forbids those);
  *   5. ordinal = broadcast-joined bucket offset + in-bucket counter.
  *
  * Everything stays whole-stage-codegen except the exchanges. Ties on
  * the leading key all land in one bucket (exactly RangePartitioner's
  * behavior for a single-key sort), so heavy skew on ONE value
  * degrades to that bucket's window — the same degradation a range
  * exchange has. Non-numeric leading keys (no percentile_approx
  * support) fall back to the rdd zip, which shares lineage between its
  * count job and data job and is therefore also consistent.
  *
  * With a total order (sort keys + tiebreaks unique) the assigned
  * ordinal is exactly `row_number() - 1`, so correctness oracles are
  * unchanged — only the physical plan differs.
  */
object GlobalOrder {

  private def quantileSupported(dt: DataType): Boolean = dt match {
    case _: NumericType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Round-15 (guide §2, partitioning-follows-data): rows per bucket
    * below which the whole input collapses to ONE bucket. The bounds
    * probe now returns the row count in the same action, so a tiny
    * input (e.g. a 150-row group histogram from
    * DistributedPercentile.exactGrouped) no longer fans every stage
    * of the ordinal machinery into `spark.sql.shuffle.partitions`
    * near-empty tasks — at a cluster's thousands of partitions that
    * is thousands of no-op tasks per query. Inputs above the target
    * keep today's bucket count unchanged at every scale; bucket
    * layout never affects the computed values (bounds only balance
    * buckets — GlobalOrderSpec pins the ordinals). */
  private val OneBucketRows: Long =
    sys.env.getOrElse("SPARK_GRAFT_ORDINAL_ONE_BUCKET_ROWS", "16384").toLong

  /** df + `ordinalCol` (0-based long) following `sortCols` order. */
  def zipOrdinal(df: DataFrame, sortCols: Seq[Column], ordinalCol: String = "__ord"): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val lead = sortCols.head
    val leadType = df.select(lead.as("__go_k")).schema.head.dataType
    if (!quantileSupported(leadType)) return zipOrdinalRdd(df, sortCols, ordinalCol)

    // pass 1: ≤ n-1 bucket bounds (approximate is fine — bounds only
    // balance buckets, never affect the ordinal values) + the row
    // count in the SAME action for the one-bucket collapse
    val probs = array((1 until n).map(i => lit(i.toDouble / n)): _*)
    val row1 = df
      .select(percentile_approx(lead.cast("double"), probs, lit(10000)).as("q"),
        count(lit(1)).as("__go_n"))
      .head()
    val rows = row1.getLong(1)
    val bounds: Seq[Any] =
      if (rows <= OneBucketRows) Seq.empty
      else row1.getSeq[Any](0) match {
        case null => Seq.empty
        case qs => qs.distinct.filter(_ != null)
      }

    // deterministic bucket id: count of bounds strictly below the key;
    // NULL keys bucket to 0 = Spark's nulls-first ascending order.
    // Binary search over the literal bounds (functions/SearchSorted),
    // NOT a when-chain fold: at 256 partitions the 255-node fold fell
    // off the fast codegen path and cost 60 s on a 15M-row ordinal
    // (31 min on the sf100 qcut) — the generated Arrays.binarySearch
    // call is O(log n) per row and stays inside whole-stage codegen
    val pidExpr = graft.functions.SearchSorted.bucketOf(
      lead.cast("double"), bounds.map(_.asInstanceOf[Double]),
      inclusive = false)

    // empty bounds = constant pid: today that already lands every row
    // in one partition OF n — shrink the exchange to 1 so the other
    // n−1 tasks don't exist at all
    val nPart = if (bounds.isEmpty) 1 else n
    val base = df.withColumn("__go_pid", pidExpr)
      .repartition(nPart, col("__go_pid"))
    val w = Window.partitionBy(col("__go_pid")).orderBy(sortCols: _*)
    val withCtr = base.withColumn("__go_ctr", row_number().over(w).cast("long") - 1L)
    val counts = base.groupBy(col("__go_pid")).agg(count(lit(1)).as("__go_cnt"))
    // prefix sum over ≤ n tiny rows; empty buckets contribute nothing
    // to either side, so offsets stay contiguous
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.__go_pid") < col("a.__go_pid"), "left")
      .groupBy(col("a.__go_pid").as("__go_pid"))
      .agg(coalesce(sum(col("b.__go_cnt")), lit(0L)).as("__go_off"))
    withCtr.join(broadcast(offsets), Seq("__go_pid"))
      .withColumn(ordinalCol, col("__go_off") + col("__go_ctr"))
      .drop("__go_pid", "__go_ctr", "__go_off")
  }

  /** Scalable weighted EXCLUSIVE prefix sum (round-15): adds `outCol`
    * = Σ weight over rows whose `key` sorts strictly below this row's,
    * optionally within `partKeys` groups. The building block for
    * rank-from-histogram statistics (agg_spearman*): given a DISTINCT
    * (key → weight=count) histogram, `outCol` is the count of original
    * rows below the key, from which pandas' average rank is
    * `below + (cnt+1)/2` with no row-level global window.
    *
    * Same machinery as [[zipOrdinal]], weight-generalized:
    *   1. ≤ n−1 approximate quantile bounds of `key` (bounded driver
    *      state), deterministic literal-fold bucket id;
    *   2. ONE hash exchange on (partKeys, bucket); in-bucket exclusive
    *      running sum via a PARTITIONED window (rows preceding);
    *   3. per-(partKeys, bucket) totals + a triangular prefix-sum join
    *      over ≤ n tiny rows per group, broadcast back.
    *
    * Requires key values DISTINCT within each partKeys group (it is a
    * histogram operator — ties would double-count); callers own that
    * invariant. Unlike a single-partition window, heavy skew on one
    * key value cannot concentrate rows: distinct keys spread over
    * buckets by value.
    */
  def prefixSum(df: DataFrame, partKeys: Seq[String], keyCol: String,
                weightCol: String, outCol: String): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val pk = partKeys.map(col)
    val probs = array((1 until n).map(i => lit(i.toDouble / n)): _*)
    val row1 = df
      .select(percentile_approx(col(keyCol).cast("double"), probs, lit(10000)).as("q"),
        count(lit(1)).as("__ps_n"))
      .head()
    // histogram small enough for one bucket → skip the bucket split
    // entirely (see OneBucketRows); the partition-by-group window
    // still bounds per-task state by the largest GROUP's histogram
    val bounds: Seq[Any] =
      if (row1.getLong(1) <= OneBucketRows) Seq.empty
      else row1.getSeq[Any](0) match {
        case null => Seq.empty
        case qs => qs.distinct.filter(_ != null)
      }
    val pidExpr = graft.functions.SearchSorted.bucketOf(
      col(keyCol).cast("double"), bounds.map(_.asInstanceOf[Double]),
      inclusive = false)
    val nPart = if (bounds.isEmpty) 1 else n
    val base = df.withColumn("__ps_pid", pidExpr)
      .repartition(nPart, pk :+ col("__ps_pid"): _*)
    val w = Window.partitionBy(pk :+ col("__ps_pid"): _*)
      .orderBy(col(keyCol)).rowsBetween(Window.unboundedPreceding, -1)
    val withCtr = base.withColumn("__ps_ctr",
      coalesce(sum(col(weightCol)).over(w), lit(0L)))
    // per-(group, bucket) totals; triangular prefix over ≤ n tiny rows
    // per group (empty buckets contribute nothing to either side)
    val counts = base.groupBy(pk :+ col("__ps_pid"): _*)
      .agg(sum(col(weightCol)).as("__ps_cnt"))
    val cond = partKeys.map(k => col(s"a.$k") <=> col(s"b.$k"))
      .foldLeft(col("b.__ps_pid") < col("a.__ps_pid"))(_ && _)
    val offsets = counts.as("a")
      .join(counts.as("b"), cond, "left")
      .groupBy(partKeys.map(k => col(s"a.$k")) :+ col("a.__ps_pid"): _*)
      .agg(coalesce(sum(col("b.__ps_cnt")), lit(0L)).as("__ps_off"))
      .toDF(partKeys ++ Seq("__ps_pid", "__ps_off"): _*)
    withCtr.join(broadcast(offsets), partKeys :+ "__ps_pid")
      .withColumn(outCol, col("__ps_off") + col("__ps_ctr"))
      .drop("__ps_pid", "__ps_ctr", "__ps_off")
  }

  /** Lineage-shared rdd zip: the zipWithIndex count job and the data
    * job run over the SAME shuffled RDD, so the layout is consistent
    * by construction. Non-columnar — kept as the fallback for sort
    * keys percentile_approx can't bucket. */
  private def zipOrdinalRdd(df: DataFrame, sortCols: Seq[Column], ordinalCol: String): DataFrame = {
    val spark = df.sparkSession
    val arranged = df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
    val schema = StructType(arranged.schema.fields :+ StructField(ordinalCol, LongType, nullable = false))
    val zipped = arranged.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ idx)
    }
    spark.createDataFrame(zipped, schema)
  }
}
