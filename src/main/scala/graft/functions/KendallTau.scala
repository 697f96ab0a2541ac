package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions.col
import scala.collection.mutable.ArrayBuffer

/** Kendall tau-b via Knight's O(n log n) algorithm (W. R. Knight,
  * JASA 1966). The pandas kernel (`_libs/algos.pyx:1988`
  * nancorr_kendall) is O(n^2); this replaces the engine's previous
  * bounded O(n^2) self-join so the statistic runs on full tables.
  *
  * Shape: a typed `Aggregator` — executors reduce (x, y) pairs into
  * per-task buffers that merge by concatenation; the single finish
  * pass sorts once by (x, y), takes tie-run counts, and counts
  * discordant pairs as strict inversions of the y-sequence with an
  * iterative bottom-up merge sort. Work is O(n log n) time / O(n)
  * space in ONE reduce task (two doubles per row — 10^8 rows ≈ 1.6 GB,
  * comfortably inside an executor). Exact global tau fundamentally
  * needs all pairs related through one ordering, so at 100 TB the
  * recommended forms are per-group tau (partitioned) or tau on a
  * uniform sample; both compose from this same Aggregator.
  *
  * Identities used (C = concordant, D = discordant, n0 = n(n-1)/2,
  * n1/n2 = pairs tied in x / in y, n3 = pairs tied in both):
  *   D  = strict y-inversions after sorting by (x, y)
  *   C - D = n0 - n1 - n2 + n3 - 2 D
  *   tau_b = (C - D) / (sqrt(n0 - n2) * sqrt(n0 - n1))
  * The final expression mirrors the SQL oracle's operation order so
  * the rounded doubles agree bit-for-bit.
  */
class KendallTauAgg(maxRows: Long)
    extends Aggregator[(Double, Double), ArrayBuffer[(Double, Double)], Double] {

  private def guard(size: Long): Unit =
    if (size > maxRows)
      throw new IllegalArgumentException(
        s"KendallTau: exact global tau needs a single total order over all" +
        s" pairs; above $maxRows rows use KendallTau.grouped (per-group tau," +
        s" partition-parallel) or KendallTau.sampled (tau on a uniform sample)")

  def zero: ArrayBuffer[(Double, Double)] = ArrayBuffer.empty

  def reduce(b: ArrayBuffer[(Double, Double)], a: (Double, Double)): ArrayBuffer[(Double, Double)] = {
    guard(b.length + 1L)
    b += a; b
  }

  def merge(b1: ArrayBuffer[(Double, Double)], b2: ArrayBuffer[(Double, Double)]): ArrayBuffer[(Double, Double)] = {
    guard(b1.length.toLong + b2.length)
    b1 ++= b2; b1
  }

  def finish(buf: ArrayBuffer[(Double, Double)]): Double = {
    val n = buf.length
    if (n < 2) return Double.NaN
    val arr = buf.toArray
    java.util.Arrays.sort(arr, (p: (Double, Double), q: (Double, Double)) => {
      val c = java.lang.Double.compare(p._1, q._1)
      if (c != 0) c else java.lang.Double.compare(p._2, q._2)
    })
    val n0 = n.toLong * (n - 1) / 2

    // tie runs in x (n1) and joint (x, y) runs (n3)
    var n1 = 0L; var n3 = 0L
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && arr(j)._1 == arr(i)._1) j += 1
      val run = (j - i).toLong
      n1 += run * (run - 1) / 2
      var k = i
      while (k < j) {
        var m = k + 1
        while (m < j && arr(m)._2 == arr(k)._2) m += 1
        val r2 = (m - k).toLong
        n3 += r2 * (r2 - 1) / 2
        k = m
      }
      i = j
    }

    // discordant pairs = strict inversions of y in (x, y) order;
    // bottom-up merge sort, equal elements drawn from the left so ties
    // are never counted
    val ys = arr.map(_._2)
    val tmp = new Array[Double](n)
    var d = 0L
    var width = 1
    while (width < n) {
      var lo = 0
      while (lo < n - width) {
        val mid = lo + width
        val hi = math.min(lo + 2 * width, n)
        var a = lo; var b = mid; var t = lo
        while (a < mid && b < hi) {
          if (ys(b) < ys(a)) { d += (mid - a); tmp(t) = ys(b); b += 1 }
          else { tmp(t) = ys(a); a += 1 }
          t += 1
        }
        while (a < mid) { tmp(t) = ys(a); a += 1; t += 1 }
        while (b < hi) { tmp(t) = ys(b); b += 1; t += 1 }
        System.arraycopy(tmp, lo, ys, lo, hi - lo)
        lo += 2 * width
      }
      width *= 2
    }

    // tie runs in y from the now-sorted ys (n2)
    var n2 = 0L
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && ys(j) == ys(i)) j += 1
      val run = (j - i).toLong
      n2 += run * (run - 1) / 2
      i = j
    }

    val cMinusD = n0 - n1 - n2 + n3 - 2 * d
    val f1 = (n0 - n2).toDouble // = C + D + (x-only ties)
    val f2 = (n0 - n1).toDouble // = C + D + (y-only ties)
    if (f1 > 0 && f2 > 0) cMinusD.toDouble / (math.sqrt(f1) * math.sqrt(f2))
    else Double.NaN
  }

  def bufferEncoder: Encoder[ArrayBuffer[(Double, Double)]] = Encoders.kryo
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** Single home for the exact-tau ceiling so the guard, the default
  * instance, and the spec can never drift apart. */
private[graft] object KendallLimits {
  final val MaxExactRows: Long = 200L * 1000 * 1000
}

/** Default instance with the documented single-task ceiling (2e8 rows
  * of two doubles ≈ 3.2 GB buffer — the most an executor should hold),
  * plus the scale-recommended forms. */
object KendallTau extends KendallTauAgg(KendallLimits.MaxExactRows) {

  private[graft] def MaxExactRows: Long = KendallLimits.MaxExactRows

  /** Per-group tau-b: the partition-parallel form — each group's
    * O(n log n) finish runs in its own task, so this scales with group
    * count. Null pairs are dropped (pandas nancorr semantics). */
  def grouped(
      spark: SparkSession,
      df: DataFrame,
      keyCol: String,
      x: Column,
      y: Column): DataFrame = {
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("k"),
        x.cast("double").as("x"), y.cast("double").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .as[(String, Double, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(this.toColumn.name("tau"))
      .toDF(keyCol, "tau")
  }

  /** Tau-b on a uniform Bernoulli sample — the estimator form for a
    * single series too large for the exact ceiling. */
  def sampled(
      spark: SparkSession,
      df: DataFrame,
      x: Column,
      y: Column,
      fraction: Double,
      seed: Long = 42L): DataFrame = {
    import spark.implicits._
    df.select(x.cast("double").as("x"), y.cast("double").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .sample(withReplacement = false, fraction, seed)
      .as[(Double, Double)]
      .select(this.toColumn.name("tau"))
      .toDF("tau")
  }
}
