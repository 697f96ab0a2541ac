package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loud ceilings for the deliberately quadratic oracle/recall
  * baselines. `sim_cosine_pairs` (all-pairs crossJoin) and
  * `dedup_jaccard_pairs` (shared-shingle blocking, quadratic in
  * per-shingle document frequency) exist to cross-check the scale-safe
  * operators at small sf — but nothing stopped them from being
  * launched against a full corpus, where they would not finish. Each
  * guard is one cheap driver-side action (a metadata-served count, or
  * a single map-combined aggregation for the frequency ceiling) — O(n)
  * spent before an O(n^2) job is noise, and a diagnosable error beats
  * a cluster-filling surprise.
  *
  *   - `graft.quadratic.maxRows`  (default 50000): input-row ceiling
  *     for all-pairs baselines (50k rows = 1.25e9 candidate pairs).
  *   - `graft.quadratic.maxKeyDf` (default 5000): per-blocking-key
  *     frequency ceiling (a key shared by f rows yields ~f^2 pairs) —
  *     same spirit as `graft.lsh.hotBandCap`.
  *
  * Set either to -1 to disable (expert override).
  */
object QuadraticGuard {

  /** Ceiling on the input rows of an all-pairs baseline. */
  def assertSmallInput(s: SparkSession, input: DataFrame,
                       query: String, twin: String): Unit = {
    val cap = s.conf.get("graft.quadratic.maxRows", "50000").toLong
    if (cap >= 0) {
      val n = input.count()
      if (n > cap) throw new IllegalStateException(
        s"graft: '$query' is a deliberately quadratic baseline and its input " +
          s"has $n rows (> graft.quadratic.maxRows=$cap, ~${n * n / 2} candidate " +
          s"pairs). Use the scale-safe twin '$twin', or raise " +
          "graft.quadratic.maxRows (-1 disables the guard).")
    }
  }

  /** Ceiling on the max per-key frequency of a blocking join: a key
    * shared by f rows contributes ~f^2 candidate pairs.
    */
  def assertBlockingDf(s: SparkSession, keyed: DataFrame, keyCol: String,
                       query: String, twin: String): Unit = {
    val cap = s.conf.get("graft.quadratic.maxKeyDf", "5000").toLong
    if (cap >= 0) {
      val m = keyed.groupBy(col(keyCol)).count()
        .agg(max(col("count"))).head().get(0)
      val worst = if (m == null) 0L else m.asInstanceOf[Long]
      if (worst > cap) throw new IllegalStateException(
        s"graft: '$query' blocks on '$keyCol' and one key is shared by $worst " +
          s"rows (> graft.quadratic.maxKeyDf=$cap, ~${worst * worst} pairs in " +
          s"one bucket). Use the scale-safe twin '$twin', or raise " +
          "graft.quadratic.maxKeyDf (-1 disables the guard).")
    }
  }
}
