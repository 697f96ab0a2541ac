package graft.functions

/** Closed-form tap arrays for pandas' scipy `win_type=` weighted
  * rolling windows (reference: pandas `window/rolling.py:862` delegates
  * to `scipy.signal.get_window`; the shapes below are the public
  * closed-form definitions — no scipy involved).
  *
  * Weighted rolling mean in pandas is sum(w·x)/sum(w); callers get
  * pre-normalized taps here and feed them to a lag dot-product, so the
  * whole operator stays a codegen'd window expression. The same Scala
  * doubles are interpolated into the DuckDB oracle, so both engines run
  * identical IEEE constants.
  */
object WinTypes {

  /** w[k] = exp(-0.5·((k−(M−1)/2)/std)²), k = 0..M−1 */
  def gaussian(m: Int, std: Double): Seq[Double] = {
    val c = (m - 1) / 2.0
    (0 until m).map(k => math.exp(-0.5 * math.pow((k - c) / std, 2)))
  }

  /** symmetric triangle; odd M: w = 1 − |2k−(M−1)|/(M+1) */
  def triang(m: Int): Seq[Double] =
    if (m % 2 == 1) (0 until m).map(k => 1.0 - math.abs(2.0 * k - (m - 1)) / (m + 1))
    else (0 until m).map { k =>
      val n = if (k < m / 2) k + 1 else m - k
      (2.0 * n - 1.0) / m
    }

  /** w[k] = 0.54 − 0.46·cos(2πk/(M−1)) */
  def hamming(m: Int): Seq[Double] =
    (0 until m).map(k => 0.54 - 0.46 * math.cos(2.0 * math.Pi * k / (m - 1)))

  /** taps scaled to sum to 1 (pandas' sum(w·x)/sum(w) pre-folded) */
  def normalized(w: Seq[Double]): Seq[Double] = {
    val s = w.sum
    w.map(_ / s)
  }
}
