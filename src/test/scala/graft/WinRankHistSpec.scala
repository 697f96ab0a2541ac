package graft

/** win_rank_hist is a pure computation restructuring of
  * win_rank_average (rank(method='average') + pct, pandas
  * groupby.pyx group_rank semantics): same rows, BIT-identical
  * doubles. The DuckDB oracle already checks each against the same
  * SQL; this spec pins the stronger engine-internal claim directly —
  * the histogram identities (rank_min = cum − cnt + 1,
  * rank_avg = rank_min + (cnt−1)/2) must reproduce the window form's
  * exact bits, because both sides compute integer-valued doubles plus
  * an exact half before the single pct division.
  */
class WinRankHistSpec extends SparkSpec {

  test("histogram rank reproduces the window rank bit-for-bit") {
    def rows(name: String) =
      SparkEntry.queries(name)(spark, sf())
        .collect()
        .map(r => (r.getString(0), r.getLong(1),
          r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        .sortBy(t => (t._1, t._2))
    val win = rows("win_rank_average")
    val hist = rows("win_rank_hist")
    assert(win.length == hist.length, "row counts differ")
    def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)
    win.zip(hist).foreach { case (w, h) =>
      assert(w._1 == h._1 && w._2 == h._2, s"row identity differs: $w vs $h")
      assert(bits(w._3) == bits(h._3) && bits(w._4) == bits(h._4) &&
        bits(w._5) == bits(h._5),
        s"rank values differ for ${w._1}/${w._2}: $w vs $h")
    }
  }
}
