package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gates for the Z-order layout operator (src_zorder_box).
  *
  * The DuckDB oracle proves the Morton interleave arithmetic and the
  * round-trip; this spec pins what the oracle can't see — the LAYOUT
  * property the operator exists for: after a Z-order write, per-file
  * min/max ranges localize BOTH dimensions, so a box predicate on the
  * non-sort dimension can skip most files, where a single-column sort
  * layout localizes only its own column (every file spans the full
  * range of the other).
  */
class ZOrderSpec extends SparkSpec {

  import graft.sources.SourceQueries.zOf

  test("Morton interleave matches hand-computed values") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L),
      // 16-bit masking: bit 16 of either coordinate is ignored
      (65536L + 3L, 5L))
      .toDF("x", "y")
      .select($"x", $"y", zOf($"x", $"y").as("z"))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = Map(
      (0L, 0L) -> 0L, (1L, 0L) -> 1L, (0L, 1L) -> 2L,
      // spread(3)=0b101=5, spread(5)=0b10001=17 -> 5 | 17<<1 = 39
      (3L, 5L) -> 39L, (65535L, 65535L) -> 4294967295L,
      (65539L, 5L) -> 39L)
    got.foreach { case (x, y, z) =>
      assert(z == expect((x, y)), s"z($x,$y) = $z, expected ${expect((x, y))}")
    }
  }

  /** per-file [min,max] of `dim`, then the number of files whose range
    * intersects [lo, hi] — the files a min/max-footers reader must scan */
  private def overlapping(path: String, dim: String, lo: Long, hi: Long): (Long, Long) = {
    val ranges = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(dim)).as("mn"), max(col(dim)).as("mx"))
    val total = ranges.count()
    val hit = ranges.filter(col("mx") >= lo && col("mn") <= hi).count()
    (hit, total)
  }

  private def writeLayout(sorted: DataFrame, path: String): Unit =
    sorted.write.mode("overwrite").parquet(path)

  test("z-order layout skips files on BOTH box dimensions; single sort only on its own") {
    import spark.implicits._
    import graft.sources.SourceQueries.withZval
    val days = datediff($"o_orderdate".cast("date"),
      lit("1970-01-01").cast("date")).cast("long")
    val src = withZval(
      Tables(spark, sf(), "orders")
        .select($"o_custkey", days.as("o_days"), $"o_totalprice"),
      "o_custkey", "o_days").cache()
    val zPath = "/tmp/graft_test/zorder_z"
    val linPath = "/tmp/graft_test/zorder_lin"
    writeLayout(src.repartitionByRange(16, $"zval").sortWithinPartitions($"zval"), zPath)
    writeLayout(src.repartitionByRange(16, $"o_custkey").sortWithinPartitions($"o_custkey"), linPath)
    src.unpersist()

    // box predicate: o_days in [9500, 10000] (~20% of the date range),
    // o_custkey in [10, 40] (~20% of the key range)
    val (zDaysHit, zTotal) = overlapping(zPath, "o_days", 9500L, 10000L)
    val (linDaysHit, linTotal) = overlapping(linPath, "o_days", 9500L, 10000L)
    val (zCustHit, _) = overlapping(zPath, "o_custkey", 10L, 40L)
    val (linCustHit, _) = overlapping(linPath, "o_custkey", 10L, 40L)

    // the custkey-sorted layout cannot skip anything on the date box:
    // every file spans the whole date range
    assert(linDaysHit == linTotal,
      s"single-sort layout unexpectedly localized o_days ($linDaysHit/$linTotal)")
    // the z-order layout must skip at least half the files on EACH
    // single-dimension predicate — the equal-resolution tiling is what
    // makes this hold for both (raw bit interleave localized only
    // o_days, the wider-range dimension, 16/16 on custkey)
    assert(zDaysHit * 2 <= zTotal,
      s"z-order layout failed to localize o_days: $zDaysHit/$zTotal files overlap")
    assert(zCustHit * 2 <= zTotal,
      s"z-order layout failed to localize o_custkey: $zCustHit/$zTotal files overlap")
    // the dedicated custkey sort is of course best on custkey
    assert(linCustHit * 2 <= linTotal,
      s"custkey-sort layout failed to localize o_custkey: $linCustHit/$linTotal")
  }
}
