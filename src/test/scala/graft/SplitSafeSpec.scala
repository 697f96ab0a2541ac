package graft

import org.apache.spark.sql.functions._

/** The leakage-safety property pipe_split_safe exists for: no
  * near-dup cluster may straddle train/val/test.
  */
class SplitSafeSpec extends SparkSpec {

  test("pipe_split_safe never splits a near-dup cluster across sides") {
    val out = SparkEntry.queries("pipe_split_safe")(spark, sf()).cache()
    try {
      val straddling = out.groupBy(col("cluster_id"))
        .agg(countDistinct(col("split")).as("n_splits"))
        .filter(col("n_splits") > 1).count()
      assert(straddling == 0L, s"$straddling clusters straddle splits")

      // every document is assigned exactly once
      val docs = Tables(spark, sf(), "documents").count()
      assert(out.count() == docs)
      assert(out.select("doc_id").distinct().count() == docs)

      // the 80/10/10 hash split is only approximate at 500 docs, but
      // train must dominate and no side may be empty
      val bySplit = out.groupBy(col("split")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bySplit.keySet == Set("train", "val", "test"), s"sides: $bySplit")
      assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"),
        s"train must dominate: $bySplit")
    } finally out.unpersist()
  }
}
