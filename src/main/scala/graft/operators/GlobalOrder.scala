package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scalable global ordinals (the `__order__` discipline of SURVEY §7.1
  * for operations that need a *total* order: iloc slices, factorize
  * codes, qcut bucket boundaries).
  *
  * A plain `row_number() over (orderBy ...)` collapses to a single
  * partition (WindowExec warns, and at 100 TB it simply doesn't run).
  * The distributed equivalent is the classic two-pass zip:
  *
  *   1. `repartitionByRange` on the sort key range-partitions the data
  *      (sampled range bounds — one extra pass over a sample);
  *   2. `sortWithinPartitions` orders each partition locally;
  *   3. `zipWithIndex` counts rows per partition (cheap job) and
  *      assigns contiguous offsets — no partition ever sees more than
  *      its share of rows.
  *
  * With a total order (sort keys + tiebreaks unique) the assigned
  * ordinal is exactly `row_number() - 1`, so correctness oracles are
  * unchanged — only the physical plan differs.
  */
object GlobalOrder {

  /** df + `ordinalCol` (0-based long) following `sortCols` order. */
  def zipOrdinal(df: DataFrame, sortCols: Seq[Column], ordinalCol: String = "__ord"): DataFrame = {
    val spark = df.sparkSession
    val arranged = df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
    val schema = StructType(arranged.schema.fields :+ StructField(ordinalCol, LongType, nullable = false))
    val zipped = arranged.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ idx)
    }
    spark.createDataFrame(zipped, schema)
  }
}
