package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated TPC-H-ish testdata (TESTDATA.md).
  *
  * Every query takes `(spark, sfDir)` and loads what it needs through
  * here, so the parquet scan (with Catalyst column pruning + predicate
  * pushdown) is the single entry point for data. At cluster scale the
  * same call reads a partitioned table; nothing below assumes
  * single-file layout.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Loads a table, normalizing timestamp columns to TimestampType.
    *
    * The driver's testdata has shipped two physical encodings across
    * rounds: TIMESTAMP(NANOS) (unreadable natively by Spark 4 —
    * sessions set `spark.sql.legacy.parquet.nanosAsLong=true` and the
    * long nanos are converted here) and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false), which Spark 4 infers as TIMESTAMP_NTZ by
    * default. All sessions run with UTC and all oracle comparisons are
    * against DuckDB's naive reading of the same bytes, so NTZ→UTC
    * TimestampType is a pure relabeling (identical micros value) — it
    * keeps `unix_micros`/window-range arithmetic working unchanged.
    * Sessions also set `spark.sql.parquet.inferTimestampNTZ.enabled=
    * false` so direct `spark.read.parquet` calls outside this loader
    * see the same schema; the cast here is the belt to that suspender.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // central session hook: make the graft custom expressions available
    // to every query (idempotent map-put, no measurable overhead)
    graft.functions.VectorExprs.register(spark)
    graft.functions.BloomExprs.register(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val df2 =
      if (name == "events" && df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    df2.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }.foldLeft(df2)((d, c) => d.withColumn(c, col(c).cast(TimestampType)))
  }
}
