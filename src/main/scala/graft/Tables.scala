package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** Loads a table. `events.ts` is written as parquet TIMESTAMP(NANOS),
    * which Spark 4 refuses to read natively; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` and the long nanos are
    * converted here to a microsecond TimestampType column (the testdata
    * carries no sub-microsecond components, so this is lossless and
    * matches what DuckDB reads).
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // central session hook: make the graft custom expressions available
    // to every query (idempotent map-put, no measurable overhead)
    graft.functions.VectorExprs.register(spark)
    graft.functions.BloomExprs.register(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
