package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` constructors needed to hand a
  * custom LogicalPlan back to the public Dataset API (the same door
  * SparkSessionExtensions-based libraries use; nothing here touches
  * internals beyond plan construction).
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    org.apache.spark.sql.classic.Dataset.ofRows(classic, plan)
  }

  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]].queryExecution.analyzed

  /** Wrap a catalyst Expression as a public Column (the door custom
    * codegen'd expressions use without a function-registry round-trip). */
  def exprColumn(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Inverse of [[exprColumn]]: the catalyst Expression behind a Column. */
  def columnExpr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Dataset -> Arrow IPC record-batch payloads, one byte[] per batch,
    * computed distributed (per-partition) and collected. This is the
    * wire format Spark itself uses for pandas/R interchange — the
    * pandas Feather / interchange-protocol role
    * (reference: pandas/io/feather_format.py:36,
    * pandas/core/interchange/from_dataframe.py:42) is played by
    * Spark's built-in Arrow conversion, bridged here for direct use.
    */
  def toArrowBatches(df: DataFrame): Array[Array[Byte]] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
      .toArrowBatchRdd.collect()

  /** Arrow record-batch payloads -> DataFrame (inverse of
    * [[toArrowBatches]]; `schemaJson` = `df.schema.json`).
    */
  def fromArrowBatches(spark: SparkSession, batches: Iterator[Array[Byte]],
                       schemaJson: String): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    org.apache.spark.sql.execution.arrow.ArrowConverters
      .toDataFrame(batches, schemaJson, classic)
  }
}
