package graft

import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._

/** Closes the SURVEY §2.1 Feather / Arrow-interchange row with
  * evidence instead of a doc note: Spark's native Arrow conversion
  * (the same machinery behind pandas/R interchange) round-trips graft
  * data bit-exactly. A pandas user's `to_feather`/`from_dataframe`
  * (reference: pandas/io/feather_format.py:36,
  * pandas/core/interchange/from_dataframe.py:42) maps to this
  * Dataset -> Arrow batches -> Dataset path.
  */
class ArrowInterchangeSpec extends SparkSpec {

  test("Dataset -> Arrow batches -> Dataset round-trips bit-exactly") {
    import spark.implicits._
    val df = Tables(spark, sf(), "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_quantity",
        $"l_returnflag", $"l_shipdate")
      .limit(2000)
    val batches = GraftSqlBridge.toArrowBatches(df)
    assert(batches.nonEmpty && batches.forall(_.nonEmpty),
      "expected at least one non-empty Arrow record batch")
    val back = GraftSqlBridge.fromArrowBatches(
      spark, batches.iterator, df.schema.json)
    assert(back.schema == df.schema, "schema must survive the round trip")
    val a = df.collect().map(_.toSeq).sortBy(_.mkString(""))
    val b = back.collect().map(_.toSeq).sortBy(_.mkString(""))
    assert(a.sameElements(b), "values must survive the round trip")
  }

  test("null-bearing and string/double columns survive the round trip") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(1.5), "a"),
      (2L, None, null.asInstanceOf[String]),
      (3L, Some(-0.0), "ünïcode ✓")
    ).toDF("id", "x", "s")
    val back = GraftSqlBridge.fromArrowBatches(
      spark, GraftSqlBridge.toArrowBatches(df).iterator, df.schema.json)
    assert(back.schema == df.schema)
    assert(back.collect().map(_.toSeq).sortBy(_.toString()).toSeq ==
      df.collect().map(_.toSeq).sortBy(_.toString()).toSeq)
  }
}
