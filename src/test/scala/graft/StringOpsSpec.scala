package graft

import org.apache.spark.sql.functions._
import graft.ops.StringQueries

/** The strict str.index/rindex contract: pandas raises ValueError when
  * the substring is absent; the distributed analogue is a loud query
  * failure via raise_error, never a silent -1. */
class StringOpsSpec extends SparkSpec {

  test("strictIndex/strictRindex return 0-based positions when present") {
    import spark.implicits._
    val r = Seq("xxthezzthe").toDF("text")
      .select(StringQueries.strictIndex($"text", "the").as("i"),
        StringQueries.strictRindex($"text", "the").as("r"))
      .collect()(0)
    assert(r.getLong(0) == 2L) // first occurrence, 0-based
    assert(r.getLong(1) == 7L) // last occurrence, 0-based
  }

  test("strictIndex raises on a missing substring instead of returning -1") {
    import spark.implicits._
    val df = Seq("no match here").toDF("text")
    val e = intercept[Exception] {
      df.select(StringQueries.strictIndex($"text", "zzz")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("not found")))
    val e2 = intercept[Exception] {
      df.select(StringQueries.strictRindex($"text", "zzz")).collect()
    }
    assert(messages(e2).exists(_.contains("not found")))
  }
}
