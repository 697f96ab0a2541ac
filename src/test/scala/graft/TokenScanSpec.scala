package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** TokenScan must be byte-for-byte equivalent to
  * regexp_count('[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]') — the regex it
  * replaces in txt_tokens' hot path.
  */
class TokenScanSpec extends SparkSpec {
  private val Pattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]".r

  private def regexCount(s: String): Int = Pattern.findAllIn(s).length

  test("scanner matches the regex on edge strings") {
    val cases = Seq(
      "", " ", "   ", "abc", "abc def", "a1b2", "123 456", "a,b.c",
      "hello, world! 42 times", "\ttab\nnewline", "..!!", "émigré café",
      "汉字测试", "mix 汉字 and ascii 123", "ümlaut ß", "a", "9", ",",
      "UPPER lower 007", "trailing space ", " leading", "a  b", "€5.00")
    for (c <- cases) {
      assert(graft.functions.TokenScan.count(UTF8String.fromString(c)) ==
        regexCount(c), s"mismatch on '$c'")
    }
  }

  test("scanner matches the regex on every corpus document") {
    val mismatches = Tables(spark, sf(), "documents")
      .select(
        expr("regexp_count(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')").as("re"),
        col("text"))
      .collect()
      .count(r => regexCount(r.getString(1)) != r.getInt(0) ||
        graft.functions.TokenScan.count(UTF8String.fromString(r.getString(1))) != r.getInt(0))
    assert(mismatches == 0, s"$mismatches corpus docs disagree")
  }

  test("txt_tokens plans no regex and stays in whole-stage codegen") {
    val p = SparkEntry.queries("txt_tokens")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!p.contains("regexp_count"), "txt_tokens must use the scan kernel")
    assert(p.toLowerCase.contains("tokencount"),
      "expected the TokenCount expression")
    assert(p.contains("WholeStageCodegen") || p.contains("*(1)"),
      "must stay inside codegen (the *(n) stage marker)")
  }
}
