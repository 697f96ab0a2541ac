package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** CanonScan must be byte-for-byte equivalent to the regex chain it
  * replaces in dedup_normalized's scan stage:
  * trim(regexp_replace(regexp_replace(lower(nfc(s)), "[^a-z0-9 ]", ""), " +", " ")).
  */
class CanonScanSpec extends SparkSpec {

  private def regexCanon(s: String): String = {
    val lowered = java.text.Normalizer
      .normalize(s, java.text.Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)
    lowered.replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ").trim
  }

  private def kernel(s: String): String =
    graft.functions.CanonScan.canon(UTF8String.fromString(s)).toString

  test("kernel matches the regex chain on edge strings") {
    val cases = Seq(
      "", " ", "   ", "abc", "ABC", "A  b!c ", "a,b.c", "!!a", "a!!",
      "a!b", "a !b", "a! b", "  leading", "trailing  ", "..!!",
      "UPPER lower 007", "tabs\tand\nnewlines", "a  b   c",
      // non-ASCII: accents strip, NFC composes the combining mark first
      "café", "café", "Héllo  Wörld!", "汉字 mixed 42",
      "İstanbul", "straße")
    for (c <- cases)
      assert(kernel(c) == regexCanon(c), s"mismatch on '$c'")
  }

  test("kernel matches the regex chain on every corpus document") {
    val mismatches = Tables(spark, sf(), "documents")
      .select(col("text")).collect()
      .count(r => kernel(r.getString(0)) != regexCanon(r.getString(0)))
    assert(mismatches == 0, s"$mismatches corpus docs disagree")
  }

  test("dedup_normalized plans no regex and stays in codegen") {
    val p = SparkEntry.queries("dedup_normalized")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!p.contains("regexp_replace"),
      "dedup_normalized must use the canon kernel, not the regex chain")
    assert(p.toLowerCase.contains("canontext"),
      "expected the CanonText expression")
  }
}
