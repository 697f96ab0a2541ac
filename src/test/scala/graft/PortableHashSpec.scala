package graft

import graft.functions.PortableHash
import org.apache.spark.sql.functions._

/** PortableHash must stay stable: the DuckDB oracles embed the same
  * constants, so any change here silently breaks every dedup oracle.
  */
class PortableHashSpec extends SparkSpec {

  test("wordHash reference values") {
    import spark.implicits._
    val out = Seq("spark", "abcdefghijklmnopqrstuvwxyz_longer_word_test", "")
      .toDF("w")
      .select(PortableHash.wordHash($"w").as("h"))
      .as[Long].collect()
    assert(out(0) == 109638365L)
    assert(out(1) == 739966988L)
    assert(out(2) == 0L)
  }

  test("permutations stay in range and differ") {
    import spark.implicits._
    val h = Seq("doc text here").toDF("w")
      .select((0 until PortableHash.NumPerms)
        .map(k => PortableHash.perm(k, PortableHash.wordHash($"w")).as(s"p$k")): _*)
      .collect()(0)
    val vals = (0 until PortableHash.NumPerms).map(h.getLong)
    assert(vals.forall(v => v >= 0 && v < PortableHash.P))
    assert(vals.distinct.size == vals.size)
  }
}
