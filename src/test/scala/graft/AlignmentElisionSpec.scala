package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the index-alignment elision rule (SURVEY §4 custom-work item 4,
  * VERDICT r10 next-#5; reference: pandas frame.py:9701 _align_for_op,
  * fast path :9607): an aligned binary op written as a full-outer
  * self-join on a provably-unique shared key collapses to one pass
  * over the shared child — and is PRESERVED whenever the proof fails
  * (different lineage, no uniqueness, null-unsafe equality on a
  * nullable key).
  */
class AlignmentElisionSpec extends SparkSpec {

  private def hasJoin(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.nonEmpty

  private def base: DataFrame = {
    import spark.implicits._
    (0 until 400).map(i => (i % 37L, i * 1.5))
      .toDF("k", "v")
      .groupBy($"k").agg(sum($"v").as("total"), count(lit(1)).as("cnt"))
  }

  test("same-lineage aligned op loses its self-join") {
    import spark.implicits._
    val b = base
    val l = b.select($"k", $"total")
    val r = b.select($"k", $"cnt")
    val out = l.join(r, l("k") <=> r("k"), "full")
      .select(l("k"), ($"total" / $"cnt").as("avg"))
    assert(!hasJoin(out), s"self-join should elide:\n${out.queryExecution.optimizedPlan}")
    // values = the single-pass computation
    val expect = b.select($"k", ($"total" / $"cnt").as("avg"))
      .collect().map(x => (x.getLong(0), x.getDouble(1))).sortBy(_._1)
    val got = out.collect().map(x => (x.getLong(0), x.getDouble(1))).sortBy(_._1)
    assert(got.sameElements(expect))
  }

  test("elides inner and left joins too, and survives null keys under <=>") {
    import spark.implicits._
    val b = ((0 until 100).map(i => (Some(i % 7L), i.toDouble)) :+
        ((None: Option[Long]), 9.0))
      .toDF("k", "v").groupBy($"k").agg(sum($"v").as("total"), count(lit(1)).as("cnt"))
    for (how <- Seq("inner", "left", "full")) {
      val l = b.select($"k", $"total")
      val r = b.select($"k", $"cnt")
      val out = l.join(r, l("k") <=> r("k"), how)
        .select(l("k"), ($"total" / $"cnt").as("avg"))
      assert(!hasJoin(out), s"$how self-join should elide")
      assert(out.count() == 8, s"$how must keep the null-key group")
    }
  }

  test("preserved: null-unsafe equality on a nullable key") {
    import spark.implicits._
    val b = ((0 until 100).map(i => (Some(i % 7L), i.toDouble)) :+
        ((None: Option[Long]), 9.0))
      .toDF("k", "v").groupBy($"k").agg(sum($"v").as("total"), count(lit(1)).as("cnt"))
    val l = b.select($"k", $"total")
    val r = b.select($"k", $"cnt")
    val out = l.join(r, l("k") === r("k"), "full")
    assert(hasJoin(out),
      "EqualTo on a nullable key duplicates the null group in a full join — must not elide")
    // the join semantics the rule must preserve: null key matches nothing
    assert(out.count() == 9)
  }

  test("preserved: different lineage") {
    import spark.implicits._
    val l = (0 until 50).map(i => (i.toLong, i * 1.0)).toDF("k", "a")
      .groupBy($"k").agg(sum($"a").as("a"))
    val r = (0 until 50).map(i => (i.toLong, i * 2.0)).toDF("k", "b")
      .groupBy($"k").agg(sum($"b").as("b"))
    val out = l.join(r, l("k") <=> r("k"), "full")
    assert(hasJoin(out), "different children must keep the alignment join")
  }

  test("preserved: key not provably unique") {
    import spark.implicits._
    val b = (0 until 100).map(i => (i % 7L, i.toDouble)).toDF("k", "v")
    val l = b.select($"k", $"v")
    val r = b.select($"k", ($"v" * 2).as("w"))
    val out = l.join(r, l("k") <=> r("k"), "inner")
    assert(hasJoin(out),
      "a non-unique key self-join fans out per group — must not elide")
    assert(out.count() > 100)
  }

  test("preserved: non-deterministic shared child") {
    import spark.implicits._
    val b = (0 until 100).map(i => (i.toLong, i.toDouble)).toDF("k", "v")
      .withColumn("r", rand(7))
      .groupBy($"k").agg(sum($"r").as("total"), count(lit(1)).as("cnt"))
    val l = b.select($"k", $"total")
    val r2 = b.select($"k", $"cnt")
    val out = l.join(r2, l("k") <=> r2("k"), "full")
    // rand(seed) is still flagged non-deterministic per evaluation order
    assert(hasJoin(out), "non-deterministic lineage must keep the join")
  }
}
