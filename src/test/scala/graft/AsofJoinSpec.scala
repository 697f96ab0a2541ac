package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

/** merge_asof semantics (reference core/reshape/merge.py:644):
  * backward match, exact-timestamp matches allowed, tolerance nulls
  * out stale matches, unmatched left rows survive with NULL.
  */
class AsofJoinSpec extends SparkSpec {

  private def ts(s: Long) = s * 1000000L

  test("backward as-of with by-keys, exact matches, tolerance") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(100), "a"), (1L, ts(200), "b"), (1L, ts(50), "c"),
      (2L, ts(100), "d"))
      .toDF("k", "tsm", "tag")
      .withColumn("t", timestamp_micros($"tsm")).drop("tsm")
    val right = Seq(
      (1L, ts(100), 1.0), (1L, ts(150), 2.0), (2L, ts(90), 3.0))
      .toDF("k", "tsm", "v")
      .withColumn("t", timestamp_micros($"tsm")).drop("tsm")

    val out = AsofJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"))
      .select($"tag", $"v").as[(String, Option[Double])].collect().toMap

    assert(out("a").contains(1.0)) // exact-timestamp match allowed
    assert(out("b").contains(2.0)) // latest at/before 200 is 150
    assert(out("c").isEmpty)       // nothing at/before 50
    assert(out("d").contains(3.0)) // by-key separation

    val tol = AsofJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"),
      toleranceMicros = Some(ts(20)))
      .select($"tag", $"v").as[(String, Option[Double])].collect().toMap

    assert(tol("a").contains(1.0)) // age 0 <= 20s
    assert(tol("b").isEmpty)       // age 50s > 20s -> nulled
    assert(tol("d").contains(3.0)) // age 10s <= 20s
  }

  test("forward and nearest directions") {
    import spark.implicits._
    val left = Seq((1L, ts(100), "a"), (1L, ts(120), "b"), (1L, ts(300), "c"))
      .toDF("k", "tsm", "tag")
      .withColumn("t", timestamp_micros($"tsm")).drop("tsm")
    val right = Seq((1L, ts(100), 1.0), (1L, ts(130), 2.0))
      .toDF("k", "tsm", "v")
      .withColumn("t", timestamp_micros($"tsm")).drop("tsm")

    val fwd = AsofJoin.forward(left, right, Seq("k"), "t", "t", Seq("v"))
      .select($"tag", $"v").as[(String, Option[Double])].collect().toMap
    assert(fwd("a").contains(1.0)) // exact forward match
    assert(fwd("b").contains(2.0)) // next at 130
    assert(fwd("c").isEmpty)       // nothing after 300

    val near = AsofJoin.nearest(left, right, Seq("k"), "t", "t", Seq("v"))
      .select($"tag", $"v").as[(String, Option[Double])].collect().toMap
    assert(near("a").contains(1.0)) // dist 0
    assert(near("b").contains(2.0)) // 10s fwd beats 20s back
    assert(near("c").contains(2.0)) // only backward exists

    // tie: left at 115 is 15s from both 100 and 130 -> backward wins
    val tie = Seq((1L, ts(115), "t")).toDF("k", "tsm", "tag")
      .withColumn("t", timestamp_micros($"tsm")).drop("tsm")
    val tieOut = AsofJoin.nearest(tie, right, Seq("k"), "t", "t", Seq("v"))
      .select($"v").as[Option[Double]].collect()
    assert(tieOut.head.contains(1.0))
  }

  test("NULL right values propagate from the matched row (no fallthrough)") {
    import spark.implicits._
    val left = Seq((1L, ts(200), "a"), (1L, ts(300), "b"))
      .toDF("k", "tsm", "tag")
      .withColumn("t", timestamp_micros($"tsm")).drop("tsm")
    // matched row at 150 has v=NULL, w=20: pandas returns THAT row's
    // NaN for v — not the older row's 1.0 — and both value columns
    // must come from the same matched row
    val right = Seq(
      (1L, ts(100), Some(1.0), Some(10.0)),
      (1L, ts(150), None: Option[Double], Some(20.0)),
      (1L, ts(250), Some(3.0), None: Option[Double]))
      .toDF("k", "tsm", "v", "w")
      .withColumn("t", timestamp_micros($"tsm")).drop("tsm")

    val out = AsofJoin.backward(left, right, Seq("k"), "t", "t", Seq("v", "w"))
      .select($"tag", $"v", $"w")
      .as[(String, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("a") == (None, Some(20.0)))   // matched row 150 as-is
    assert(out("b") == (Some(3.0), None))    // matched row 250 as-is

    val fwd = AsofJoin.forward(left, right, Seq("k"), "t", "t", Seq("v", "w"))
      .select($"tag", $"v", $"w")
      .as[(String, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(fwd("a") == (Some(3.0), None))    // next row 250 as-is
  }

  test("native operator rejects null merge keys like pandas") {
    import spark.implicits._
    val left = Seq((Some(1L), ts(100), "a"), (None: Option[Long], ts(200), "b"))
      .toDF("k", "tsm", "tag")
      .withColumn("t", timestamp_micros($"tsm")).drop("tsm")
    val right = Seq((1L, ts(50), 1.0)).toDF("k", "tsm", "v")
      .withColumn("t", timestamp_micros($"tsm")).drop("tsm")
    val ex = intercept[Exception] {
      graft.plans.AsofJoinNative.backward(spark, left, right,
        Seq("k"), "t", "t", Seq("v")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("native operator matches the union+window rewrite") {
    import spark.implicits._
    val ev = Tables(spark, sf(), "events")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"value")
    val viaWindow = AsofJoin.backward(clicks, purchases,
        Seq("user_id"), "ts", "ts", Seq("value"))
      .select($"event_id", $"value").as[(Long, Option[Double])]
      .collect().toMap
    val viaNative = graft.plans.AsofJoinNative.backward(spark, clicks, purchases,
        Seq("user_id"), "ts", "ts", Seq("value"))
      .select($"event_id", $"value").as[(Long, Option[Double])]
      .collect().toMap
    assert(viaNative.size == viaWindow.size)
    assert(viaNative == viaWindow)
  }

  test("native forward/nearest/tolerance/strict match the rewrite") {
    import spark.implicits._
    val ev = Tables(spark, sf(), "events")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"value")
    val all = ev.select($"user_id", $"ts", $"value")

    def m(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Double]] =
      df.select($"event_id", $"value").as[(Long, Option[Double])]
        .collect().toMap

    // forward
    assert(
      m(graft.plans.AsofJoinNative.join(spark, clicks, purchases,
        Seq("user_id"), "ts", "ts", Seq("value"), direction = "forward")) ==
      m(AsofJoin.forward(clicks, purchases,
        Seq("user_id"), "ts", "ts", Seq("value"))))
    // nearest (ties -> backward)
    assert(
      m(graft.plans.AsofJoinNative.join(spark, clicks, purchases,
        Seq("user_id"), "ts", "ts", Seq("value"), direction = "nearest")) ==
      m(AsofJoin.nearest(clicks, purchases,
        Seq("user_id"), "ts", "ts", Seq("value"))))
    // backward + tolerance
    assert(
      m(graft.plans.AsofJoinNative.join(spark, clicks, purchases,
        Seq("user_id"), "ts", "ts", Seq("value"),
        toleranceUs = Some(3600000000L))) ==
      m(AsofJoin.backward(clicks, purchases,
        Seq("user_id"), "ts", "ts", Seq("value"),
        toleranceMicros = Some(3600000000L))))
    // nearest + tolerance
    assert(
      m(graft.plans.AsofJoinNative.join(spark, clicks, purchases,
        Seq("user_id"), "ts", "ts", Seq("value"), direction = "nearest",
        toleranceUs = Some(3600000000L))) ==
      m(AsofJoin.nearest(clicks, purchases,
        Seq("user_id"), "ts", "ts", Seq("value"),
        toleranceMicros = Some(3600000000L))))
    // strict backward against ALL events: the exact-ts self-candidate
    // must be skipped for the current row yet stay available as the
    // backward match of later rows — the consumed-candidate subtlety
    assert(
      m(graft.plans.AsofJoinNative.join(spark, clicks, all,
        Seq("user_id"), "ts", "ts", Seq("value"),
        allowExactMatches = false)) ==
      m(AsofJoin.backward(clicks, all,
        Seq("user_id"), "ts", "ts", Seq("value"),
        allowExactMatches = false)))
    // strict forward
    assert(
      m(graft.plans.AsofJoinNative.join(spark, clicks, all,
        Seq("user_id"), "ts", "ts", Seq("value"), direction = "forward",
        allowExactMatches = false)) ==
      m(AsofJoin.forward(clicks, all,
        Seq("user_id"), "ts", "ts", Seq("value"),
        allowExactMatches = false)))
  }

  test("native operator handles empty right side and exact matches") {
    import spark.implicits._
    val left = Seq((1L, ts(100), "a"), (2L, ts(50), "b"))
      .toDF("k", "tsm", "tag")
      .withColumn("t", timestamp_micros($"tsm")).drop("tsm")
    val right = Seq((1L, ts(100), 7.0))
      .toDF("k", "tsm", "v")
      .withColumn("t", timestamp_micros($"tsm")).drop("tsm")
    val out = graft.plans.AsofJoinNative.backward(spark, left, right,
        Seq("k"), "t", "t", Seq("v"))
      .select($"tag", $"v").as[(String, Option[Double])].collect().toMap
    assert(out("a").contains(7.0)) // exact ts match allowed
    assert(out("b").isEmpty)       // key with no right rows
  }

  test("globalBackward matches the keyed rewrite on a constant key") {
    import spark.implicits._
    // enough rows to span several range partitions; values chosen so
    // matches cross partition boundaries (the carry handoff path)
    val left = (1L to 500L).map(i => (i * 10, s"L$i"))
      .toDF("tsm", "tag")
      .withColumn("t", timestamp_micros($"tsm")).drop("tsm")
    val right = (1L to 100L).map(i => (i * 47 + 3, i.toDouble))
      .toDF("tsm", "v")
      .withColumn("t", timestamp_micros($"tsm")).drop("tsm")

    val global = AsofJoin.globalBackward(left, right, "t", "t", Seq("v"))
      .select($"tag", $"v").as[(String, Option[Double])].collect().toMap
    val keyed = AsofJoin.backward(
        left.withColumn("k", lit(1)), right.withColumn("k", lit(1)),
        Seq("k"), "t", "t", Seq("v"))
      .select($"tag", $"v").as[(String, Option[Double])].collect().toMap

    assert(global.size == 500 && global == keyed)
    assert(global("L1").isEmpty) // ts=10 before first right row at 50

    val tol = AsofJoin.globalBackward(left, right, "t", "t", Seq("v"),
      toleranceMicros = Some(5L))
      .select($"tag", $"v").as[(String, Option[Double])].collect().toMap
    val tolKeyed = AsofJoin.backward(
        left.withColumn("k", lit(1)), right.withColumn("k", lit(1)),
        Seq("k"), "t", "t", Seq("v"), toleranceMicros = Some(5L))
      .select($"tag", $"v").as[(String, Option[Double])].collect().toMap
    assert(tol == tolKeyed)

    val strict = AsofJoin.globalBackward(left, right, "t", "t", Seq("v"),
      allowExactMatches = false)
    val strictKeyed = AsofJoin.backward(
        left.withColumn("k", lit(1)), right.withColumn("k", lit(1)),
        Seq("k"), "t", "t", Seq("v"), allowExactMatches = false)
      .select($"tag", $"v").as[(String, Option[Double])].collect().toMap
    assert(strict.select($"tag", $"v").as[(String, Option[Double])]
      .collect().toMap == strictKeyed)
  }

  test("globalForward matches the keyed forward on a constant key") {
    import spark.implicits._
    val left = (1L to 400L).map(i => (i * 11, s"L$i"))
      .toDF("tsm", "tag")
      .withColumn("t", timestamp_micros($"tsm")).drop("tsm")
    val right = (1L to 80L).map(i => (i * 53 + 1, i.toDouble))
      .toDF("tsm", "v")
      .withColumn("t", timestamp_micros($"tsm")).drop("tsm")

    val global = AsofJoin.globalForward(left, right, "t", "t", Seq("v"),
      toleranceMicros = Some(30L))
      .select($"tag", $"v").as[(String, Option[Double])].collect().toMap
    val keyed = AsofJoin.forward(
        left.withColumn("k", lit(1)), right.withColumn("k", lit(1)),
        Seq("k"), "t", "t", Seq("v"), toleranceMicros = Some(30L))
      .select($"tag", $"v").as[(String, Option[Double])].collect().toMap
    assert(global.size == 400 && global == keyed)
  }

  test("globalNearest matches the keyed nearest on a constant key") {
    import spark.implicits._
    // primes keep left/right timestamps interleaved and distinct; one
    // engineered exact-ts collision (160) exercises tie handling
    val baseLeft = (1L to 400L).map(i => (i * 11, s"L$i"))
    val left = (baseLeft :+ ((160L, "Lx")))        // exact-ts collision
      .toDF("tsm", "tag")
      .withColumn("t", timestamp_micros($"tsm")).drop("tsm")
    val right = ((1L to 80L).map(i => (i * 53 + 1, i.toDouble)) :+ ((160L, 999.0)))
      .toDF("tsm", "v")
      .withColumn("t", timestamp_micros($"tsm")).drop("tsm")

    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.select($"tag", $"v").as[(String, Option[Double])].collect().toMap

    val global = asMap(AsofJoin.globalNearest(left, right, "t", "t", Seq("v")))
    val keyed = asMap(AsofJoin.nearest(
      left.withColumn("k", lit(1)), right.withColumn("k", lit(1)),
      Seq("k"), "t", "t", Seq("v")))
    assert(global.size == 401 && global == keyed)
    assert(global("Lx").contains(999.0)) // exact match, distance 0

    // strict mode: the exact-ts candidate must be skipped BOTH ways —
    // this exercises the (nxt, nxtStrict) forward pair
    val strict = asMap(AsofJoin.globalNearest(left, right, "t", "t", Seq("v"),
      allowExactMatches = false))
    val strictKeyed = asMap(AsofJoin.nearest(
      left.withColumn("k", lit(1)), right.withColumn("k", lit(1)),
      Seq("k"), "t", "t", Seq("v"), allowExactMatches = false))
    assert(strict == strictKeyed)
    assert(!strict("Lx").contains(999.0))

    val tol = asMap(AsofJoin.globalNearest(left, right, "t", "t", Seq("v"),
      toleranceMicros = Some(7L)))
    val tolKeyed = asMap(AsofJoin.nearest(
      left.withColumn("k", lit(1)), right.withColumn("k", lit(1)),
      Seq("k"), "t", "t", Seq("v"), toleranceMicros = Some(7L)))
    assert(tol == tolKeyed)
  }
}
