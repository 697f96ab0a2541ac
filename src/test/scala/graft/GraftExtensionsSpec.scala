package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The extensions class must give a FRESH session (no manual register
  * calls anywhere) the graft functions and the native as-of strategy —
  * this is the `spark.sql.extensions=graft.GraftExtensions` cluster
  * path. Builds its own session (sharing the JVM's SparkContext) by
  * clearing the active/default session around getOrCreate. */
class GraftExtensionsSpec extends AnyFunSuite {

  private def withExtendedSession[A](f: SparkSession => A): A = {
    // force context creation first so the new session shares it
    val base = SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s ne base, "extensions test needs a fresh session")
      f(s)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("graft_* functions resolve with no manual registration") {
    withExtendedSession { s =>
      import s.implicits._
      val r = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
        .select(call_function("graft_dot", $"a", $"b").as("d"),
          call_function("graft_poly_hash", lit("abc")).as("h"),
          call_function("graft_canon", lit(" A!b  C ")).as("c"),
          size(call_function("graft_rand_project", $"a", lit(4))).as("rp"))
        .collect()(0)
      assert(r.getDouble(0) == 11.0)
      assert(r.getLong(1) == (((('a'.toInt * 31) + 'b') * 31 + 'c') % 1000000007L))
      assert(r.getString(2) == "ab c")
      assert(r.getInt(3) == 4)
    }
  }

  test("native as-of strategy is installed session-wide") {
    withExtendedSession { s =>
      import s.implicits._
      val left = Seq((1L, 10L), (1L, 20L)).toDF("k", "ts")
      val right = Seq((1L, 5L, 1.5), (1L, 15L, 2.5)).toDF("k", "rts", "v")
      // strategy comes from the extensions, not the helper's lazy
      // experimental-strategies injection — but backward() also
      // injects; assert the session ALREADY has it before any call
      val installed = s.sessionState.planner.strategies
        .exists(_.getClass.getName.contains("AsofStrategy"))
      assert(installed, "AsofStrategy missing from planner strategies")
      val df = graft.plans.AsofJoinNative.backward(s, left, right,
        by = Seq("k"), leftTs = "ts", rightTs = "rts", valueCols = Seq("v"))
      val got = df.orderBy("ts").collect().map(_.getDouble(2)).toSeq
      assert(got == Seq(1.5, 2.5))
    }
  }
}
