package graft

import org.apache.spark.sql.functions._

/** tz_localize/tz_convert mapping (generic.py:11263/11161 ->
  * from_utc_timestamp/to_utc_timestamp). No portable DuckDB oracle
  * (session-timezone coupling), so the semantics are pinned here
  * against hand-computed instants, including a DST boundary.
  */
class TzSpec extends SparkSpec {

  test("from_utc_timestamp converts wall clock including DST") {
    import spark.implicits._
    val out = Seq(
      "2024-01-15 12:00:00", // EST: UTC-5
      "2024-07-15 12:00:00"  // EDT: UTC-4
    ).toDF("s")
      .select(from_utc_timestamp($"s".cast("timestamp"), "America/New_York").as("ny"))
      .select(date_format($"ny", "yyyy-MM-dd HH:mm").as("f"))
      .as[String].collect()
    assert(out(0) == "2024-01-15 07:00")
    assert(out(1) == "2024-07-15 08:00")
  }

  test("to_utc_timestamp is the inverse") {
    import spark.implicits._
    val out = Seq("2024-01-15 07:00:00").toDF("s")
      .select(to_utc_timestamp($"s".cast("timestamp"), "America/New_York").as("utc"))
      .select(date_format($"utc", "yyyy-MM-dd HH:mm").as("f"))
      .as[String].collect()
    assert(out(0) == "2024-01-15 12:00")
  }
}
