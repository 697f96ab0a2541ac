package graft

/** DataSourceRegister adapters: the interchange formats through the
  * standard spark.read.format / df.write.format / SQL USING surface.
  */
class InterchangeSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) = s"/tmp/graft_test/dsreg_$name"

  test("spark.read.format / df.write.format round-trips every short name") {
    val df = Seq((1L, Option("a"), Option(2.5)), (2L, None, None))
      .toDF("k", "s", "v")
    for (fmt <- Seq("xlsx", "stata", "spss", "xport", "xhtml", "arrows")) {
      val path = tmp(fmt)
      df.write.format(fmt).mode("overwrite").save(path)
      val back = spark.read.format(fmt).load(path)
        .select($"k".cast("long"), $"s", $"v".cast("double"))
      assert(back.collect().toSet == df.collect().toSet, fmt)
    }
  }

  test("SQL CREATE TABLE ... USING xlsx reads the written directory") {
    val df = Seq((10L, "q"), (20L, "r")).toDF("k", "s")
    df.write.format("xlsx").mode("overwrite").save(tmp("sql"))
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW xlsx_t " +
      s"USING xlsx OPTIONS (path '${tmp("sql")}')")
    val got = spark.sql("SELECT CAST(k AS BIGINT) AS k, s FROM xlsx_t ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((10L, "q"), (20L, "r")))
  }

  test("save modes: default errors on existing, Ignore skips, Append refused") {
    val df = Seq((1, "a")).toDF("k", "s")
    val path = tmp("modes")
    df.write.format("stata").mode("overwrite").save(path)
    intercept[Exception] { df.write.format("stata").save(path) } // ErrorIfExists
    // Ignore leaves the existing data untouched
    Seq((9, "z")).toDF("k", "s").write.format("stata").mode("ignore").save(path)
    assert(spark.read.format("stata").load(path)
      .select($"s").as[String].collect().toSeq == Seq("a"))
    val e = intercept[Exception] {
      df.write.format("stata").mode("append").save(path)
    }
    assert(e.getMessage.contains("Append") || e.getCause != null)
  }
}
