package graft

import graft.sources.SasXport
import org.apache.spark.sql.types._

/** sources/SasXport — pure-JDK SAS Transport (TS-140) source.
  * Reference semantics: pandas io/sas/sas_xport.py:253 (XportReader).
  */
class SasXportSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) = s"/tmp/graft_test/xpt_$name"

  test("IBM hex-float conversion is an exact involution on doubles") {
    val vals = Seq(0.0, 1.0, -1.0, 0.1, -0.25, 3.14159265358979,
      1e-10, -1e10, 123456789.123456, 6.02214076e23, Double.MinPositiveValue * 1e300)
    vals.foreach { v =>
      val back = SasXport.ibmToIeee(SasXport.ieeeToIbm(v))
      assert(back == v, s"$v -> $back")
    }
    // the canonical known encoding: 1.0 = 0x4110000000000000
    assert(SasXport.ieeeToIbm(1.0) == 0x4110000000000000L)
  }

  test("round-trips numerics, strings, nulls; long names restored from labels") {
    val df = Seq(
      (1L, Option("alpha"), Option(3.5)),
      (2L, Option("βeta"), None),
      (3L, None, Option(-0.25))
    ).toDF("order_key_long_name", "status_text", "total_price")
    SasXport.write(df, tmp("rt"))
    val back = SasXport.read(spark, tmp("rt"))
    assert(back.schema.fieldNames.toSeq ==
      Seq("order_key_long_name", "status_text", "total_price"))
    val cast = back.select($"order_key_long_name".cast("long"),
      $"status_text", $"total_price")
    assert(cast.collect().toSet == df.collect().toSet)
  }

  test("timestamps ride DATETIME (1960 seconds) and dates DATE (1960 days)") {
    val df = Seq(
      (1, Option(java.sql.Timestamp.valueOf("1998-07-04 12:30:45")),
        Option(java.sql.Date.valueOf("1959-12-31"))),
      (2, None, None)
    ).toDF("k", "ts", "d")
    SasXport.write(df, tmp("dt"))
    val back = SasXport.read(spark, tmp("dt"))
    assert(back.schema("ts").dataType == TimestampType)
    assert(back.schema("d").dataType == DateType)
    assert(back.select($"k".cast("int"), $"ts", $"d").collect().toSet ==
      df.collect().toSet)
  }

  test("caps rows per member and reads all chunks; blank-tail rows survive via NOBS") {
    // rows whose char field is null end in blanks — exactly the
    // ambiguity the NOBS label removes (pandas' word heuristic can
    // drop such rows)
    val df = (1 to 23).map(i =>
      (i, if (i % 5 == 0) None else Some(s"r$i"))).toDF("k", "s").repartition(2)
    SasXport.write(df, tmp("cap"), cap = 4)
    val files = new java.io.File(tmp("cap")).listFiles()
      .filter(_.getName.endsWith(".xpt"))
    assert(files.length >= 5)
    val back = SasXport.read(spark, tmp("cap")).select($"k".cast("int"), $"s")
    assert(back.count() == 23)
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("all 80-byte card framing holds (file length multiple of 80, headers aligned)") {
    val df = Seq((1, "abc"), (2, "de")).toDF("k", "s")
    SasXport.write(df, tmp("frame"), cap = 10)
    val f = new java.io.File(tmp("frame")).listFiles()
      .filter(_.getName.endsWith(".xpt")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    assert(bytes.length % 80 == 0)
    def card(i: Int) = new String(bytes, i * 80, 80, "US-ASCII")
    assert(card(0).startsWith("HEADER RECORD*******LIBRARY"))
    assert(card(3).startsWith("HEADER RECORD*******MEMBER"))
    assert(card(4).startsWith("HEADER RECORD*******DSCRPTR"))
    assert(card(7).startsWith("HEADER RECORD*******NAMESTR"))
    assert(card(7).substring(54, 58) == "0002")
  }
  test("reads members declaring 136-byte NAMESTR records (VAX/VMS stride)") {
    // the NAMESTR record length is declared in the member header card
    // (pandas reads header1[-5:-2], sas_xport.py:319-320); 140 on most
    // platforms, 136 on VMS. Hardcoding 140 would decode such files at
    // the wrong stride into garbage widths/offsets.
    val df = Seq((1.0, Option("aa")), (2.0, None)).toDF("num", "txt")
    SasXport.write(df.coalesce(1), tmp("ns136src"))
    val f = new java.io.File(tmp("ns136src")).listFiles()
      .filter(_.getName.endsWith(".xpt")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val k = 2
    val base = 8 * 80
    val oldNs = ((k * 140 + 79) / 80) * 80
    // rebuild: member card declares 136, records packed at 136 stride
    // (the dropped tail is filler — real fields end well before 136)
    val head = java.util.Arrays.copyOfRange(bytes, 0, base)
    val member = new String(head, 3 * 80, 80, "US-ASCII")
    val patched = (member.substring(0, 75) + "136" + member.substring(78))
      .getBytes("US-ASCII")
    System.arraycopy(patched, 0, head, 3 * 80, 80)
    val out = new java.io.ByteArrayOutputStream()
    out.write(head)
    val ns = new java.io.ByteArrayOutputStream()
    (0 until k).foreach(i => ns.write(bytes, base + i * 140, 136))
    while (ns.size() % 80 != 0) ns.write(' ')
    out.write(ns.toByteArray)
    out.write(bytes, base + oldNs, bytes.length - base - oldNs)
    val dir = new java.io.File(tmp("ns136")); dir.mkdirs()
    java.nio.file.Files.write(new java.io.File(dir, "m.xpt").toPath, out.toByteArray)
    val back = SasXport.read(spark, tmp("ns136"))
    assert(back.schema.fieldNames.toSeq == Seq("num", "txt"))
    assert(back.select($"num", $"txt").collect().toSet == df.collect().toSet)
  }

  test("rejects an undeclared or absurd NAMESTR record length loudly") {
    val df = Seq((1.0, "x")).toDF("n", "s")
    SasXport.write(df, tmp("nsbad"))
    val f = new java.io.File(tmp("nsbad")).listFiles()
      .filter(_.getName.endsWith(".xpt")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val member = new String(bytes, 3 * 80, 80, "US-ASCII")
    val patched = (member.substring(0, 75) + "128" + member.substring(78))
      .getBytes("US-ASCII")
    System.arraycopy(patched, 0, bytes, 3 * 80, 80)
    val dir = new java.io.File(tmp("nsbad2")); dir.mkdirs()
    java.nio.file.Files.write(new java.io.File(dir, "m.xpt").toPath, bytes)
    val e = intercept[Exception] { SasXport.read(spark, tmp("nsbad2")).collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("NAMESTR record length")))
  }

  test("empty frame round-trips as a NOBS=0 member") {
    val df = Seq((1, "x")).toDF("k", "s").filter($"k" < 0)
    SasXport.write(df, tmp("empty"))
    val back = SasXport.read(spark, tmp("empty"))
    assert(back.schema.fieldNames.toSeq == Seq("k", "s"))
    assert(back.count() == 0)
  }
  test("non-ASCII column names pad byte-exact in the NAMESTR label") {
    val df = Seq((1.5, "x")).toDF("prix_unité_éè", "s")
    SasXport.write(df, tmp("uni"))
    val back = SasXport.read(spark, tmp("uni"))
    assert(back.schema.fieldNames.toSeq == Seq("prix_unité_éè", "s"))
    assert(back.select($"s").as[String].collect().toSeq == Seq("x"))
  }
}
