package graft

import graft.sources.SpssSav
import org.apache.spark.sql.types._

/** sources/SpssSav — pure-JDK SPSS system-file source (the reader
  * pandas io/spss.py:17 delegates to pyreadstat, plus the writer
  * pandas lacks). Format: PSPP manual "System File Format".
  */
class SpssSavSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) = s"/tmp/graft_test/sav_$name"

  test("round-trips numerics, strings (incl >8 byte), nulls; long names survive") {
    val df = Seq(
      (1L, Option("short"), Option(3.5)),
      (2L, Option("a considerably longer string value 漢字"), None),
      (3L, None, Option(-0.25))
    ).toDF("order_key_long_name", "status_text", "total_price")
    SpssSav.write(df, tmp("rt"))
    val back = SpssSav.read(spark, tmp("rt"))
    // subtype-13 record restores the real (>8 char) column names
    assert(back.schema.fieldNames.toSeq ==
      Seq("order_key_long_name", "status_text", "total_price"))
    assert(back.schema("order_key_long_name").dataType == DoubleType)
    val cast = back.select($"order_key_long_name".cast("long"),
      $"status_text", $"total_price")
    assert(cast.collect().toSet == df.collect().toSet)
  }

  test("timestamps ride DATETIME (sav epoch seconds) and dates DATE") {
    val df = Seq(
      (1, Option(java.sql.Timestamp.valueOf("1998-07-04 12:30:45")),
        Option(java.sql.Date.valueOf("1969-07-20"))),
      (2, None, None)
    ).toDF("k", "ts", "d")
    SpssSav.write(df, tmp("dt"))
    val back = SpssSav.read(spark, tmp("dt"))
    assert(back.schema("ts").dataType == TimestampType)
    assert(back.schema("d").dataType == DateType)
    assert(back.select($"k".cast("int"), $"ts", $"d").collect().toSet ==
      df.collect().toSet)
  }

  test("caps rows per file and reads all chunks back") {
    val df = (1 to 23).map(i => (i, s"r$i")).toDF("k", "s").repartition(2)
    SpssSav.write(df, tmp("cap"), cap = 4)
    val files = new java.io.File(tmp("cap")).listFiles()
      .filter(_.getName.endsWith(".sav"))
    assert(files.length >= 5)
    val back = SpssSav.read(spark, tmp("cap")).select($"k".cast("int"), $"s")
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("reads bias-compressed files (the bytecode SPSS itself writes)") {
    // hand-build a compression=1 file: two numeric vars, two cases:
    //   case 1: 5.0 (code 105 = bias+5), SYSMIS (255)
    //   case 2: literal 1234.5 (253 + 8-byte element), 42.0 (code 142)
    val dir = new java.io.File(tmp("comp")); dir.mkdirs()
    val bo = new java.io.ByteArrayOutputStream()
    def w4(v: Int): Unit = { bo.write(v & 0xff); bo.write((v >>> 8) & 0xff)
      bo.write((v >>> 16) & 0xff); bo.write((v >>> 24) & 0xff) }
    def w8d(v: Double): Unit = { val b = java.lang.Double.doubleToLongBits(v)
      (0 until 8).foreach(i => bo.write(((b >>> (8 * i)) & 0xff).toInt)) }
    def pad(s: String, w: Int): Unit = { val b = s.getBytes("UTF-8")
      bo.write(b); (b.length until w).foreach(_ => bo.write(' ')) }
    pad("$FL2", 4); pad("test", 60); w4(2); w4(2); w4(1); w4(0); w4(2)
    w8d(100.0); pad("01 Jan 70", 9); pad("00:00:00", 8); pad("", 64); pad("", 3)
    Seq("X", "Y").foreach { nm =>
      w4(2); w4(0); w4(0); w4(0); w4((5 << 16) | (8 << 8) | 2)
      w4((5 << 16) | (8 << 8) | 2); pad(nm, 8)
    }
    w4(999); w4(0)
    // command block: 105, 255, 253, 142, then padding zeros
    Seq(105, 255, 253, 142, 0, 0, 0, 0).foreach(bo.write)
    w8d(1234.5) // the literal for command 253
    java.nio.file.Files.write(new java.io.File(dir, "c.sav").toPath, bo.toByteArray)
    val back = SpssSav.read(spark, tmp("comp"))
    assert(back.schema.fieldNames.toSeq == Seq("X", "Y"))
    val rows = back.collect().map(r =>
      (Option(r.get(0)), Option(r.get(1)))).toSet
    assert(rows == Set(
      (Some(5.0), None),
      (Some(1234.5), Some(42.0))))
  }

  test("skips value-label (3/4) and document (6) dictionary records") {
    // real SPSS/pyreadstat files very commonly carry these; they
    // label values but hold no data, so the reader must skip, not
    // throw. Layouts per the PSPP manual ("Value Labels Records",
    // "Document Record").
    val dir = new java.io.File(tmp("vlab")); dir.mkdirs()
    val bo = new java.io.ByteArrayOutputStream()
    def w4(v: Int): Unit = { bo.write(v & 0xff); bo.write((v >>> 8) & 0xff)
      bo.write((v >>> 16) & 0xff); bo.write((v >>> 24) & 0xff) }
    def w8d(v: Double): Unit = { val b = java.lang.Double.doubleToLongBits(v)
      (0 until 8).foreach(i => bo.write(((b >>> (8 * i)) & 0xff).toInt)) }
    def pad(s: String, w: Int): Unit = { val b = s.getBytes("UTF-8")
      bo.write(b); (b.length until w).foreach(_ => bo.write(' ')) }
    pad("$FL2", 4); pad("test", 60); w4(2); w4(1); w4(0); w4(0); w4(2)
    w8d(100.0); pad("01 Jan 70", 9); pad("00:00:00", 8); pad("", 64); pad("", 3)
    w4(2); w4(0); w4(0); w4(0); w4((5 << 16) | (8 << 8) | 2)
    w4((5 << 16) | (8 << 8) | 2); pad("X", 8)
    // type 3: two labeled values; label block pads so len+1 % 8 == 0
    w4(3); w4(2)
    w8d(1.0); bo.write(3); pad("yes", 7)          // len+1=4  -> 8-byte block
    w8d(2.0); bo.write(10); pad("negatory!!", 15) // len+1=11 -> 16-byte block
    // type 4: the companion variable-index record
    w4(4); w4(1); w4(1)
    // type 6: two 80-byte document lines
    w4(6); w4(2); pad("first documentation line", 80); pad("second line", 80)
    w4(999); w4(0)
    w8d(5.0); w8d(2.0) // two uncompressed cases
    java.nio.file.Files.write(new java.io.File(dir, "v.sav").toPath, bo.toByteArray)
    val back = SpssSav.read(spark, tmp("vlab"))
    assert(back.schema.fieldNames.toSeq == Seq("X"))
    assert(back.collect().map(_.getDouble(0)).toSet == Set(5.0, 2.0))
  }

  test("rejects integral values beyond exact-double range") {
    val df = Seq(((1L << 53) + 1, "x")).toDF("k", "s")
    val e = intercept[org.apache.spark.SparkException] {
      SpssSav.write(df, tmp("range"))
    }
    assert(e.getMessage.contains("double") || e.getCause != null)
  }
  test("empty frame round-trips as a zero-case file") {
    val df = Seq((1, "x")).toDF("k", "s").filter($"k" < 0)
    SpssSav.write(df, tmp("empty"))
    val back = SpssSav.read(spark, tmp("empty"))
    assert(back.schema.fieldNames.toSeq == Seq("k", "s"))
    assert(back.count() == 0)
  }
}
