package graft

import graft.sources.StataDta
import org.apache.spark.sql.types._

/** sources/StataDta — pure-JDK dta-118 read_stata/to_stata.
  * Reference semantics: pandas io/stata.py:1023 (StataReader),
  * :2100 (StataWriter/117+ -> StataWriterUTF8 for 118).
  */
class StataDtaSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) = s"/tmp/graft_test/dta_$name"

  test("round-trips every mapped type including nulls") {
    val df = Seq(
      (1L, Option("alpha"), Option(3.5), Option(7), Option(true)),
      (2L, Option("βeta 漢"), None, None, Option(false)),
      (3L, None, Option(-0.25), Option(-1), None)
    ).toDF("k", "s", "v", "i", "b")
      .select($"k", $"s", $"v", $"i".cast("int").as("i"), $"b")
    StataDta.write(df, tmp("rt"))
    val back = StataDta.read(spark, tmp("rt"))
    // dta is binary-typed: longs come back int32, booleans as byte
    assert(back.schema("k").dataType == IntegerType)
    assert(back.schema("s").dataType == StringType)
    assert(back.schema("v").dataType == DoubleType)
    assert(back.schema("b").dataType == ByteType)
    val cast = back.select($"k".cast("long"), $"s", $"v",
      $"i".cast("int"), ($"b" === 1).as("b"))
    assert(cast.collect().toSet == df.collect().toSet)
  }

  test("timestamps ride %tc (ms since 1960) and dates %td, nulls preserved") {
    val df = Seq(
      (1, Option(java.sql.Timestamp.valueOf("1998-07-04 12:30:45")),
        Option(java.sql.Date.valueOf("1959-12-31"))),
      (2, None, None)
    ).toDF("k", "ts", "d")
    StataDta.write(df, tmp("tc"))
    val back = StataDta.read(spark, tmp("tc"))
    assert(back.schema("ts").dataType == TimestampType)
    assert(back.schema("d").dataType == DateType)
    assert(back.select($"k".cast("int"), $"ts", $"d").collect().toSet ==
      df.collect().toSet)
  }

  test("caps rows per file and reads all chunks back") {
    val df = (1 to 23).map(i => (i, s"r$i")).toDF("k", "s").repartition(2)
    StataDta.write(df, tmp("cap"), cap = 4)
    val fs = new java.io.File(tmp("cap")).listFiles()
      .filter(_.getName.endsWith(".dta"))
    assert(fs.length >= 5, s"expected >=5 capped dta files, got ${fs.length}")
    val back = StataDta.read(spark, tmp("cap")).select($"k".cast("int"), $"s")
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("int64 beyond Stata's long range sidecasts to double, like pandas") {
    // io/stata.py:481 _cast_to_stata_types: int64 -> float64 when
    // outside int32; decided frame-wide so every chunk agrees
    val df = Seq((3000000000L, 1L), (-5L, 2L)).toDF("big", "small")
    StataDta.write(df, tmp("sidecast"))
    val back = StataDta.read(spark, tmp("sidecast"))
    assert(back.schema("big").dataType == DoubleType)   // sidecast
    assert(back.schema("small").dataType == IntegerType) // still long
    assert(back.select($"big".cast("long"), $"small".cast("long"))
      .collect().toSet == df.collect().toSet)
  }

  test("byte/short values in Stata's missing-code space widen, not corrupt") {
    // io/stata.py:473-477: int8 max>100 or min<-127 -> int16; int16
    // max>32740 or min<-32767 -> int32. Written raw, 101 IS Stata's
    // '.' for bytes and would silently read back as NULL.
    val df = Seq(
      (1, 101.toByte, 32741.toShort),
      (2, (-128).toByte, (-32768).toShort),
      (3, 7.toByte, 9.toShort)
    ).toDF("k", "b", "s")
      .select($"k", $"b".cast("byte").as("b"), $"s".cast("short").as("s"))
    StataDta.write(df, tmp("widen"))
    val back = StataDta.read(spark, tmp("widen"))
    assert(back.schema("b").dataType == ShortType)  // byte -> dta int
    assert(back.schema("s").dataType == IntegerType) // short -> dta long
    assert(back.select($"k".cast("int"), $"b".cast("byte"), $"s".cast("short"))
      .collect().toSet == df.collect().toSet)
  }

  test("byte/short within native range keep their narrow dta types") {
    val df = Seq((1, 100.toByte, 32740.toShort), (2, (-127).toByte, (-32767).toShort))
      .toDF("k", "b", "s")
      .select($"k", $"b".cast("byte").as("b"), $"s".cast("short").as("s"))
    StataDta.write(df, tmp("narrow"))
    val back = StataDta.read(spark, tmp("narrow"))
    assert(back.schema("b").dataType == ByteType)
    assert(back.schema("s").dataType == ShortType)
    assert(back.select($"k".cast("int"), $"b", $"s").collect().toSet ==
      df.collect().toSet)
  }

  test("longs at the negative edge of Stata's range write plain, not crash") {
    // valid long range is [-2147483647, 2147483620]; the per-row guard
    // must match the scan's bound (a |v|-based check would reject
    // legal values in [-2147483647, -2147483621] mid-write)
    val df = Seq((-2147483647L, 1L), (2147483620L, 2L)).toDF("edge", "k")
    StataDta.write(df, tmp("negedge"))
    val back = StataDta.read(spark, tmp("negedge"))
    assert(back.schema("edge").dataType == IntegerType) // no sidecast
    assert(back.select($"edge".cast("long"), $"k".cast("long"))
      .collect().toSet == df.collect().toSet)
  }

  test("sidecast fails loudly past 2^53 instead of silently losing precision") {
    val df = Seq(((1L << 53) + 1, "x")).toDF("k", "s")
    val e = intercept[org.apache.spark.SparkException] {
      StataDta.write(df, tmp("range"))
    }
    assert(e.getMessage.contains("exact-integer") || e.getCause != null)
  }

  test("map offsets are exact (reader can seek by the map)") {
    val df = Seq((1, "a"), (2, "bb")).toDF("k", "s")
    StataDta.write(df, tmp("map"), cap = 10)
    val f = new java.io.File(tmp("map")).listFiles()
      .filter(_.getName.endsWith(".dta")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // <map> payload starts right after the "<map>" tag
    val mapTag = "<map>".getBytes("US-ASCII")
    val mapAt = (0 until bytes.length - 5).find(i =>
      mapTag.indices.forall(j => bytes(i + j) == mapTag(j))).get
    bb.position(mapAt + 5)
    val offs = (0 until 14).map(_ => bb.getLong)
    assert(offs(1) == mapAt)                       // <map> offset
    assert(offs(13) == bytes.length)               // EOF
    def tagAt(off: Long, tag: String): Boolean =
      tag.getBytes("US-ASCII").zipWithIndex.forall { case (b, j) => bytes(off.toInt + j) == b }
    assert(tagAt(offs(2), "<variable_types>"))
    assert(tagAt(offs(9), "<data>"))
    assert(tagAt(offs(12), "</stata_dta>"))
  }
  test("empty frame round-trips as a zero-observation file") {
    val df = Seq((1, "x")).toDF("k", "s").filter($"k" < 0)
    StataDta.write(df, tmp("empty"))
    val back = StataDta.read(spark, tmp("empty"))
    assert(back.schema.fieldNames.toSeq == Seq("k", "s"))
    assert(back.count() == 0)
  }
}
