package graft

import graft.sources.ArrowStream
import org.apache.spark.sql.types._

/** sources/ArrowStream — Arrow IPC stream files through Spark's own
  * Arrow conversion (pandas read_feather/to_feather,
  * io/feather_format.py:36/83). Complements ArrowInterchangeSpec
  * (the in-memory batch bridge) with the on-disk source the
  * src_arrow_roundtrip oracle row checks.
  */
class ArrowStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) = s"/tmp/graft_test/arrows_$name"

  test("round-trips every type binary-exact, including nulls") {
    val df = Seq(
      (1L, Option("alpha"), Option(3.5), Option(7), Option(true),
        Option(java.sql.Timestamp.valueOf("1998-07-04 12:30:45")),
        Option(java.sql.Date.valueOf("1959-12-31"))),
      (2L, Option("βeta 漢"), None, None, Option(false), None, None),
      (3L, None, Option(-0.25), Option(-1), None, None, None)
    ).toDF("k", "s", "v", "i", "b", "ts", "d")
      .select($"k", $"s", $"v", $"i".cast("int").as("i"), $"b", $"ts", $"d")
    ArrowStream.write(df, tmp("rt"))
    val back = ArrowStream.read(spark, tmp("rt"))
    // IPC is binary-typed: schema restores exactly, no cast-back
    assert(back.schema("k").dataType == LongType)
    assert(back.schema("i").dataType == IntegerType)
    assert(back.schema("b").dataType == BooleanType)
    assert(back.schema("ts").dataType == TimestampType)
    assert(back.schema("d").dataType == DateType)
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("caps rows per file and reads all chunks back") {
    val df = (1 to 23).map(i => (i.toLong, s"r$i")).toDF("k", "s").repartition(2)
    ArrowStream.write(df, tmp("cap"), cap = 4)
    val fs = new java.io.File(tmp("cap")).listFiles()
      .filter(_.getName.endsWith(".arrows"))
    assert(fs.length >= 5, s"expected >=5 capped files, got ${fs.length}")
    val back = ArrowStream.read(spark, tmp("cap"))
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("each file is a well-formed standalone IPC stream (magic-free, schema-led)") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "s")
    ArrowStream.write(df.coalesce(1), tmp("ipc"), cap = 10)
    val f = new java.io.File(tmp("ipc")).listFiles()
      .filter(_.getName.endsWith(".arrows")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    // stream format: continuation marker 0xFFFFFFFF leads the schema
    // message; the end-of-stream marker (0xFFFFFFFF 0x00000000) closes
    assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xff &&
      (bytes(2) & 0xff) == 0xff && (bytes(3) & 0xff) == 0xff)
    val n = bytes.length
    assert((bytes(n - 8) & 0xff) == 0xff && (bytes(n - 5) & 0xff) == 0xff &&
      bytes(n - 4) == 0 && bytes(n - 1) == 0,
      "stream must close with the end-of-stream marker")
    // and an independent open via the bridge sees the same rows
    val (rows, schema) = org.apache.spark.sql.GraftSqlBridge.readArrowStream(bytes)
    assert(schema.fieldNames.toSeq == Seq("k", "s"))
    assert(rows.size == 2)
  }

  test("schema comes from a bounded HEADER read, not a whole-file fetch") {
    // round-12 verdict #4: the IPC schema message is by spec the
    // stream's FIRST message, so the driver learns the schema from the
    // leading bytes alone. Pin that by handing the header decoder a
    // stream TRUNCATED right after the schema message — if the decoder
    // needed anything past the header (a record batch, the EOS
    // marker), this would throw.
    val df = (1 to 1000).map(i => (i.toLong, s"r$i", i * 0.5)).toDF("k", "s", "v")
    ArrowStream.write(df.coalesce(1), tmp("hdr"), cap = 2000)
    val f = new java.io.File(tmp("hdr")).listFiles()
      .filter(_.getName.endsWith(".arrows")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    assert(bytes.length > 4096, "file must dwarf the header for the truncation to mean anything")
    val headerOnly = java.util.Arrays.copyOfRange(bytes, 0, 1024)
    val schema = org.apache.spark.sql.GraftSqlBridge.arrowSchemaFromHeader(
      new java.io.ByteArrayInputStream(headerOnly))
    assert(schema.fieldNames.toSeq == Seq("k", "s", "v"))
    assert(schema("k").dataType == LongType)
    assert(schema("v").dataType == DoubleType)
  }

  test("empty frame round-trips as a schema-only stream") {
    val df = Seq((1L, "x")).toDF("k", "s").filter($"k" < 0)
    ArrowStream.write(df, tmp("empty"))
    val back = ArrowStream.read(spark, tmp("empty"))
    assert(back.schema.fieldNames.toSeq == Seq("k", "s"))
    assert(back.count() == 0)
  }
}
