package graft

import graft.sources.Xlsx
import org.apache.spark.sql.Row

/** sources/Xlsx — the pure-JDK read_excel/to_excel surface.
  * Reference semantics: pandas io/excel/_base.py:93 (read_excel),
  * :478 (to_excel via ExcelWriter).
  */
class XlsxSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) = s"/tmp/graft_test/xlsx_$name"

  test("round-trips values, nulls, markup and unicode") {
    val df = Seq(
      (1L, Option("plain"), Option(3.5)),
      (2L, Option("<b>&amp; markup</b>"), None),
      (3L, None, Option(-0.25)),
      (4L, Option("šđčß 漢字"), Option(1e9))
    ).toDF("k", "s", "v")
    Xlsx.write(df, tmp("rt"))
    val back = Xlsx.read(spark, tmp("rt"))
      .select($"k".cast("long"), $"s", $"v".cast("double"))
    assert(back.schema.fieldNames.toSeq == Seq("k", "s", "v"))
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("control characters _xHHHH_-encode (ECMA-376) and round-trip") {
    // XML 1.0 cannot carry U+0001 etc. at all — written raw, the
    // workbook's sheet XML is unparseable and the whole directory
    // becomes unreadable. OOXML's escape is _xHHHH_; a literal
    // _x0041_ in the data must survive too (via _x005F_ encoding).
    val df = Seq(
      (1L, Option("a\u0001b")),
      (2L, Option("tab\tand\nnewline stay literal")),
      (3L, Option("literal _x0041_ not an A")),
      (4L, Option("\u0000\u001f edges"))
    ).toDF("k", "s")
    Xlsx.write(df, tmp("ctrl"))
    val back = Xlsx.read(spark, tmp("ctrl")).select($"k".cast("long"), $"s")
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("XML-illegal non-control chars encode too: lone surrogates, U+FFFE/FFFF") {
    // XML 1.0's Char production excludes surrogate code points and
    // U+FFFE/U+FFFF just like control chars — written raw they corrupt
    // the workbook for the read-side parser (openpyxl rejects them
    // too). Lone surrogates arrive via broken UTF-16 slicing; PAIRED
    // surrogates (legal astral chars) must keep round-tripping, each
    // unit encoded separately as Excel itself does (round-12 ADVICE).
    val df = Seq(
      (1L, Option("lone high \ud800 surrogate")),
      (2L, Option("lone low \udc00 surrogate")),
      (3L, Option("bom-swap \ufffe and \uffff sentinels")),
      (4L, Option("paired emoji 😀 stays one char"))
    ).toDF("k", "s")
    Xlsx.write(df, tmp("illegal"))
    val back = Xlsx.read(spark, tmp("illegal")).select($"k".cast("long"), $"s")
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("caps rows per workbook and reads all chunks back") {
    val df = (1 to 25).map(i => (i.toLong, s"row$i")).toDF("k", "s")
      .repartition(2)
    Xlsx.write(df, tmp("cap"), cap = 5)
    val fs = new java.io.File(tmp("cap")).listFiles()
      .filter(_.getName.endsWith(".xlsx"))
    assert(fs.length >= 5, s"expected >=5 capped workbooks, got ${fs.length}")
    val back = Xlsx.read(spark, tmp("cap")).select($"k".cast("long"), $"s")
    assert(back.count() == 25)
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("reads externally-authored workbooks: sharedStrings, numeric, boolean, sparse refs") {
    // hand-build the workbook shape Excel/openpyxl produce: a
    // shared-strings table, plain numeric cells (no t=), a boolean,
    // and a sparse row that skips column B (position from r=)
    val dir = new java.io.File(tmp("ext")); dir.mkdirs()
    val f = new java.io.File(dir, "book.xlsx")
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(f))
    def entry(name: String, body: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(body.getBytes("UTF-8")); zos.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/></Types>""")
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4"><si><t>name</t></si><si><t>score</t></si><si><t>ok</t></si><si><r><t>ri</t></r><r><t>ch</t></r></si></sst>""")
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>""" +
        """<row r="2"><c r="A2" t="s"><v>3</v></c><c r="B2"><v>41.5</v></c><c r="C2" t="b"><v>1</v></c></row>""" +
        """<row r="3"><c r="A3" t="inlineStr"><is><t>x</t></is></c><c r="C3" t="b"><v>0</v></c></row>""" +
        """</sheetData></worksheet>""")
    zos.close()
    val back = Xlsx.read(spark, tmp("ext"))
    assert(back.schema.fieldNames.toSeq == Seq("name", "score", "ok"))
    val rows = back.collect().toSet
    assert(rows == Set(
      Row("rich", "41.5", "true"),   // shared rich-text runs concatenate
      Row("x", null, "false")        // sparse row: B absent -> null
    ))
  }

  test("column letters cover the multi-letter range") {
    assert(Xlsx.colLetters(0) == "A")
    assert(Xlsx.colLetters(25) == "Z")
    assert(Xlsx.colLetters(26) == "AA")
    assert(Xlsx.colLetters(701) == "ZZ")
    assert(Xlsx.colLetters(702) == "AAA")
  }
  test("empty frame round-trips as a header-only workbook") {
    val df = Seq((1L, "x")).toDF("k", "s").filter($"k" < 0)
    graft.sources.Xlsx.write(df, tmp("empty"))
    val back = graft.sources.Xlsx.read(spark, tmp("empty"))
    assert(back.schema.fieldNames.toSeq == Seq("k", "s"))
    assert(back.count() == 0)
  }
}
