package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** read_html / to_html (pandas io/html.py:1023, io/formats/html.py) as
  * a distributed source/sink over WELL-FORMED XHTML tables.
  *
  * pandas' read_html is a scraping tool for small in-page tables;
  * its honest distributed shape is "a directory of many HTML
  * documents, one parsed per task", not "one 100 TB HTML file":
  *
  *  - WRITE: each partition renders ONE self-contained XHTML document
  *    (thead carries the column names, tbody one tr per row) — the
  *    exact layout `to_html` produces, parallel across partitions,
  *    written through the text sink.
  *  - READ: `spark.read.option("wholetext", true).text` hands each
  *    document to one task; parsing uses scala-xml (on Spark's own
  *    classpath), header names come from thead, and every cell is a
  *    string — HTML is stringly-typed on the wire, so callers apply a
  *    schema by casting, the same discipline as the CSV/XML
  *    round-trips.
  *
  * Nulls round-trip as empty cells (cast back to NULL for non-string
  * types). Cell text is entity-escaped on write, so values containing
  * markup survive.
  */
object HtmlTable {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Render df (all columns as strings) to one XHTML doc per
    * partition under `path` (overwrite semantics). */
  def write(df: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions.col
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val cols = df.columns.toSeq
    val strDf = df.select(cols.map(c => col(c).cast("string").as(c)): _*)
    val head = cols.map(c => s"<th>${esc(c)}</th>").mkString
    val docs = strDf.rdd.mapPartitions { it =>
      val sb = new StringBuilder
      sb.append("<html><body><table><thead><tr>").append(head)
        .append("</tr></thead><tbody>")
      var any = false
      it.foreach { r =>
        any = true
        sb.append("<tr>")
        (0 until r.length).foreach { i =>
          val v = if (r.isNullAt(i)) "" else esc(r.getString(i))
          sb.append("<td>").append(v).append("</td>")
        }
        sb.append("</tr>")
      }
      sb.append("</tbody></table></body></html>")
      // an empty partition still emits a headed, bodyless table —
      // harmless on read, and the file count stays = partition count
      Iterator.single(sb.toString)
    }
    docs.saveAsTextFile(path)
  }

  /** Parse every XHTML doc under `path` (one doc per task) into a
    * DataFrame of strings named by the thead header. */
  def read(s: SparkSession, path: String): DataFrame = {
    val docs = s.read.option("wholetext", "true").text(path)
      .rdd.map(_.getString(0)).filter(_.trim.nonEmpty)
    // header from one doc (all docs share it by construction — ONE
    // tiny driver read); the row-cell PARSING stays distributed,
    // one document per task
    val first = scala.xml.XML.loadString(docs.first())
    val header = (first \\ "thead" \\ "th").map(_.text)
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val rows = docs.flatMap { doc =>
      val x = scala.xml.XML.loadString(doc)
      (x \\ "tbody" \\ "tr").iterator.map { tr =>
        val cells = (tr \ "td").map(_.text).toArray[String]
        Row.fromSeq(cells.map(c => if (c.isEmpty) null else c).toSeq)
      }
    }
    s.createDataFrame(rows, schema)
  }
}
