package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession, SQLContext}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** Spark data-source registration for the interchange formats, so the
  * standard source API works end to end:
  *
  * {{{
  *   spark.read.format("xlsx").load(path)          // pd.read_excel
  *   df.write.format("stata").mode("overwrite").save(path)
  *   spark.sql("CREATE TABLE t USING spss OPTIONS (path '...')")
  * }}}
  *
  * Each provider is a thin adapter over the corresponding object in
  * this package ([[Xlsx]], [[StataDta]], [[SpssSav]], [[SasXport]],
  * [[HtmlTable]]) — schema comes from one driver-side read of the
  * first file's header/dictionary, scan and write stay distributed
  * (one file per task / one capped file per partition chunk).
  *
  * Save modes: Overwrite replaces the directory (the writers' native
  * semantics); ErrorIfExists (the default) and Ignore check the
  * target first. Append is refused loudly — chunk file names are
  * deterministic per partition, so a second batch would overwrite
  * the first's files rather than extend them; these are interchange
  * formats, not accumulating tables.
  */
abstract class InterchangeSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister with Serializable {

  protected def readImpl(s: SparkSession, path: String): DataFrame
  protected def writeImpl(df: DataFrame, path: String): Unit

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      s"$shortName source requires a path"))

  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val df = readImpl(ctx.sparkSession, pathOf(parameters))
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = df.schema
      override def buildScan(): RDD[Row] = df.rdd
    }
  }

  override def createRelation(ctx: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val path = pathOf(parameters)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(ctx.sparkSession.sparkContext.hadoopConfiguration)
    mode match {
      case SaveMode.Append => throw new UnsupportedOperationException(
        s"$shortName: Append is not supported (deterministic chunk names " +
          "would overwrite the previous batch) — use mode('overwrite'), or " +
          "write each batch to its own directory")
      case SaveMode.ErrorIfExists if fs.exists(p) =>
        throw new IllegalStateException(s"$shortName: $path already exists " +
          "(default ErrorIfExists mode)")
      case SaveMode.Ignore if fs.exists(p) => // leave as-is
      case _ => writeImpl(data, path)
    }
    createRelation(ctx, parameters)
  }
}

/** `format("xlsx")` — Excel workbooks (pandas read_excel/to_excel). */
class XlsxSourceProvider extends InterchangeSource {
  override def shortName(): String = "xlsx"
  override protected def readImpl(s: SparkSession, path: String): DataFrame =
    Xlsx.read(s, path)
  override protected def writeImpl(df: DataFrame, path: String): Unit =
    Xlsx.write(df, path)
}

/** `format("stata")` — Stata dta-118 (pandas read_stata/to_stata). */
class StataSourceProvider extends InterchangeSource {
  override def shortName(): String = "stata"
  override protected def readImpl(s: SparkSession, path: String): DataFrame =
    StataDta.read(s, path)
  override protected def writeImpl(df: DataFrame, path: String): Unit =
    StataDta.write(df, path)
}

/** `format("spss")` — SPSS system files (pandas read_spss). */
class SpssSourceProvider extends InterchangeSource {
  override def shortName(): String = "spss"
  override protected def readImpl(s: SparkSession, path: String): DataFrame =
    SpssSav.read(s, path)
  override protected def writeImpl(df: DataFrame, path: String): Unit =
    SpssSav.write(df, path)
}

/** `format("xport")` — SAS Transport (pandas read_sas format="xport"). */
class XportSourceProvider extends InterchangeSource {
  override def shortName(): String = "xport"
  override protected def readImpl(s: SparkSession, path: String): DataFrame =
    SasXport.read(s, path)
  override protected def writeImpl(df: DataFrame, path: String): Unit =
    SasXport.write(df, path)
}

/** `format("xhtml")` — XHTML tables (pandas read_html/to_html). */
class HtmlSourceProvider extends InterchangeSource {
  override def shortName(): String = "xhtml"
  override protected def readImpl(s: SparkSession, path: String): DataFrame =
    HtmlTable.read(s, path)
  override protected def writeImpl(df: DataFrame, path: String): Unit =
    HtmlTable.write(df, path)
}

/** `format("arrows")` — Arrow IPC stream files (pandas
  * read_feather/to_feather's IPC format, stream flavor). */
class ArrowSourceProvider extends InterchangeSource {
  override def shortName(): String = "arrows"
  override protected def readImpl(s: SparkSession, path: String): DataFrame =
    ArrowStream.read(s, path)
  override protected def writeImpl(df: DataFrame, path: String): Unit =
    ArrowStream.write(df, path)
}
