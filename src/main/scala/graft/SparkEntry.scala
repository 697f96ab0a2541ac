package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._
import graft.pipeline._
import graft.sources.SourceQueries
import graft.streaming.StreamQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  private val modules: Seq[QueryModule] = Seq(
    AggQueries,
    SelectQueries,
    JoinQueries,
    TpchQueries,
    WindowQueries,
    NaQueries,
    SetQueries,
    ReshapeQueries,
    TimeQueries,
    StringQueries,
    DedupQueries,
    CurationQueries,
    PackQueries,
    SimilarityQueries,
    TextQueries,
    RetrievalQueries,
    ProfileQueries,
    BpeQueries,
    MultimodalQueries,
    SourceQueries,
    StreamQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_groupby_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracle).toMap
}
