package graft.sources

import graft.{QueryModule, Tables}
import graft.OracleNum._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink surface (SURVEY.md §2.1).
  *
  * Reference: pandas `io/parsers` (read_csv C tokenizer),
  * `io/json/_json.py`, `io/parquet.py`, `io/orc.py`. Spark's readers
  * replace the whole layer — schema'd parallel scans with pushdown.
  * Each query here round-trips the parquet testdata through another
  * format into /tmp and aggregates the re-read copy; the oracle runs
  * on the *original* table, so any serialization loss (precision,
  * nulls, timestamps) fails the hash compare.
  */
object SourceQueries extends QueryModule {

  private def tmpDir(d: String, fmt: String): String =
    s"/tmp/graft_src/${Integer.toHexString(d.hashCode)}/$fmt"

  private def roundTrip(s: SparkSession, d: String, fmt: String): DataFrame = {
    import s.implicits._
    val src = Tables(s, d, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice",
        // CSV has no timestamp type fidelity guarantee across writers;
        // serialize explicitly and parse back below
        date_format($"o_orderdate", "yyyy-MM-dd HH:mm:ss").as("o_date_str"))
    val path = tmpDir(d, fmt)
    fmt match {
      case "csv" =>
        src.write.mode("overwrite").option("header", "true").csv(path)
        s.read.option("header", "true").schema(src.schema).csv(path)
      case "json" =>
        src.write.mode("overwrite").json(path)
        s.read.schema(src.schema).json(path)
      case "orc" =>
        src.write.mode("overwrite").orc(path)
        s.read.orc(path)
    }
  }

  private def agg(df: DataFrame): DataFrame =
    df.withColumn("o_orderdate", to_timestamp(col("o_date_str"), "yyyy-MM-dd HH:mm:ss"))
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("sum_price"),
        min(col("o_orderdate")).as("min_date"),
        max(col("o_custkey")).as("max_cust"))

  private val oracleAgg =
    """SELECT o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
       MIN(o_orderdate) AS min_date,
       MAX(o_custkey) AS max_cust
       FROM orders GROUP BY o_orderstatus"""

  def queries: Map[String, Q] = Map(
    // read_csv / to_csv (io/parsers/readers.py:1045; C tokenizer
    // _libs/parsers.pyx) -> schema'd spark.read.csv
    "src_csv_roundtrip" -> { (s, d) => agg(roundTrip(s, d, "csv")) },

    // read_json lines (io/json/_json.py:524) -> spark.read.json
    "src_json_roundtrip" -> { (s, d) => agg(roundTrip(s, d, "json")) },

    // read_orc (io/orc.py:40) -> spark.read.orc
    "src_orc_roundtrip" -> { (s, d) => agg(roundTrip(s, d, "orc")) },

    // partitioned parquet sink + partition-pruned scan (pandas has no
    // partitioning concept — Spark-native capability, SURVEY §4)
    "src_partitioned_parquet" -> { (s, d) =>
      import s.implicits._
      val path = tmpDir(d, "part_parquet")
      Tables(s, d, "orders")
        .write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
      s.read.parquet(path)
        .filter($"o_orderstatus" === "F") // partition-pruned scan
        .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("sum_price"))
    }
  )

  def oracle: Map[String, String] = Map(
    "src_csv_roundtrip" -> oracleAgg,
    "src_json_roundtrip" -> oracleAgg,
    "src_orc_roundtrip" -> oracleAgg,
    "src_partitioned_parquet" ->
      """SELECT COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
         FROM orders WHERE o_orderstatus = 'F'"""
  )
}
