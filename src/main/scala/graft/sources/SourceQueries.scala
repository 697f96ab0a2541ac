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
      case "csv_gz" => // read_csv(compression=) io/common.py get_handle
        src.write.mode("overwrite").option("header", "true")
          .option("compression", "gzip").csv(path)
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

    // read_csv/to_csv with compression='gzip' (io/common.py:494
    // get_handle): codec is a writer option; gzipped parts are
    // per-file streams, so the scan stays splittable at the file level
    "src_csv_gzip" -> { (s, d) => agg(roundTrip(s, d, "csv_gz")) },

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
    },

    // dynamic partition overwrite — the BACKFILL operator (pandas'
    // closest analogue is df.update/combine_first + to_parquet, but at
    // scale a correction never rewrites the table; it replaces exactly
    // the partitions it touches). Write the full table partitioned by
    // status, then overwrite ONLY the F partition with corrected rows
    // (a deterministic bad-record filter) under
    // partitionOverwriteMode=dynamic; O and P must survive untouched —
    // static mode would truncate them, and the oracle's per-status
    // counts catch exactly that.
    "src_partition_overwrite" -> { (s, d) =>
      import s.implicits._
      val path = tmpDir(d, "part_overwrite")
      val orders = Tables(s, d, "orders")
      orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
      val saved = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      try {
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        orders.filter($"o_orderstatus" === "F" && pmod($"o_orderkey", lit(10)) =!= 0)
          .write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
      } finally saved match {
        case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      s.read.parquet(path)
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("sum_price"),
          max($"o_orderkey").as("max_key"))
    },

    // schema-evolution read (mergeSchema): batch 2 of a long-lived
    // dataset gains a column; the merged scan must surface it as null
    // for batch-1 rows — pandas' concat-by-name semantics at the
    // STORAGE layer. mergeSchema pays a footer-read per file at plan
    // time, so production tables pin the schema in a metastore and
    // evolve it there; the per-status counts + the new column's
    // non-null count pin the union-by-name semantics either way.
    "src_merge_schema" -> { (s, d) =>
      import s.implicits._
      val path = tmpDir(d, "merge_schema")
      val orders = Tables(s, d, "orders")
      orders.select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
        .write.mode("overwrite").parquet(s"$path/batch=1")
      orders.select($"o_orderkey", $"o_orderstatus", $"o_totalprice",
          $"o_orderpriority")
        .write.mode("overwrite").parquet(s"$path/batch=2")
      s.read.option("mergeSchema", "true").parquet(path)
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"),
          count($"o_orderpriority").as("n_with_priority"),
          countDistinct($"batch").as("n_batches"),
          dsum($"o_totalprice").as("sum_price"))
    },

    // bucketed tables + co-located join (pandas has no storage-level
    // layout concept — Spark-native capability, SURVEY §4). Both sides
    // are written with bucketBy(8, custkey) + sortBy, so the join
    // consumes the on-disk hash layout: NO Exchange on either side —
    // at 100 TB this is THE strategy for repeated big-big joins on a
    // stable key (pay the shuffle once at write time, never at read).
    // PlanHygieneSpec asserts the shuffle-free plan; the oracle checks
    // the join result against the unbucketed source tables.
    "src_bucketed_join" -> { (s, d) =>
      import s.implicits._
      val suf = Integer.toHexString(d.hashCode)
      val ordersT = s"orders_bkt_$suf"
      val custT = s"customer_bkt_$suf"
      Tables(s, d, "orders").select($"o_custkey", $"o_totalprice")
        .write.mode("overwrite")
        .option("path", tmpDir(d, "bucket_orders"))
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable(ordersT)
      Tables(s, d, "customer").select($"c_custkey", $"c_mktsegment")
        .write.mode("overwrite")
        .option("path", tmpDir(d, "bucket_customer"))
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable(custT)
      s.table(custT)
        .join(s.table(ordersT), $"c_custkey" === $"o_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("sum_price"))
    },

    // read_sql/to_sql (io/sql.py read_sql_table:400, to_sql:841) ->
    // spark.read/write.jdbc against an embedded Derby DB (driver jars
    // ship with Spark). The read uses (partitionColumn, bounds,
    // numPartitions) so the scan fans out as N range-predicate queries
    // — the shape that parallelizes a big table across executors; at
    // cluster scale you'd size numPartitions to the table, not 8.
    "src_jdbc_roundtrip" -> { (s, d) =>
      System.setProperty("derby.system.home", "/tmp/graft_src/derby_home")
      val url = s"jdbc:derby:${tmpDir(d, "derby")}/db;create=true"
      val props = new java.util.Properties()
      props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      val src = Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("o_date_str"))
      src.write.mode("overwrite").jdbc(url, "orders_rt", props)
      agg(s.read
        .option("partitionColumn", "o_orderkey")
        .option("lowerBound", "1")
        .option("upperBound", "6000000")
        .option("numPartitions", "8")
        .jdbc(url, "orders_rt", props))
    },

    // read_csv's option surface (io/parsers/readers.py:1045):
    //   na_values       -> nullValue option (sentinel "N/A" -> NULL)
    //   dtype map       -> explicit read schema (no inference pass)
    //   parse_dates     -> TimestampType in the schema + timestampFormat
    //   skiprows        -> comment='#' (Spark's reader drops marked
    //                      lines anywhere; a distributed scan has no
    //                      "first N physical lines" — preamble rows are
    //                      marked, not positional)
    //   on_bad_lines    -> mode=DROPMALFORMED (schema-violating rows
    //                      dropped at scan time)
    // The fixture CSV is adversarial: '#' preamble lines, deterministic
    // "N/A" prices (o_orderkey % 97 = 0) and unparseable custkeys
    // (o_orderkey % 101 = 0); the oracle applies the same arithmetic to
    // the original table, so every option must actually fire to match.
    "src_csv_opts" -> { (s, d) =>
      import s.implicits._
      val path = tmpDir(d, "csv_opts")
      val lines = Tables(s, d, "orders").select(concat_ws(",",
          $"o_orderkey",
          when($"o_orderkey" % 101 === 0, lit("not_a_number"))
            .otherwise($"o_custkey".cast("string")),
          $"o_orderstatus",
          when($"o_orderkey" % 97 === 0, lit("N/A"))
            .otherwise($"o_totalprice".cast("decimal(18,4)").cast("string")),
          date_format($"o_orderdate", "yyyy-MM-dd HH:mm:ss")).as("value"))
      val preamble = s.createDataset(Seq(
        "# graft csv_opts fixture — preamble line 1",
        "# preamble line 2 (skiprows analogue)")).toDF("value")
      preamble.union(lines).coalesce(4)
        .write.mode("overwrite").text(path)
      import org.apache.spark.sql.types._
      val schema = StructType(Seq( // the dtype= map
        StructField("o_orderkey", LongType),
        StructField("o_custkey", LongType),
        StructField("o_orderstatus", StringType),
        StructField("o_totalprice", DoubleType),
        StructField("o_orderdate", TimestampType)))
      s.read.schema(schema)
        .option("comment", "#")
        .option("nullValue", "N/A")
        .option("mode", "DROPMALFORMED")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(path)
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(when($"o_totalprice".isNull, 1L).otherwise(0L)).as("n_na"),
          dsum($"o_totalprice").as("sum_price"),
          min($"o_orderdate").as("min_date"),
          max($"o_custkey").as("max_cust"))
    },

    // read_fwf (io/parsers/readers.py:1210) -> text scan + substring
    // projection. No fixed-width reader exists in Spark; the idiomatic
    // mapping is a line scan with per-field substring/cast — all
    // codegen'd, pushdown-friendly on the line length, and trivially
    // splittable (each line independent), so it scales like CSV.
    "src_fwf" -> { (s, d) =>
      val path = tmpDir(d, "fwf")
      Tables(s, d, "orders")
        .select(format_string("%10d%10d%-2s%16s%19s",
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice").cast("decimal(18,4)"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss")).as("value"))
        .write.mode("overwrite").text(path)
      val parsed = s.read.text(path).select(
        substring(col("value"), 1, 10).cast("long").as("o_orderkey"),
        substring(col("value"), 11, 10).cast("long").as("o_custkey"),
        trim(substring(col("value"), 21, 2)).as("o_orderstatus"),
        substring(col("value"), 23, 16).cast("decimal(18,4)").cast("double")
          .as("o_totalprice"),
        substring(col("value"), 39, 19).as("o_date_str"))
      agg(parsed)
    }
  )

  def oracle: Map[String, String] = Map(
    "src_csv_roundtrip" -> oracleAgg,
    "src_csv_gzip" -> oracleAgg,
    "src_json_roundtrip" -> oracleAgg,
    "src_orc_roundtrip" -> oracleAgg,
    "src_partitioned_parquet" ->
      """SELECT COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
         FROM orders WHERE o_orderstatus = 'F'""",

    // untouched partitions keep ALL their rows; only F loses the
    // key%10=0 records — a truncating (static-mode) overwrite would
    // zero out O and P
    "src_partition_overwrite" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
         MAX(o_orderkey) AS max_key
         FROM orders
         WHERE o_orderstatus <> 'F' OR o_orderkey % 10 <> 0
         GROUP BY o_orderstatus""",

    "src_merge_schema" ->
      """SELECT o_orderstatus, 2 * COUNT(*) AS n,
         COUNT(*) AS n_with_priority,
         CAST(2 AS BIGINT) AS n_batches,
         CAST(2 * SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY o_orderstatus""",
    "src_bucketed_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
         FROM customer JOIN orders ON c_custkey = o_custkey
         GROUP BY c_mktsegment""",
    "src_jdbc_roundtrip" -> oracleAgg,
    "src_fwf" -> oracleAgg,
    // replay the fixture's deterministic damage on the original rows:
    // %101 rows were malformed (dropped), %97 prices were "N/A" (NULL)
    "src_csv_opts" ->
      """WITH t AS (
           SELECT o_orderstatus,
             CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_totalprice END AS p,
             o_orderdate, o_custkey
           FROM orders WHERE o_orderkey % 101 <> 0)
         SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CASE WHEN p IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_na,
           CAST(SUM(CAST(p AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
           MIN(o_orderdate) AS min_date,
           MAX(o_custkey) AS max_cust
         FROM t GROUP BY o_orderstatus"""
  )
}
