package graft.pipeline

import graft.{QueryModule, Tables}
import graft.OracleNum._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One-pass-per-column data profiling — the `df.info()` +
  * `df.nunique()` + `df.describe(include='all')` composite every
  * ingest pipeline runs before touching 100 TB of new data
  * (reference: `core/frame.py:3562` info, `core/base.py:1055` nunique).
  *
  * Shape at scale: one column-pruned aggregate per profiled column,
  * UNION ALL'd. Total I/O equals a single full-width scan, but each
  * pass reads exactly one column (`ReadSchema` pins this), the
  * per-column exact `COUNT(DISTINCT)` gets its own partial-agg
  * pipeline instead of one Expand node multiplying the scan by the
  * number of profiled columns, and stragglers parallelize per column.
  * min/max/count/distinct all partial-aggregate map-side, so the
  * shuffle per column is O(partitions), not O(rows).
  */
object ProfileQueries extends QueryModule {

  /** per-column profile row: stats unified into one schema
    * (strings via a canonical text render, numerics also get a mean) */
  private def profileCol(df: DataFrame, name: String, c: Column,
      render: Column => Column, meanOf: Option[Column] = None): DataFrame = {
    val d = df.select(c.as("v"))
    d.agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - count(col("v"))).as("n_null"),
      countDistinct(col("v")).as("n_distinct"),
      render(min(col("v"))).as("min_s"),
      render(max(col("v"))).as("max_s"),
      meanOf.getOrElse(lit(null).cast("double")).as("mean_v"))
      .select(lit(name).as("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"), col("mean_v"))
  }

  /** canonical text renders shared with the oracle: doubles through
    * DECIMAL(18,4) (both engines print a fixed scale-4 form),
    * timestamps/longs/strings via plain CAST AS VARCHAR */
  private def asIs(c: Column): Column = c.cast("string")
  private def dec4(c: Column): Column = c.cast(DecimalType(18, 4)).cast("string")

  def queries: Map[String, Q] = Map(
    "pipe_profile" -> { (s, d) =>
      import s.implicits._
      val li = Tables(s, d, "lineitem")
      // NULLIF-derived column exercises the null accounting (the
      // synthetic tables carry no natural nulls)
      val discN = when($"l_discount" === 0.0, lit(null))
        .otherwise($"l_discount")
      Seq(
        profileCol(li, "l_returnflag", $"l_returnflag", asIs),
        profileCol(li, "l_quantity", $"l_quantity", dec4,
          Some(round(dsum($"v") / count($"v"), 6))),
        profileCol(li, "l_shipdate", $"l_shipdate", asIs),
        profileCol(li, "l_orderkey", $"l_orderkey", asIs,
          Some(round(dsum8($"v") / count($"v"), 6))),
        profileCol(li, "l_discount_null", discN, dec4,
          Some(round(dsum($"v") / count($"v"), 6)))
      ).reduce(_ unionAll _)
    },

    // data-quality expectations (the Great-Expectations-style contract
    // gate an ingest pipeline runs before accepting a batch): each
    // rule is a map-side predicate counted in ONE scan of the fact
    // table, except referential integrity which is one anti-join
    // (bloom-prunable at scale, see dedup_incremental). Passing rules
    // report 0 — a pass is as informative as a violation count.
    "pipe_expectations" -> { (s, d) =>
      import s.implicits._
      val li = Tables(s, d, "lineitem")
      val scanRules = li.agg(
        sum(when($"l_orderkey".isNull, 1L).otherwise(0L)).as("not_null_orderkey"),
        sum(when(!$"l_quantity".between(1, 49), 1L).otherwise(0L)).as("range_quantity"),
        sum(when(!$"l_returnflag".isin("A", "R"), 1L).otherwise(0L)).as("set_returnflag"),
        (count(lit(1)) - countDistinct($"l_orderkey" * 10 + $"l_linenumber"))
          .as("unique_order_line"))
      val unpivoted = Seq("not_null_orderkey", "range_quantity",
        "set_returnflag", "unique_order_line").map(r =>
        scanRules.select(lit(r).as("rule"), col(r).as("n_violations")))
        .reduce(_ unionAll _)
      val orphans = li.join(Tables(s, d, "orders"),
          li("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("ref_orders").as("rule"), $"n_violations")
      unpivoted.unionAll(orphans)
    }
  )

  def oracle: Map[String, String] = Map(
    "pipe_profile" -> {
      def row(name: String, expr: String, render: String => String,
          mean: String): String = {
        s"""SELECT '$name' AS col_name, COUNT(*) AS n_rows,
            COUNT(*) - COUNT(${expr}) AS n_null,
            COUNT(DISTINCT ${expr}) AS n_distinct,
            ${render(s"MIN(${expr})")} AS min_s,
            ${render(s"MAX(${expr})")} AS max_s,
            $mean AS mean_v FROM lineitem"""
      }
      val asIs = (e: String) => s"CAST($e AS VARCHAR)"
      val dec4 = (e: String) => s"CAST(CAST($e AS DECIMAL(18,4)) AS VARCHAR)"
      val noMean = "CAST(NULL AS DOUBLE)"
      def dmean(e: String) =
        s"ROUND(CAST(SUM(CAST($e AS DECIMAL(18,4))) AS DOUBLE) / COUNT($e), 6)"
      def dmean8(e: String) =
        s"ROUND(CAST(SUM(CAST($e AS DECIMAL(38,8))) AS DOUBLE) / COUNT($e), 6)"
      Seq(
        row("l_returnflag", "l_returnflag", asIs, noMean),
        row("l_quantity", "l_quantity", dec4, dmean("l_quantity")),
        row("l_shipdate", "l_shipdate", asIs, noMean),
        row("l_orderkey", "l_orderkey", asIs, dmean8("l_orderkey")),
        row("l_discount_null", "NULLIF(l_discount, 0.0)", dec4,
          dmean("NULLIF(l_discount, 0.0)"))
      ).mkString(" UNION ALL ")
    },

    "pipe_expectations" ->
      """SELECT 'not_null_orderkey' AS rule,
           CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations FROM lineitem
         UNION ALL
         SELECT 'range_quantity',
           CAST(SUM(CASE WHEN l_quantity NOT BETWEEN 1 AND 49 THEN 1 ELSE 0 END) AS BIGINT)
           FROM lineitem
         UNION ALL
         SELECT 'set_returnflag',
           CAST(SUM(CASE WHEN l_returnflag NOT IN ('A','R') THEN 1 ELSE 0 END) AS BIGINT)
           FROM lineitem
         UNION ALL
         SELECT 'unique_order_line',
           COUNT(*) - COUNT(DISTINCT l_orderkey * 10 + l_linenumber)
           FROM lineitem
         UNION ALL
         SELECT 'ref_orders', COUNT(*) FROM lineitem
         WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)"""
  )
}
