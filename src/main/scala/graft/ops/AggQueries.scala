package graft.ops

import graft.{OracleNum, QueryModule, Tables}
import org.apache.spark.sql.functions._
import OracleNum._

/** GroupBy/aggregation surface (SURVEY.md §2.4).
  *
  * Reference: pandas `core/groupby/` + `_libs/groupby.pyx` kernels —
  * single-node, single-pass over factorized group codes. Here every
  * aggregate is a Catalyst HashAggregate with map-side partial
  * aggregation followed by a shuffle on the group keys, which is the
  * scale-out replacement for the reference's code-based kernels.
  */
object AggQueries extends QueryModule {

  def queries: Map[String, Q] = Map(
    // pandas: df.query(...).groupby([...]).agg(sum/mean/count) — TPC-H Q1 shape.
    // groupby/generic.py:2091 aggregate; kernels groupby.pyx:720 (sum), :1209 (mean)
    "q1_groupby_agg" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          dsum8(dec($"l_extendedprice") * (lit(1).cast("decimal(20,4)") - dec($"l_discount"))).as("sum_disc_price"),
          dmean($"l_quantity").as("avg_qty"),
          dmean($"l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }
  )

  def oracle: Map[String, String] = Map(
    "q1_groupby_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(20,4)) * (CAST(1 AS DECIMAL(20,4)) - CAST(l_discount AS DECIMAL(20,4))) AS DECIMAL(28,8))) AS DOUBLE) AS sum_disc_price,
         CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
         CAST(SUM(CAST(l_discount AS DECIMAL(20,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
         COUNT(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus"""
  )
}
