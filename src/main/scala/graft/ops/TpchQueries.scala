package graft.ops

import graft.{QueryModule, Tables}
import org.apache.spark.sql.functions._

/** TPC-H-shaped composite queries, part 2: the remaining classic
  * decision-support shapes expressible on the fixture schema (Q3, Q5,
  * Q13 and Q18 live in [[JoinQueries]]). Together they
  * exercise every plan family a warehouse workload hits: scan-only
  * aggregate (Q6), correlated EXISTS (Q4), nation-pair multi-join
  * (Q7), ratio-of-aggregates market share (Q8, Q14), top-k revenue
  * (Q10), argmax-by-aggregate (Q15), distinct-count rollup with an
  * exclusion anti-join (Q16), correlated-average filter (Q17),
  * OR-of-conjuncts join predicate (Q19), anti-join over an
  * aggregate threshold (Q22), per-group argmin join-back (Q2 shape),
  * multi-dim profit rollup (Q9 shape), group-sum vs global-fraction
  * HAVING (Q11 shape), conditional two-class count (Q12 shape), and
  * correlated half-of-sum semi-join chain (Q20 shape), and the
  * exists/not-exists waiting-supplier self-join (Q21). With those,
  * every one of the 22 TPC-H query shapes runs on this engine
  * (partsupp-dependent ones re-anchored on lineitem as the
  * part-supplier fact, date-window ones on l_shipdate vs
  * o_orderdate lateness).
  *
  * Scale discipline (same rules as the rest of the repo): dimensions
  * broadcast, the fact table shuffles only on fact-side keys, revenue
  * terms are exact narrow decimals ((11,4) x (6,4) stays on the int64
  * multiply path in both engines) so ordering and equality on
  * aggregates are ulp-safe, and correlated predicates multiply through
  * by the count instead of comparing division results.
  *
  * Reference: pandas users express these as chained merge/groupby
  * pipelines (pandas/core/reshape/merge.py, groupby/groupby.py); the
  * declarative forms here let Catalyst pick broadcast vs shuffle per
  * side at any scale factor.
  */
object TpchQueries extends QueryModule {

  def queries: Map[String, Q] = Map(
    // Q6 (forecast revenue change): pure scan-filter-aggregate — every
    // predicate pushes into the parquet scan, the aggregate is a
    // 1-group partial/final pair. The plan to beat at 100 TB is "read
    // the pruned columns, keep nothing".
    "q6_forecast_revenue" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "lineitem")
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
          $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
          $"l_quantity" < 24)
        // round in DECIMAL space, then cast: the sum is an exact
        // scale-8 decimal, and a value landing exactly on a half at
        // the rounding scale diverges across engines if rounded as a
        // double (Spark rounds the shortest decimal string, DuckDB the
        // binary value — the txt_dsir_weights sf100 find, SCALE.md r10)
        .agg(round(sum($"l_extendedprice".cast("decimal(11,4)") *
          $"l_discount".cast("decimal(6,4)")), 4).cast("double")
          .as("revenue"))
    },

    // Q4 (order priority checking): correlated EXISTS — orders in a
    // quarter with at least one line shipped >60 days after the order
    // date. Planned as a semi join on the order key with the date
    // inequality as a residual; the priority histogram partial-aggs.
    "q4_priority_exists" -> { (s, d) =>
      import s.implicits._
      val ord = Tables(s, d, "orders")
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1996-04-01").cast("timestamp"))
      val li = Tables(s, d, "lineitem").select($"l_orderkey", $"l_shipdate")
      ord.join(li, $"o_orderkey" === $"l_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    },

    // Q7 (volume shipping): nation-pair trade flows in both
    // directions. Supplier/customer dims (nation-filtered, tiny)
    // broadcast; the fact shuffles once on the orders key.
    "q7_nation_volume" -> { (s, d) =>
      import s.implicits._
      val nat = Tables(s, d, "nation")
        .filter($"n_name".isin("NATION_1", "NATION_2"))
      val sup = Tables(s, d, "supplier")
        .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"n_name".as("supp_nation"))
      val cust = Tables(s, d, "customer")
        .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
        .select($"c_custkey", $"n_name".as("cust_nation"))
      val ord = Tables(s, d, "orders").select($"o_orderkey", $"o_custkey")
      Tables(s, d, "lineitem")
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
        .select($"l_orderkey", $"l_suppkey", $"l_shipdate",
          ($"l_extendedprice".cast("decimal(11,4)") *
            (lit(1.0) - $"l_discount").cast("decimal(6,4)")).as("rev"))
        .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .filter(($"supp_nation" === "NATION_1" && $"cust_nation" === "NATION_2") ||
          ($"supp_nation" === "NATION_2" && $"cust_nation" === "NATION_1"))
        .groupBy($"supp_nation", $"cust_nation",
          year($"l_shipdate").cast("long").as("l_year"))
        .agg(round(sum($"rev"), 4).cast("double").as("revenue"))
    },

    // Q8 (national market share): NATION_2's share of ECONOMY-part
    // revenue sold to ASIA customers, per order year. Ratio of two
    // decimal-exact sums, divided once in double.
    "q8_market_share" -> { (s, d) =>
      import s.implicits._
      val asia = Tables(s, d, "region").filter($"r_name" === "ASIA")
      val custNat = Tables(s, d, "nation")
        .join(broadcast(asia), $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey")
      val cust = Tables(s, d, "customer")
        .join(broadcast(custNat), $"c_nationkey" === $"n_nationkey")
        .select($"c_custkey")
      val sup = Tables(s, d, "supplier")
        .join(broadcast(Tables(s, d, "nation")), $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"n_name".as("supp_nation"))
      val prt = Tables(s, d, "part")
        .filter($"p_type" === "ECONOMY").select($"p_partkey")
      val ord = Tables(s, d, "orders")
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
        .select($"o_orderkey", $"o_custkey", $"o_orderdate")
      Tables(s, d, "lineitem")
        .select($"l_orderkey", $"l_partkey", $"l_suppkey",
          ($"l_extendedprice".cast("decimal(11,4)") *
            (lit(1.0) - $"l_discount").cast("decimal(6,4)")).as("rev"))
        .join(broadcast(prt), $"l_partkey" === $"p_partkey")
        .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .groupBy(year($"o_orderdate").cast("long").as("o_year"))
        .agg(round(
          sum(when($"supp_nation" === "NATION_2", $"rev")
            .otherwise(lit(0).cast("decimal(17,8)"))).cast("double") /
            sum($"rev").cast("double"), 6).as("mkt_share"))
    },

    // Q10 (returned item reporting): revenue lost to returns per
    // customer in a quarter, top 20. TakeOrderedAndProject on the
    // rounded decimal revenue; custkey tiebreak pins the boundary.
    "q10_returned_top" -> { (s, d) =>
      import s.implicits._
      val nat = Tables(s, d, "nation").select($"n_nationkey", $"n_name")
      val ord = Tables(s, d, "orders")
        .filter($"o_orderdate" >= lit("1996-07-01").cast("timestamp") &&
          $"o_orderdate" < lit("1996-10-01").cast("timestamp"))
        .select($"o_orderkey", $"o_custkey")
      val li = Tables(s, d, "lineitem")
        .filter($"l_returnflag" === "R")
        .select($"l_orderkey",
          ($"l_extendedprice".cast("decimal(11,4)") *
            (lit(1.0) - $"l_discount").cast("decimal(6,4)")).as("rev"))
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(Tables(s, d, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
        .agg(round(sum($"rev"), 4).cast("double").as("revenue"))
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    },

    // Q14 (promotion effect): PROMO-type share of one month's revenue.
    // One broadcast join, one 1-group aggregate.
    "q14_promo_share" -> { (s, d) =>
      import s.implicits._
      val prt = Tables(s, d, "part").select($"p_partkey", $"p_type")
      Tables(s, d, "lineitem")
        .filter($"l_shipdate" >= lit("1996-09-01").cast("timestamp") &&
          $"l_shipdate" < lit("1996-10-01").cast("timestamp"))
        .select($"l_partkey",
          ($"l_extendedprice".cast("decimal(11,4)") *
            (lit(1.0) - $"l_discount").cast("decimal(6,4)")).as("rev"))
        .join(broadcast(prt), $"l_partkey" === $"p_partkey")
        .agg(round(lit(100.0) *
          sum(when($"p_type" === "PROMO", $"rev")
            .otherwise(lit(0).cast("decimal(17,8)"))).cast("double") /
          sum($"rev").cast("double"), 6).as("promo_revenue"))
    },

    // Q15 (top supplier): quarterly revenue per supplier, keep the
    // argmax. The max is a 1-row aggregate joined back by exact
    // decimal equality — no global sort, no window over one partition.
    "q15_top_supplier" -> { (s, d) =>
      import s.implicits._
      val rev = Tables(s, d, "lineitem")
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
        .groupBy($"l_suppkey")
        .agg(sum($"l_extendedprice".cast("decimal(11,4)") *
          (lit(1.0) - $"l_discount").cast("decimal(6,4)")).as("r"))
      val mx = rev.agg(max($"r").as("mx"))
      rev.join(broadcast(mx), $"r" === $"mx")
        .join(Tables(s, d, "supplier"), $"l_suppkey" === $"s_suppkey")
        .select($"s_suppkey", $"s_name",
          round($"r", 4).cast("double").as("total_rev"))
    },

    // Q16 (parts/supplier relationship): distinct suppliers per
    // (brand, type, size) bucket, lineitem standing in for partsupp,
    // negative-balance suppliers excluded by an anti join before the
    // distinct-count rollup.
    "q16_parts_supplier_cnt" -> { (s, d) =>
      import s.implicits._
      val badSup = Tables(s, d, "supplier")
        .filter($"s_acctbal" < 0).select($"s_suppkey".as("bad_sk"))
      val ps = Tables(s, d, "lineitem")
        .select($"l_partkey", $"l_suppkey").distinct()
        .join(broadcast(badSup), $"l_suppkey" === $"bad_sk", "left_anti")
      val prt = Tables(s, d, "part")
        .filter($"p_brand" =!= "Brand#1" &&
          $"p_size".isin(1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49))
        .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
      ps.join(broadcast(prt), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand", $"p_type", $"p_size")
        .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
    },

    // Q17 (small-quantity-order revenue): lines whose quantity is
    // under 20% of the part's average. The correlated average is an
    // aggregate joined back; the comparison multiplies through by
    // 5*count so it stays in exact decimal (no division ulp).
    "q17_small_qty" -> { (s, d) =>
      import s.implicits._
      val prt = Tables(s, d, "part")
        .filter($"p_brand" === "Brand#3" && $"p_type" === "SMALL")
        .select($"p_partkey")
      val lip = Tables(s, d, "lineitem")
        .join(broadcast(prt), $"l_partkey" === $"p_partkey")
        .select($"l_partkey", $"l_quantity", $"l_extendedprice")
      val st = lip.groupBy($"l_partkey".as("sp"))
        .agg(sum($"l_quantity".cast("decimal(18,4)")).as("sq"),
          count(lit(1)).as("cnt"))
      lip.join(st, $"l_partkey" === $"sp")
        .filter($"l_quantity".cast("decimal(18,4)") * (lit(5L) * $"cnt") < $"sq")
        .agg(round(sum($"l_extendedprice".cast("decimal(18,4)"))
          .cast("double") / 7.0, 4).as("avg_yearly"))
    },

    // Q19 (discounted revenue, disjunctive predicate): equi join on
    // the part key with an OR-of-conjuncts residual — one hash join,
    // the disjunction never degrades to a nested loop.
    "q19_disjunct_revenue" -> { (s, d) =>
      import s.implicits._
      val prt = Tables(s, d, "part")
        .select($"p_partkey", $"p_brand", $"p_size")
      Tables(s, d, "lineitem")
        .select($"l_partkey", $"l_quantity",
          ($"l_extendedprice".cast("decimal(11,4)") *
            (lit(1.0) - $"l_discount").cast("decimal(6,4)")).as("rev"))
        .join(broadcast(prt), $"l_partkey" === $"p_partkey")
        .filter(
          ($"p_brand" === "Brand#1" && $"p_size".between(1, 5) &&
            $"l_quantity".between(1, 11)) ||
          ($"p_brand" === "Brand#2" && $"p_size".between(1, 10) &&
            $"l_quantity".between(10, 20)) ||
          ($"p_brand" === "Brand#3" && $"p_size".between(1, 15) &&
            $"l_quantity".between(20, 30)))
        .agg(round(sum($"rev"), 4).cast("double").as("revenue"))
    },

    // Q22 (global sales opportunity): customers above the positive-
    // balance average with no recent orders — scalar aggregate
    // broadcast as the threshold, then an anti join, then a
    // per-nation rollup. The average divides two exact quantities, so
    // both engines compare against the identical double. (The classic
    // "no orders at all" form is degenerate on this fixture — every
    // customer has at least one order — so the anti join is against
    // the final-year order book, same plan shape, non-empty result.)
    // Q21 (suppliers who kept orders waiting): the exists/not-exists
    // self-join composition — the one classic join shape the table
    // lacked through round 9. pandas expresses the two correlated
    // subqueries as merge(indicator=True) passes over a per-order
    // groupby (reshape/merge.py:149, frame.py:4956); here BOTH
    // subqueries collapse into ONE per-order aggregate over the same
    // shuffle, with min/max in place of count-distinct:
    //   EXISTS (other supplier in order)      ⟺ min(supp) ≠ max(supp)
    //   NOT EXISTS (other supplier late)      ⟺ the late-supplier set
    //     is exactly {l1.supp} ⟺ min(late supp) = max(late supp)
    //     (l1 is itself late, so the set is non-empty)
    // so lineitem shuffles ONCE on l_orderkey; the orders join, the
    // per-order aggregate, and the join-back all reuse that
    // partitioning; supplier⋈nation broadcasts. "Late" re-anchors on
    // l_shipdate > o_orderdate + 60 days (the fixture schema has no
    // receipt/commit dates), same convention as Q4.
    "q21_waiting_suppliers" -> { (s, d) =>
      import s.implicits._
      val lo = Tables(s, d, "lineitem")
        .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
        .join(Tables(s, d, "orders")
            .filter($"o_orderstatus" === "F")
            .select($"o_orderkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .withColumn("late",
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"))
      val ordAgg = lo.groupBy($"l_orderkey".as("ok"))
        .agg(min($"l_suppkey").as("smin"), max($"l_suppkey").as("smax"),
          min(when($"late", $"l_suppkey")).as("lmin"),
          max(when($"late", $"l_suppkey")).as("lmax"))
      val waiting = lo.filter($"late")
        .join(ordAgg, $"l_orderkey" === $"ok" &&
          $"smin" =!= $"smax" && $"lmin" === $"lmax")
      val supp = Tables(s, d, "supplier")
        .join(Tables(s, d, "nation"), $"s_nationkey" === $"n_nationkey")
        .filter($"n_name".isin("NATION_1", "NATION_2", "NATION_3",
          "NATION_4", "NATION_5"))
        .select($"s_suppkey", $"s_name")
      waiting.join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"s_name")
        .limit(100)
    },

    "q22_global_sales" -> { (s, d) =>
      import s.implicits._
      val cand = Tables(s, d, "customer")
        .filter($"c_nationkey".isin(1, 3, 5, 7, 9, 11, 13))
      val avgPos = cand.filter($"c_acctbal" > 0)
        .agg((sum($"c_acctbal".cast("decimal(18,4)")).cast("double") /
          count(lit(1))).as("ab"))
      val recent = Tables(s, d, "orders")
        .filter($"o_orderdate" >= lit("2001-01-01").cast("timestamp"))
        .select($"o_custkey")
      cand.join(broadcast(avgPos), $"c_acctbal" > $"ab")
        .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_nationkey".cast("long").as("cntry"))
        .agg(count(lit(1)).as("numcust"),
          round(sum($"c_acctbal".cast("decimal(18,4)")), 4).cast("double")
            .as("totacctbal"))
    },

    // Q2 shape (minimum-cost supplier): for each qualifying part, the
    // supplier with the minimum account balance among those who have
    // actually shipped it (lineitem stands in for partsupp, acctbal
    // for supplycost). The correlated MIN is a grouped aggregate
    // joined back by exact equality — per-group argmin without a
    // window, the same pattern as Q15 but keyed.
    "q2_min_cost_supplier" -> { (s, d) =>
      import s.implicits._
      val prt = Tables(s, d, "part")
        .filter($"p_type" === "LARGE" && $"p_size" < 15)
        .select($"p_partkey", $"p_brand", $"p_size")
      val ps = Tables(s, d, "lineitem")
        .select($"l_partkey", $"l_suppkey").distinct()
        .join(broadcast(prt), $"l_partkey" === $"p_partkey")
        .join(Tables(s, d, "supplier"), $"l_suppkey" === $"s_suppkey")
        .select($"p_partkey", $"p_brand", $"p_size", $"s_suppkey",
          $"s_name", $"s_acctbal".cast("decimal(18,4)").as("bal"))
      val mn = ps.groupBy($"p_partkey".as("mp"))
        .agg(min($"bal").as("mb"))
      ps.join(mn, $"p_partkey" === $"mp" && $"bal" === $"mb")
        // a balance tie would duplicate the part row; keep the lowest
        // supplier key, deterministically, via a second keyed argmin
        .groupBy($"p_partkey", $"p_brand", $"p_size")
        .agg(min($"s_suppkey").as("s_suppkey"),
          round(min($"bal"), 2).cast("double").as("s_acctbal"))
    },

    // Q9 shape (product-type profit): profit per supplier nation and
    // order year over a name-filtered part subset; p_retailprice
    // stands in for ps_supplycost. Dimensions broadcast; the fact
    // shuffles once for the orders join, then partial-aggregates.
    "q9_product_profit" -> { (s, d) =>
      import s.implicits._
      val prt = Tables(s, d, "part")
        .filter($"p_name".like("%red%"))
        .select($"p_partkey",
          $"p_retailprice".cast("decimal(12,4)").as("cost"))
      val sup = Tables(s, d, "supplier")
        .join(broadcast(Tables(s, d, "nation")),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"n_name".as("nation"))
      val ord = Tables(s, d, "orders").select($"o_orderkey", $"o_orderdate")
      Tables(s, d, "lineitem")
        .select($"l_orderkey", $"l_partkey", $"l_suppkey",
          $"l_quantity".cast("decimal(12,4)").as("qty"),
          ($"l_extendedprice".cast("decimal(11,4)") *
            (lit(1.0) - $"l_discount").cast("decimal(6,4)")).as("rev"))
        .join(broadcast(prt), $"l_partkey" === $"p_partkey")
        .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"nation", year($"o_orderdate").cast("long").as("o_year"))
        .agg(round(sum($"rev") -
          sum(($"cost" * $"qty").cast("decimal(26,8)")), 4).cast("double")
          .as("sum_profit"))
    },

    // Q11 shape (important stock identification): per-part inventory
    // value restricted to one nation's suppliers, keeping parts whose
    // value exceeds a fixed fraction of the national total. The HAVING
    // threshold is a 1-row scalar aggregate broadcast into the filter;
    // the comparison multiplies through by the fraction's reciprocal
    // so both engines compare exact decimals, no division.
    "q11_important_stock" -> { (s, d) =>
      import s.implicits._
      val sup = Tables(s, d, "supplier")
        .filter($"s_nationkey".isin(1, 2, 3))
        .select($"s_suppkey")
      val value = Tables(s, d, "lineitem")
        .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
        .select($"l_partkey",
          ($"l_extendedprice".cast("decimal(11,4)") *
            $"l_quantity".cast("decimal(8,2)")).as("v"))
      val byPart = value.groupBy($"l_partkey")
        .agg(sum($"v").as("value"))
      val total = byPart.agg(sum($"value").as("tot"))
      byPart.join(broadcast(total),
          $"value" * lit(1000) > $"tot")  // value > 0.1% of total
        .select($"l_partkey".as("p_partkey"),
          round($"value", 4).cast("double").as("value"))
    },

    // Q12 shape (shipping-mode priority classes): late lines (shipped
    // >30 days after the order date) bucketed by line status, counting
    // urgent vs non-urgent orders. The classic two-class conditional
    // count over a fact-fact equi join; no l_shipmode/commitdate in
    // this fixture, so l_linestatus and ship-lateness stand in.
    "q12_late_priority" -> { (s, d) =>
      import s.implicits._
      val ord = Tables(s, d, "orders")
        .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      Tables(s, d, "lineitem")
        .select($"l_orderkey", $"l_linestatus", $"l_shipdate")
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 30 DAYS") &&
          $"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
        .groupBy($"l_linestatus")
        .agg(
          sum(when($"o_orderpriority" === "1-URGENT" ||
            $"o_orderpriority" === "2-HIGH", 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when($"o_orderpriority" =!= "1-URGENT" &&
            $"o_orderpriority" =!= "2-HIGH", 1L).otherwise(0L))
            .as("low_line_count"))
    },

    // Q20 shape (potential part promotion): suppliers dominating some
    // part's shipped volume — a correlated fraction-of-sum threshold
    // (5*supplier_qty > part_total, exact decimal — a >20% share, since
    // the classic >50%-of-a-year is degenerate on this fixture's ~30
    // evenly-spread lines per part) feeding a semi join back into the
    // supplier dimension. Both aggregates come from ONE scan of the
    // fact, and the threshold join is partkey-to-partkey, never wide.
    "q20_excess_suppliers" -> { (s, d) =>
      import s.implicits._
      val li = Tables(s, d, "lineitem")
        .select($"l_partkey", $"l_suppkey",
          $"l_quantity".cast("decimal(18,4)").as("qty"))
      val bySupp = li.groupBy($"l_partkey", $"l_suppkey")
        .agg(sum($"qty").as("sq"))
      val byPart = li.groupBy($"l_partkey".as("tp"))
        .agg(sum($"qty").as("tq"))
      val excess = bySupp.join(byPart,
          $"l_partkey" === $"tp" && $"sq" * lit(5) > $"tq")
        .select($"l_suppkey").distinct()
      Tables(s, d, "supplier")
        .join(excess, $"s_suppkey" === $"l_suppkey", "left_semi")
        .select($"s_suppkey", $"s_name")
    }
  )

  def oracle: Map[String, String] = Map(
    "q6_forecast_revenue" ->
      """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(11,4)) *
           CAST(l_discount AS DECIMAL(6,4))), 4) AS DOUBLE) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",

    "q4_priority_exists" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
         FROM orders o
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1996-04-01'
           AND EXISTS (
             SELECT 1 FROM lineitem l
             WHERE l.l_orderkey = o.o_orderkey
               AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
         GROUP BY o_orderpriority""",

    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(11,4)) *
             CAST(1.0 - l_discount AS DECIMAL(6,4))), 4) AS DOUBLE) AS revenue
         FROM supplier, lineitem, orders, customer, nation n1, nation n2
         WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
           AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
           AND c_nationkey = n2.n_nationkey
           AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
           AND l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
         GROUP BY 1, 2, 3""",

    "q8_market_share" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           ROUND(CAST(SUM(CASE WHEN n2.n_name = 'NATION_2'
               THEN CAST(l_extendedprice AS DECIMAL(11,4)) *
                 CAST(1.0 - l_discount AS DECIMAL(6,4))
               ELSE CAST(0 AS DECIMAL(17,8)) END) AS DOUBLE) /
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(11,4)) *
               CAST(1.0 - l_discount AS DECIMAL(6,4))) AS DOUBLE), 6)
             AS mkt_share
         FROM part, lineitem, supplier, orders, customer, nation n1,
           nation n2, region
         WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
           AND l_orderkey = o_orderkey AND o_custkey = c_custkey
           AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
           AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
           AND p_type = 'ECONOMY'
         GROUP BY 1""",

    "q10_returned_top" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(11,4)) *
             CAST(1.0 - l_discount AS DECIMAL(6,4))), 4) AS DOUBLE) AS revenue
         FROM customer, orders, lineitem, nation
         WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND o_orderdate >= TIMESTAMP '1996-07-01'
           AND o_orderdate < TIMESTAMP '1996-10-01'
           AND l_returnflag = 'R' AND c_nationkey = n_nationkey
         GROUP BY c_custkey, c_name, c_acctbal, n_name
         ORDER BY revenue DESC, c_custkey
         LIMIT 20""",

    "q14_promo_share" ->
      """SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice AS DECIMAL(11,4)) *
               CAST(1.0 - l_discount AS DECIMAL(6,4))
             ELSE CAST(0 AS DECIMAL(17,8)) END) AS DOUBLE) /
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(11,4)) *
             CAST(1.0 - l_discount AS DECIMAL(6,4))) AS DOUBLE), 6)
           AS promo_revenue
         FROM lineitem, part
         WHERE l_partkey = p_partkey
           AND l_shipdate >= TIMESTAMP '1996-09-01'
           AND l_shipdate < TIMESTAMP '1996-10-01'""",

    "q15_top_supplier" ->
      """WITH rev AS (
           SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(11,4)) *
               CAST(1.0 - l_discount AS DECIMAL(6,4))) AS r
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1996-04-01'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, CAST(ROUND(r, 4) AS DOUBLE) AS total_rev
         FROM rev JOIN supplier ON l_suppkey = s_suppkey
         WHERE r = (SELECT MAX(r) FROM rev)""",

    "q16_parts_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
         FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
         JOIN part ON p_partkey = l_partkey
         WHERE p_brand <> 'Brand#1'
           AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49)
           AND l_suppkey NOT IN (
             SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         GROUP BY p_brand, p_type, p_size""",

    "q17_small_qty" ->
      """WITH lip AS (
           SELECT l_partkey, l_quantity, l_extendedprice
           FROM lineitem JOIN part ON p_partkey = l_partkey
           WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'),
         st AS (
           SELECT l_partkey AS sp,
             SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sq,
             COUNT(*) AS cnt
           FROM lip GROUP BY 1)
         SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
             AS DOUBLE) / 7.0, 4) AS avg_yearly
         FROM lip JOIN st ON l_partkey = sp
         WHERE CAST(l_quantity AS DECIMAL(18,4)) * (5 * cnt) < sq""",

    "q19_disjunct_revenue" ->
      """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(11,4)) *
           CAST(1.0 - l_discount AS DECIMAL(6,4))), 4) AS DOUBLE) AS revenue
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
             AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
             AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 20 AND 30)""",

    // the oracle keeps the CLASSIC correlated exists/not-exists form —
    // independent of the engine's single-aggregate rewrite
    "q21_waiting_suppliers" ->
      """SELECT s_name, COUNT(*) AS numwait
         FROM supplier, lineitem l1, orders, nation
         WHERE s_suppkey = l1.l_suppkey
           AND o_orderkey = l1.l_orderkey
           AND o_orderstatus = 'F'
           AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
           AND EXISTS (
             SELECT 1 FROM lineitem l2
             WHERE l2.l_orderkey = l1.l_orderkey
               AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (
             SELECT 1 FROM lineitem l3, orders o3
             WHERE l3.l_orderkey = l1.l_orderkey
               AND o3.o_orderkey = l3.l_orderkey
               AND l3.l_suppkey <> l1.l_suppkey
               AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
           AND s_nationkey = n_nationkey
           AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3',
             'NATION_4', 'NATION_5')
         GROUP BY s_name
         ORDER BY numwait DESC, s_name
         LIMIT 100""",

    "q22_global_sales" ->
      """WITH cand AS (
           SELECT * FROM customer
           WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
         ab AS (
           SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
             / COUNT(*) AS ab
           FROM cand WHERE c_acctbal > 0)
         SELECT CAST(c_nationkey AS BIGINT) AS cntry,
           COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 4) AS DOUBLE)
             AS totacctbal
         FROM cand, ab
         WHERE c_acctbal > ab
           AND c_custkey NOT IN (
             SELECT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '2001-01-01')
         GROUP BY 1""",

    "q2_min_cost_supplier" ->
      """WITH ps AS (
           SELECT p_partkey, p_brand, p_size, s_suppkey, s_name,
             CAST(s_acctbal AS DECIMAL(18,4)) AS bal
           FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
           JOIN part ON l_partkey = p_partkey
           JOIN supplier ON l_suppkey = s_suppkey
           WHERE p_type = 'LARGE' AND p_size < 15),
         mn AS (
           SELECT p_partkey AS mp, MIN(bal) AS mb FROM ps GROUP BY 1)
         SELECT p_partkey, p_brand, p_size,
           MIN(s_suppkey) AS s_suppkey,
           CAST(ROUND(MIN(bal), 2) AS DOUBLE) AS s_acctbal
         FROM ps JOIN mn ON p_partkey = mp AND bal = mb
         GROUP BY p_partkey, p_brand, p_size""",

    "q9_product_profit" ->
      """SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(ROUND(
             SUM(CAST(l_extendedprice AS DECIMAL(11,4)) *
                 CAST(1.0 - l_discount AS DECIMAL(6,4))) -
             SUM(CAST(CAST(p_retailprice AS DECIMAL(12,4)) *
                 CAST(l_quantity AS DECIMAL(12,4)) AS DECIMAL(26,8))),
             4) AS DOUBLE) AS sum_profit
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN orders ON l_orderkey = o_orderkey
         WHERE p_name LIKE '%red%'
         GROUP BY 1, 2""",

    "q11_important_stock" ->
      """WITH byp AS (
           SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(11,4)) *
               CAST(l_quantity AS DECIMAL(8,2))) AS value
           FROM lineitem
           WHERE l_suppkey IN (
             SELECT s_suppkey FROM supplier WHERE s_nationkey IN (1, 2, 3))
           GROUP BY 1)
         SELECT l_partkey AS p_partkey,
           CAST(ROUND(value, 4) AS DOUBLE) AS value
         FROM byp
         WHERE value * 1000 > (SELECT SUM(value) FROM byp)""",

    "q12_late_priority" ->
      """SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
           AND l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
         GROUP BY l_linestatus""",

    "q20_excess_suppliers" ->
      """WITH bys AS (
           SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sq
           FROM lineitem GROUP BY 1, 2),
         byp AS (
           SELECT l_partkey AS tp,
             SUM(CAST(l_quantity AS DECIMAL(18,4))) AS tq
           FROM lineitem GROUP BY 1)
         SELECT s_suppkey, s_name FROM supplier
         WHERE s_suppkey IN (
           SELECT l_suppkey FROM bys JOIN byp
           ON l_partkey = tp AND sq * 5 > tq)"""
  )
}
