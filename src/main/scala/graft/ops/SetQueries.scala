package graft.ops

import graft.{QueryModule, Tables}
import graft.OracleNum._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sort / top-k / dedup / set-operation surface (SURVEY.md §2.6).
  *
  * Reference: pandas `frame.py:8454` sort_values (stable lexsort,
  * `core/sorting.py`), `frame.py:9069` nlargest (partial select
  * `_libs/algos.pyx:322`), `frame.py:8168` drop_duplicates,
  * `algorithms.py:804` factorize, `reshape/concat.py` concat,
  * `indexes/base.py:3150+` set ops.
  *
  * Scale notes: top-k compiles to TakeOrderedAndProject (no global
  * sort); dedup keep=first is a window over the order column (one
  * shuffle on the subset key); set ops are shuffles on the full row.
  */
object SetQueries extends QueryModule {

  def queries: Map[String, Q] = Map(
    // nlargest(50) with unique tiebreak — TakeOrderedAndProject top-k
    "set_nlargest" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "orders")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(50)
        .select($"o_orderkey", $"o_totalprice")
    },

    // nlargest(keep='last') (methods/selectn.py:140 keep param): on
    // value ties prefer the LATER row — same TakeOrderedAndProject,
    // tiebreak flipped to key descending
    "set_nlargest_keeplast" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "lineitem").filter($"l_orderkey" < 3000)
        .orderBy($"l_quantity".desc, $"l_orderkey".desc, $"l_linenumber".desc)
        .limit(50)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity")
    },

    // nsmallest(50)
    "set_nsmallest" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "orders")
        .orderBy($"o_totalprice".asc, $"o_orderkey".asc)
        .limit(50)
        .select($"o_orderkey", $"o_totalprice")
    },

    // nlargest(keep='all') (methods/selectn.py:140): all boundary ties
    // survive, so the result can exceed n. Distributed shape: top-n
    // pass (TakeOrderedAndProject) finds the nth value, broadcast it,
    // filter >= — two cheap jobs, no global sort. l_quantity has 50
    // distinct values so the boundary tie group is real.
    "set_nlargest_keepall" -> { (s, d) =>
      import s.implicits._
      val sub = Tables(s, d, "lineitem").filter($"l_orderkey" < 3000)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity")
      val nth = sub.orderBy($"l_quantity".desc).limit(100)
        .agg(min($"l_quantity").as("th"))
      sub.crossJoin(broadcast(nth))
        .filter($"l_quantity" >= $"th")
        .select($"l_orderkey", $"l_linenumber", $"l_quantity")
    },

    // concat axis=1 (reshape/concat.py:78, axis=1 path): column-wise
    // concat aligns on the index = full outer join on the key, columns
    // from both sides, nulls where a side is absent.
    "set_concat_axis1" -> { (s, d) =>
      import s.implicits._
      val a = Tables(s, d, "orders").filter($"o_orderstatus" === "O")
        .select($"o_orderkey", $"o_totalprice".as("px"))
      val b = Tables(s, d, "orders").filter($"o_totalprice" > 200000)
        .select($"o_orderkey", $"o_orderpriority".as("pr"))
      a.join(b, Seq("o_orderkey"), "full")
    },

    // multi-key sort with per-key direction + nulls placement, top 200
    // (sort_values frame.py:8454; stability via unique tiebreak)
    "set_sort_multi" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "orders")
        .orderBy($"o_orderstatus".asc, $"o_totalprice".desc, $"o_orderkey".asc)
        .limit(200)
        .select($"o_orderstatus", $"o_orderkey", $"o_totalprice")
    },

    // drop_duplicates(subset, keep='first') (frame.py:8168): first = min
    // row order, here (o_orderdate, o_orderkey)
    "set_dropdup_first" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey", $"o_orderstatus")
        .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
      Tables(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"o_custkey", $"o_orderstatus", $"o_orderkey", $"o_orderdate")
    },

    // drop_duplicates(subset, keep='last') (frame.py:8168): last = max
    // row order — the keep='first' window with the ordering reversed
    "set_dropdup_keeplast" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey", $"o_orderstatus")
        .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
      Tables(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"o_custkey", $"o_orderstatus", $"o_orderkey", $"o_orderdate")
    },

    // sort_values(key=str.lower, na_position='first')
    // (frame.py:7076 key callable, sorting.py na_position): the sort
    // key is a computed expression; NULLs lead. Ordering is made
    // observable through limit-membership, like set_sort_multi.
    "set_sort_key_napos" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "events")
        .orderBy(lower($"event_type").asc_nulls_first, $"value".asc_nulls_first,
          $"event_id".asc)
        .limit(300)
        .select(lower($"event_type").as("key_lower"), $"event_id", $"value")
    },

    // drop_duplicates(keep=False): only singleton groups survive
    "set_dropdup_keepfalse" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey", $"o_orderstatus")
      Tables(s, d, "orders")
        .withColumn("cnt", count(lit(1)).over(w))
        .filter($"cnt" === 1)
        .select($"o_custkey", $"o_orderstatus", $"o_orderkey")
    },

    // duplicated() flags (algorithms.py:1120): keep='first' marks later
    // occurrences True
    "set_duplicated_flag" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey", $"o_orderstatus")
        .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
      Tables(s, d, "orders")
        .select($"o_orderkey",
          (row_number().over(w) > 1).as("is_dup"))
    },

    // factorize by first appearance (algorithms.py:804): code = rank of
    // each value's first row position over the value dictionary. The
    // dictionary is an aggregate (one row per distinct value) and its
    // first positions are unique, so the code is a GlobalOrder ordinal
    // — no unpartitioned window even for huge dictionaries.
    "set_factorize" -> { (s, d) =>
      import s.implicits._
      val firstPos = graft.operators.GlobalOrder.zipOrdinal(
        Tables(s, d, "customer")
          .groupBy($"c_mktsegment")
          .agg(min($"c_custkey").as("first_pos")),
        Seq($"first_pos"), "code")
      Tables(s, d, "customer")
        .join(broadcast(firstPos), Seq("c_mktsegment"))
        .select($"c_custkey", $"c_mktsegment", $"code")
    },

    // concat axis=0 = unionByName with missing-column promotion
    // (reshape/concat.py:78; dtype promotion dtypes/concat.py)
    "set_concat_union" -> { (s, d) =>
      import s.implicits._
      val high = Tables(s, d, "orders").filter($"o_totalprice" > 400000)
        .select($"o_orderkey", $"o_totalprice", lit("high").as("tier"),
          $"o_orderpriority")
      val low = Tables(s, d, "orders").filter($"o_totalprice" < 5000)
        .select($"o_orderkey", $"o_totalprice", lit("low").as("tier"))
      high.unionByName(low, allowMissingColumns = true)
    },

    // concat(keys=[...]) provenance labels (reshape/concat.py:78
    // `keys` param): outer index level -> literal source column
    "set_concat_keys" -> { (s, d) =>
      import s.implicits._
      val high = Tables(s, d, "orders").filter($"o_totalprice" > 400000)
        .select($"o_orderkey", $"o_totalprice", $"o_orderpriority")
      val low = Tables(s, d, "orders").filter($"o_totalprice" < 5000)
        .select($"o_orderkey", $"o_totalprice")
      graft.api.PFrame.concat(
        Seq(graft.api.PFrame(high), graft.api.PFrame(low)),
        keys = Seq("high", "low"), keyName = "src").df
    },

    // Index.intersection (indexes/base.py:3378)
    "set_intersect" -> { (s, d) =>
      import s.implicits._
      val big = Tables(s, d, "orders").filter($"o_totalprice" > 400000)
        .select($"o_custkey")
      val urgent = Tables(s, d, "orders")
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_custkey")
      big.intersect(urgent)
    },

    // Index.difference (indexes/base.py:3540)
    "set_except" -> { (s, d) =>
      import s.implicits._
      val a = Tables(s, d, "orders").filter($"o_totalprice" > 400000)
        .select($"o_custkey")
      val b = Tables(s, d, "orders").filter($"o_totalprice" > 450000)
        .select($"o_custkey")
      a.except(b)
    },

    // combine_first (frame.py:12688): patch frame wins where present,
    // base fills the rest — outer join + coalesce
    "set_combine_first" -> { (s, d) =>
      import s.implicits._
      val base = Tables(s, d, "customer")
        .select($"c_custkey", $"c_acctbal")
      val patch = Tables(s, d, "customer")
        .filter($"c_acctbal" < 0)
        .select($"c_custkey", lit(0.0).as("patched_bal"))
      base.join(patch, Seq("c_custkey"), "full")
        .select($"c_custkey",
          coalesce($"patched_bal", $"c_acctbal").as("acctbal"))
    },

    // update (frame.py:8290) through the PFrame surface itself (like
    // set_concat_keys): overwrite o_totalprice with non-null values
    // from an aligned patch frame; rows only in the patch are ignored,
    // untouched columns pass through. One left join on the key —
    // broadcastable when the patch is small, shuffle-join otherwise.
    "set_update" -> { (s, d) =>
      import s.implicits._
      val base = Tables(s, d, "orders")
        .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
      val patch = Tables(s, d, "orders")
        .filter($"o_orderkey" % 10 === 0)
        .select($"o_orderkey", ($"o_totalprice" + 100000.0).as("o_totalprice"))
      graft.api.PFrame(base)
        .update(graft.api.PFrame(patch), on = "o_orderkey").df
    },

    // compare (frame.py:12343): differing cells only, self vs clipped
    "set_compare" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "orders")
        .withColumn("other",
          least(greatest($"o_totalprice", lit(10000.0)), lit(450000.0)))
        .filter($"o_totalprice" =!= $"other")
        .select($"o_orderkey", $"o_totalprice".as("self"), $"other")
    },

    // SCD2 dimension merge (the warehouse form of pandas' update/
    // combine_first workflow): current rows are version 1, an update
    // batch (changed balances + brand-new keys) is version 2; each
    // key's history closes via lead(version) — updated keys get their
    // v1 row closed and v2 open, untouched/inserted keys stay open.
    // One shuffle by key; versions per key are tiny, so the window
    // state is O(1) and the plan scales with the dimension, not its
    // history depth.
    "set_scd2" -> { (s, d) =>
      import s.implicits._
      val cust = Tables(s, d, "customer")
      val v1 = cust.select($"c_custkey".as("k"),
        $"c_acctbal".as("bal"), lit(1L).as("version"))
      val updates = cust.filter($"c_custkey" % 7 === 0)
        .select($"c_custkey".as("k"),
          ($"c_acctbal" + 100.0).as("bal"), lit(2L).as("version"))
      val inserts = cust.filter($"c_custkey" % 13 === 0)
        .select(($"c_custkey" + 1000000L).as("k"),
          $"c_acctbal".as("bal"), lit(2L).as("version"))
      val w = Window.partitionBy($"k").orderBy($"version")
      v1.unionAll(updates).unionAll(inserts)
        .select($"k", $"version", $"bal",
          lead($"version", 1).over(w).as("valid_to"),
          lead($"version", 1).over(w).isNull.as("is_current"))
    }
  )

  def oracle: Map[String, String] = Map(
    "set_scd2" ->
      """WITH v1 AS (
           SELECT c_custkey AS k, c_acctbal AS bal, CAST(1 AS BIGINT) AS version
           FROM customer),
         up AS (
           SELECT c_custkey AS k, c_acctbal + 100.0 AS bal, CAST(2 AS BIGINT) AS version
           FROM customer WHERE c_custkey % 7 = 0),
         ins AS (
           SELECT c_custkey + 1000000 AS k, c_acctbal AS bal, CAST(2 AS BIGINT) AS version
           FROM customer WHERE c_custkey % 13 = 0),
         a AS (
           SELECT * FROM v1 UNION ALL SELECT * FROM up
           UNION ALL SELECT * FROM ins)
         SELECT k, version, bal,
           LEAD(version) OVER (PARTITION BY k ORDER BY version) AS valid_to,
           LEAD(version) OVER (PARTITION BY k ORDER BY version) IS NULL AS is_current
         FROM a""",

    "set_nlargest" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50""",

    "set_nsmallest" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice ASC, o_orderkey ASC LIMIT 50""",

    "set_nlargest_keeplast" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_orderkey < 3000
         ORDER BY l_quantity DESC, l_orderkey DESC, l_linenumber DESC
         LIMIT 50""",

    "set_nlargest_keepall" ->
      """WITH sub AS (
           SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
           WHERE l_orderkey < 3000),
         th AS (
           SELECT MIN(l_quantity) AS th FROM (
             SELECT l_quantity FROM sub ORDER BY l_quantity DESC LIMIT 100) t)
         SELECT l_orderkey, l_linenumber, l_quantity
         FROM sub, th WHERE l_quantity >= th.th""",

    "set_concat_axis1" ->
      """SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey, a.px, b.pr
         FROM (SELECT o_orderkey, o_totalprice AS px FROM orders
               WHERE o_orderstatus = 'O') a
         FULL JOIN (SELECT o_orderkey, o_orderpriority AS pr FROM orders
               WHERE o_totalprice > 200000) b
         ON a.o_orderkey = b.o_orderkey""",

    "set_sort_multi" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice FROM orders
         ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC LIMIT 200""",

    "set_dropdup_first" ->
      """SELECT o_custkey, o_orderstatus, o_orderkey, o_orderdate FROM (
           SELECT o_custkey, o_orderstatus, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderstatus
                                ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
           FROM orders) t WHERE rn = 1""",

    "set_dropdup_keeplast" ->
      """SELECT o_custkey, o_orderstatus, o_orderkey, o_orderdate FROM (
           SELECT o_custkey, o_orderstatus, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderstatus
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           FROM orders) t WHERE rn = 1""",

    "set_sort_key_napos" ->
      """SELECT lower(event_type) AS key_lower, event_id, "value" FROM events
         ORDER BY lower(event_type) ASC NULLS FIRST, "value" ASC NULLS FIRST, event_id ASC
         LIMIT 300""",

    "set_dropdup_keepfalse" ->
      """SELECT o_custkey, o_orderstatus, o_orderkey FROM (
           SELECT o_custkey, o_orderstatus, o_orderkey,
             COUNT(*) OVER (PARTITION BY o_custkey, o_orderstatus) AS cnt
           FROM orders) t WHERE cnt = 1""",

    "set_duplicated_flag" ->
      """SELECT o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderstatus
                            ORDER BY o_orderdate ASC, o_orderkey ASC) > 1 AS is_dup
         FROM orders""",

    "set_factorize" ->
      """WITH f AS (
           SELECT c_mktsegment, MIN(c_custkey) AS first_pos
           FROM customer GROUP BY c_mktsegment),
         coded AS (
           SELECT c_mktsegment,
             DENSE_RANK() OVER (ORDER BY first_pos) - 1 AS code
           FROM f)
         SELECT c.c_custkey, c.c_mktsegment, coded.code
         FROM customer c JOIN coded USING (c_mktsegment)""",

    "set_concat_union" ->
      """SELECT o_orderkey, o_totalprice, 'high' AS tier, o_orderpriority
         FROM orders WHERE o_totalprice > 400000
         UNION ALL
         SELECT o_orderkey, o_totalprice, 'low' AS tier, NULL AS o_orderpriority
         FROM orders WHERE o_totalprice < 5000""",

    "set_concat_keys" ->
      """SELECT 'high' AS src, o_orderkey, o_totalprice, o_orderpriority
         FROM orders WHERE o_totalprice > 400000
         UNION ALL
         SELECT 'low' AS src, o_orderkey, o_totalprice, NULL AS o_orderpriority
         FROM orders WHERE o_totalprice < 5000""",

    "set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 400000
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'""",

    "set_except" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 400000
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_totalprice > 450000""",

    "set_update" ->
      """SELECT o.o_orderkey,
           COALESCE(u.nt, o.o_totalprice) AS o_totalprice,
           o.o_orderstatus
         FROM orders o
         LEFT JOIN (SELECT o_orderkey, o_totalprice + 100000.0 AS nt
                    FROM orders WHERE o_orderkey % 10 = 0) u
           ON o.o_orderkey = u.o_orderkey""",

    "set_combine_first" ->
      """WITH patch AS (
           SELECT c_custkey, 0.0 AS patched_bal FROM customer WHERE c_acctbal < 0)
         SELECT c.c_custkey,
           COALESCE(p.patched_bal, c.c_acctbal) AS acctbal
         FROM customer c LEFT JOIN patch p ON c.c_custkey = p.c_custkey""",

    "set_compare" ->
      """SELECT o_orderkey, o_totalprice AS self,
         LEAST(GREATEST(o_totalprice, 10000.0), 450000.0) AS other
         FROM orders
         WHERE o_totalprice <> LEAST(GREATEST(o_totalprice, 10000.0), 450000.0)"""
  )
}
