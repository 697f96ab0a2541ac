package graft.ops

import graft.{QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Projection / filter / row-selection surface (SURVEY.md §2.2).
  *
  * Reference: pandas `frame.py:4259` __getitem__, `core/indexing.py`
  * loc/iloc, `generic.py:10438` where/mask, `frame.py:4956` query.
  * All label/positional selection becomes a filter (pushed to the
  * parquet scan by Catalyst) or a window over the row-order columns;
  * nothing materializes an index structure.
  */
object SelectQueries extends QueryModule {

  def queries: Map[String, Q] = Map(
    // df[["a","b"]] projection + boolean mask (frame.py:4259; filter
    // and column pruning both reach the parquet scan)
    "sel_project_filter" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "orders")
        .filter($"o_orderstatus" === "F" && $"o_totalprice" > 300000)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    },

    // df.query("...") string predicate (frame.py:4956) -> Spark SQL parser
    "sel_query_expr" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "lineitem")
        .filter(expr("l_discount > 0.08 AND l_quantity >= 45 AND l_returnflag = 'R'"))
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount")
    },

    // Series.where keeping shape (generic.py:10438): non-matching -> NULL
    "sel_where_mask" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "lineitem")
        .filter($"l_orderkey" < 2000)
        .select($"l_orderkey", $"l_linenumber",
          when($"l_quantity" > 25, $"l_quantity").as("qty_if_big"),
          when(!($"l_quantity" > 25), $"l_quantity").as("qty_if_small"))
    },

    // isin (algorithms.py:510) — literal list; large lists become a
    // broadcast semi join (see join_semi)
    "sel_isin" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "part")
        .filter($"p_brand".isin("Brand#1", "Brand#5", "Brand#9"))
        .select($"p_partkey", $"p_brand", $"p_retailprice")
    },

    // clip (generic.py:8856) -> least(greatest(...))
    "sel_clip" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "orders")
        .filter($"o_orderkey" < 5000)
        .select($"o_orderkey",
          least(greatest($"o_totalprice", lit(50000.0)), lit(300000.0)).as("clipped_price"))
    },

    // head(n) over a defined order (generic.py:5806): deterministic via
    // unique sort key; Catalyst plans TakeOrderedAndProject (top-k, no
    // full sort at scale)
    "sel_head" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "orders")
        .orderBy($"o_orderkey")
        .limit(100)
        .select($"o_orderkey", $"o_totalprice")
    },

    // tail(n): mirrored order
    "sel_tail" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "orders")
        .orderBy($"o_orderkey".desc)
        .limit(100)
        .select($"o_orderkey", $"o_totalprice")
    },

    // iloc[1000:1100] positional slice (indexing.py:2092) — global
    // ordinal via range-partition + zipWithIndex (GlobalOrder), the
    // scalable replacement for a single-partition row_number window
    "sel_iloc_slice" -> { (s, d) =>
      import s.implicits._
      graft.operators.GlobalOrder
        .zipOrdinal(
          Tables(s, d, "orders").select($"o_orderkey", $"o_totalprice"),
          Seq($"o_orderkey"))
        .filter($"__ord" >= 1000 && $"__ord" < 1100)
        .drop("__ord")
    },

    // loc[label] lookup (indexing.py:1359) -> key equality filter
    "sel_loc_label" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "customer")
        .filter($"c_custkey".isin(1L, 10L, 100L, 1000L))
        .select($"c_custkey", $"c_name", $"c_acctbal")
    },

    // MultiIndex level utilities (indexes/multi.py:201): swaplevel /
    // reorder_levels / sort_index(level=) / droplevel over the
    // index-as-columns model. Level surgery is metadata-only (zero plan
    // cost); the observable result is the sort_index ordering — lead
    // level first, remaining levels tie-breaking in post-swap index
    // order — pinned by a head() sample over a unique total order.
    "sel_multiindex_levels" -> { (s, d) =>
      import s.implicits._
      import graft.api.PFrame
      val pf = PFrame(Tables(s, d, "lineitem")
          .select($"l_returnflag", $"l_linestatus", $"l_linenumber",
            $"l_orderkey", $"l_quantity"))
        .setIndex("l_returnflag", "l_linestatus", "l_linenumber", "l_orderkey")
        .swaplevel() // (flag, status, orderkey, linenumber)
        .reorderLevels(Seq("l_linenumber", "l_returnflag", "l_linestatus", "l_orderkey"))
        .sortIndex() // full index order — unique via (orderkey, linenumber)
        .head(200)
        .droplevel("l_linestatus") // metadata-only: column survives
      require(pf.index == Seq("l_linenumber", "l_returnflag", "l_orderkey"),
        s"MultiIndex surgery produced ${pf.index}")
      pf.toDF
    },

    // between_time (generic.py:9223): time-of-day filter on the ts index
    "sel_between_time" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "events")
        .filter(hour($"ts") >= 9 && hour($"ts") < 12)
        .select($"event_id", $"ts", $"event_type")
    },

    // truncate(before, after) (generic.py:10979): index range filter
    "sel_truncate" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "orders")
        .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1997-07-01").cast("timestamp"))
        .select($"o_orderkey", $"o_orderdate", $"o_totalprice")
    },

    // assign/drop/rename (frame.py:5907/:6386/:6614)
    "sel_assign_rename" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "lineitem")
        .filter($"l_orderkey" < 1000)
        .withColumn("net_price", $"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .withColumn("taxed_price", $"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"))
        .withColumnRenamed("l_quantity", "qty")
        .select($"l_orderkey", $"l_linenumber", $"qty", $"net_price", $"taxed_price")
    },

    // select_dtypes (frame.py:5357): schema-driven projection of the
    // double columns — resolved from df.schema, not hand-listed
    "sel_select_dtypes" -> { (s, d) =>
      val df = Tables(s, d, "lineitem").filter(col("l_orderkey") < 1000)
      val doubles = df.schema.fields.filter(_.dataType == DoubleType).map(_.name)
      df.select((Seq("l_orderkey", "l_linenumber") ++ doubles).map(col): _*)
    },

    // filter(regex=...) on column labels (generic.py:5694)
    "sel_filter_regex_cols" -> { (s, d) =>
      val df = Tables(s, d, "lineitem").filter(col("l_orderkey") < 1000)
      val priceCols = df.columns.filter(_.matches("^l_.*price$"))
      df.select((Seq("l_orderkey", "l_linenumber") ++ priceCols).map(col): _*)
    },

    // reindex (frame.py:6125): conform to a new index -> left join from
    // the new index spine; missing labels surface as NULL rows
    "sel_reindex" -> { (s, d) =>
      import s.implicits._
      val spine = s.range(1, 2001).select($"id".as("c_custkey"))
      spine.join(Tables(s, d, "customer"), Seq("c_custkey"), "left")
        .select($"c_custkey", $"c_name", $"c_acctbal")
    },

    // typed Dataset map (Series.apply frame.py:14854 — the typed UDF
    // surface; deterministic arithmetic so the oracle can mirror it)
    "sel_typed_map" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "orders")
        .select($"o_orderkey", $"o_totalprice")
        .as[(Long, Double)]
        .map { case (k, p) => (k, p * 1.1 + 5.0, if (p > 200000) "big" else "small") }
        .toDF("o_orderkey", "adjusted", "bucket")
    },

    // weighted sampling (core/sample.py:27 weights): Bernoulli draw
    // per row with probability proportional to the weight, driven by a
    // deterministic key hash — reproducible and shuffle-free at scale
    "sel_sample_weighted" -> { (s, d) =>
      import s.implicits._
      val frac = (($"o_orderkey" * 2654435761L) % 1000000L).cast("double") / 1000000.0
      Tables(s, d, "orders")
        .filter(frac < $"o_totalprice" / 600000.0)
        .select($"o_orderkey", $"o_totalprice")
    },

    // Kleene three-valued logic (arrays/boolean.py masked ops,
    // core/ops/mask_ops.py): NULL-aware AND/OR/NOT truth behavior
    "sel_kleene_logic" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "events")
        .withColumn("a", when($"event_type" =!= "error", $"value" > 100))
        .withColumn("b", $"user_id" % 2 === 0)
        .select($"event_id", $"a", $"b",
          ($"a" && $"b").as("a_and_b"),
          ($"a" || $"b").as("a_or_b"),
          (!$"a").as("not_a"))
    },

    // reproducible sampling (core/sample.py): key-hash modulo — the
    // 100 TB-safe way to sample deterministically without a global seed
    "sel_sample_mod" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "orders")
        .filter($"o_orderkey" % 20 === 0)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    },

    // sample(n=500) exact-n (core/sample.py n= path): distributed
    // exact-count sampling = order by a deterministic per-row hash and
    // take n. TakeOrderedAndProject keeps only n rows per partition
    // then merges — no global sort materializes at any scale.
    "sel_sample_n" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy((($"o_orderkey" * 48271) % 1000003).asc, $"o_orderkey".asc)
        .limit(500)
    },

    // sample(replace=True) (core/sample.py:123): with-replacement =
    // per-row replication count ~ Poisson(1), the distributed
    // equivalent of n draws with replacement (no global coordination,
    // no collect). The count comes from a deterministic Lehmer-style
    // key hash so the draw is reproducible and oracle-checkable;
    // sequence+explode materializes the copies with a copy index.
    "sel_sample_replace" -> { (s, d) =>
      import s.implicits._
      val h = ($"o_orderkey" * 48271L) % 65537L % 100L
      val rep = when(h < 37, 0).when(h < 74, 1).when(h < 92, 2)
        .when(h < 98, 3).otherwise(4)
      Tables(s, d, "orders")
        .withColumn("rep", rep)
        .filter($"rep" > 0)
        .select($"o_orderkey", $"o_totalprice",
          explode(sequence(lit(1L), $"rep".cast("long"))).as("copy_id"))
    },

    // row-wise (axis=1) reductions: sum/mean/max/min/count/nunique
    // across columns (frame.py sum/mean/max with axis=1; nunique
    // :11317). The pandas row loop becomes one array literal per row +
    // codegen'd array HOFs — map-side only, no shuffle, and NaN-skipna
    // semantics via null filtering inside the array. A null is planted
    // in one column to exercise skipna.
    "sel_rowwise_stats" -> { (s, d) =>
      import s.implicits._
      val vals = array(
        $"l_quantity".cast("double"),
        when($"l_linenumber" === 1, lit(null).cast("double"))
          .otherwise($"l_extendedprice".cast("double")),
        ($"l_discount" * 100).cast("double"),
        ($"l_tax" * 100).cast("double"))
      val nn = filter(vals, v => v.isNotNull)
      Tables(s, d, "lineitem")
        .filter($"l_orderkey" < 5000)
        .select($"l_orderkey", $"l_linenumber",
          round(aggregate(nn, lit(0.0), (a, v) => a + v), 6).as("row_sum"),
          round(aggregate(nn, lit(0.0), (a, v) => a + v) / size(nn), 6)
            .as("row_mean"),
          array_max(nn).as("row_max"),
          array_min(nn).as("row_min"),
          size(nn).cast("long").as("row_count"),
          size(array_distinct(nn)).cast("long").as("row_nunique"))
    },

    // idxmax/idxmin(axis=1) + rank(axis=1, method='min') (frame.py
    // idxmax :11472, rank axis=1): which column holds the row's
    // max/min (first occurrence on ties, pandas order), and a
    // column's min-rank within its row. Same map-side array-literal
    // shape as sel_rowwise_stats — no shuffle.
    "sel_rowwise_idxrank" -> { (s, d) =>
      import s.implicits._
      val cols = Seq(
        "qty"   -> $"l_quantity".cast("double"),
        "price" -> $"l_extendedprice".cast("double"),
        "disc"  -> ($"l_discount" * 100).cast("double"),
        "tax"   -> ($"l_tax" * 100).cast("double"))
      val named = array(cols.map { case (n, c) =>
        struct(lit(n).as("name"), c.as("v")) }: _*)
      val vals = array(cols.map(_._2): _*)
      Tables(s, d, "lineitem")
        .filter($"l_orderkey" < 5000)
        .select($"l_orderkey", $"l_linenumber",
          element_at(filter(named, x => x("v") === array_max(vals)), 1)("name")
            .as("idxmax_row"),
          element_at(filter(named, x => x("v") === array_min(vals)), 1)("name")
            .as("idxmin_row"),
          (size(filter(vals, x => x < $"l_quantity".cast("double"))) + 1)
            .cast("long").as("qty_rank_min"))
    }
  )

  def oracle: Map[String, String] = Map(
    "sel_project_filter" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_orderstatus = 'F' AND o_totalprice > 300000""",

    "sel_query_expr" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
         WHERE l_discount > 0.08 AND l_quantity >= 45 AND l_returnflag = 'R'""",

    "sel_where_mask" ->
      """SELECT l_orderkey, l_linenumber,
         CASE WHEN l_quantity > 25 THEN l_quantity END AS qty_if_big,
         CASE WHEN NOT (l_quantity > 25) THEN l_quantity END AS qty_if_small
         FROM lineitem WHERE l_orderkey < 2000""",

    "sel_isin" ->
      """SELECT p_partkey, p_brand, p_retailprice FROM part
         WHERE p_brand IN ('Brand#1', 'Brand#5', 'Brand#9')""",

    "sel_clip" ->
      """SELECT o_orderkey,
         LEAST(GREATEST(o_totalprice, 50000.0), 300000.0) AS clipped_price
         FROM orders WHERE o_orderkey < 5000""",

    "sel_head" ->
      """SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 100""",

    "sel_tail" ->
      """SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey DESC LIMIT 100""",

    "sel_iloc_slice" ->
      """SELECT o_orderkey, o_totalprice FROM (
           SELECT o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (ORDER BY o_orderkey) AS pos
           FROM orders) t WHERE pos > 1000 AND pos <= 1100""",

    "sel_loc_label" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE c_custkey IN (1, 10, 100, 1000)""",

    "sel_between_time" ->
      """SELECT event_id, ts, event_type FROM events
         WHERE EXTRACT(hour FROM ts) >= 9 AND EXTRACT(hour FROM ts) < 12""",

    // post-surgery sort order: lead level l_linenumber, then the
    // remaining post-swap levels (flag, status, orderkey); unique via
    // (orderkey, linenumber) so the LIMIT sample is deterministic
    "sel_multiindex_levels" ->
      """SELECT l_returnflag, l_linestatus, l_linenumber, l_orderkey, l_quantity
         FROM lineitem
         ORDER BY l_linenumber, l_returnflag, l_linestatus, l_orderkey
         LIMIT 200""",

    "sel_truncate" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'""",

    "sel_assign_rename" ->
      """SELECT l_orderkey, l_linenumber, l_quantity AS qty,
         l_extendedprice * (1.0 - l_discount) AS net_price,
         l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS taxed_price
         FROM lineitem WHERE l_orderkey < 1000""",

    "sel_select_dtypes" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
         l_discount, l_tax FROM lineitem WHERE l_orderkey < 1000""",

    "sel_filter_regex_cols" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
         FROM lineitem WHERE l_orderkey < 1000""",

    "sel_reindex" ->
      """SELECT s.c_custkey, c.c_name, c.c_acctbal
         FROM (SELECT unnest(range(1, 2001)) AS c_custkey) s
         LEFT JOIN customer c ON s.c_custkey = c.c_custkey""",

    "sel_typed_map" ->
      """SELECT o_orderkey, o_totalprice * 1.1 + 5.0 AS adjusted,
         CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS bucket
         FROM orders""",

    "sel_sample_weighted" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE CAST((o_orderkey * 2654435761) % 1000000 AS DOUBLE) / 1000000.0
               < o_totalprice / 600000.0""",

    "sel_kleene_logic" ->
      """SELECT event_id,
         CASE WHEN event_type <> 'error' THEN "value" > 100 END AS a,
         user_id % 2 = 0 AS b,
         (CASE WHEN event_type <> 'error' THEN "value" > 100 END) AND (user_id % 2 = 0) AS a_and_b,
         (CASE WHEN event_type <> 'error' THEN "value" > 100 END) OR (user_id % 2 = 0) AS a_or_b,
         NOT (CASE WHEN event_type <> 'error' THEN "value" > 100 END) AS not_a
         FROM events""",

    "sel_sample_mod" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_orderkey % 20 = 0""",

    "sel_sample_n" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY (o_orderkey * 48271) % 1000003 ASC, o_orderkey ASC
         LIMIT 500""",

    "sel_sample_replace" ->
      """WITH t AS (
           SELECT o_orderkey, o_totalprice,
             CASE WHEN (o_orderkey * 48271) % 65537 % 100 < 37 THEN 0
                  WHEN (o_orderkey * 48271) % 65537 % 100 < 74 THEN 1
                  WHEN (o_orderkey * 48271) % 65537 % 100 < 92 THEN 2
                  WHEN (o_orderkey * 48271) % 65537 % 100 < 98 THEN 3
                  ELSE 4 END AS rep
           FROM orders)
         SELECT o_orderkey, o_totalprice,
           unnest(generate_series(1, rep)) AS copy_id
         FROM t WHERE rep > 0""",

    "sel_rowwise_stats" ->
      """WITH t AS (
           SELECT l_orderkey, l_linenumber,
             list_filter([
               CAST(l_quantity AS DOUBLE),
               CASE WHEN l_linenumber = 1 THEN NULL
                    ELSE CAST(l_extendedprice AS DOUBLE) END,
               CAST(l_discount * 100 AS DOUBLE),
               CAST(l_tax * 100 AS DOUBLE)], v -> v IS NOT NULL) AS nn
           FROM lineitem WHERE l_orderkey < 5000)
         SELECT l_orderkey, l_linenumber,
           ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE), nn), (a, v) -> a + v), 6) AS row_sum,
           ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE), nn), (a, v) -> a + v) / len(nn), 6) AS row_mean,
           list_max(nn) AS row_max,
           list_min(nn) AS row_min,
           CAST(len(nn) AS BIGINT) AS row_count,
           CAST(len(list_distinct(nn)) AS BIGINT) AS row_nunique
         FROM t""",

    "sel_rowwise_idxrank" ->
      """WITH t AS (
           SELECT l_orderkey, l_linenumber,
             [struct_pack(name := 'qty',   v := CAST(l_quantity AS DOUBLE)),
              struct_pack(name := 'price', v := CAST(l_extendedprice AS DOUBLE)),
              struct_pack(name := 'disc',  v := CAST(l_discount * 100 AS DOUBLE)),
              struct_pack(name := 'tax',   v := CAST(l_tax * 100 AS DOUBLE))] AS named,
             [CAST(l_quantity AS DOUBLE), CAST(l_extendedprice AS DOUBLE),
              CAST(l_discount * 100 AS DOUBLE), CAST(l_tax * 100 AS DOUBLE)] AS vals,
             CAST(l_quantity AS DOUBLE) AS q
           FROM lineitem WHERE l_orderkey < 5000)
         SELECT l_orderkey, l_linenumber,
           list_filter(named, x -> x.v = list_max(vals))[1].name AS idxmax_row,
           list_filter(named, x -> x.v = list_min(vals))[1].name AS idxmin_row,
           CAST(len(list_filter(vals, x -> x < q)) + 1 AS BIGINT) AS qty_rank_min
         FROM t"""
  )
}
