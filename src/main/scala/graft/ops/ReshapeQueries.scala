package graft.ops

import graft.{QueryModule, Tables}
import graft.OracleNum._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reshape surface (SURVEY.md §2.7).
  *
  * Reference: pandas `reshape/pivot.py` (pivot/pivot_table/crosstab,
  * margins `:429`), `reshape/melt.py`, `reshape/reshape.py`
  * (stack/unstack), `reshape/encoding.py` (get_dummies),
  * `reshape/tile.py` (cut/qcut), `frame.py:13764` explode.
  *
  * pivot = groupBy().pivot().agg() (one shuffle; pivot values are
  * either declared or discovered with a cheap distinct pass);
  * margins = Spark `rollup`, which pandas lacks natively; melt =
  * `unpivot`; explode = `explode()` generator.
  */
object ReshapeQueries extends QueryModule {

  def queries: Map[String, Q] = Map(
    // pivot wide: status columns, revenue cells (pivot.py:747; declared
    // pivot values avoid the discovery pass — at scale always declare)
    "rs_pivot" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "orders")
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(dsum($"o_totalprice"))
    },

    // pivot_table(fill_value=0) (pivot.py:59 fill_value param): the
    // high filter leaves some (priority, status) cells empty; fill
    // them with 0 instead of null
    "rs_pivot_fill" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "orders")
        .filter($"o_totalprice" > 450000)
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(dsum($"o_totalprice"))
        .na.fill(0.0, Seq("F", "O", "P"))
    },

    // pivot_table(margins=True) (pivot.py:59, _add_margins :429):
    // Spark rollup + label the grouping-null rows 'All'
    "rs_pivot_margins" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "orders")
        .rollup($"o_orderpriority", $"o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("rev"))
        .select(
          coalesce($"o_orderpriority", lit("All")).as("priority"),
          coalesce($"o_orderstatus", lit("All")).as("status"),
          $"n", $"rev")
    },

    // full CUBE with grouping-set ids (beyond pandas — margins along
    // EVERY dimension combination in one pass; one Expand + one
    // shuffle, partial aggregation intact). grouping_id() labels each
    // stratum so the flat output stays self-describing.
    "rs_cube" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "orders")
        .cube($"o_orderpriority", $"o_orderstatus")
        .agg(grouping_id($"o_orderpriority", $"o_orderstatus").as("gid"),
          count(lit(1)).as("n"), dsum($"o_totalprice").as("rev"))
        .select(
          coalesce($"o_orderpriority", lit("All")).as("priority"),
          coalesce($"o_orderstatus", lit("All")).as("status"),
          $"gid", $"n", $"rev")
    },

    // pivot_table with multiple values / aggfuncs (pivot.py:59,
    // aggfunc dict + values list): one groupBy().pivot().agg(...)
    // with several aggregates — still ONE shuffle; Spark names the
    // wide columns {pivotValue}_{aggAlias}. Counts for absent
    // (priority, status) combos are null-filled to 0 to match the
    // conditional-aggregation oracle.
    "rs_pivot_multi" -> { (s, d) =>
      import s.implicits._
      val statuses = Seq("F", "O", "P")
      Tables(s, d, "orders")
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", statuses)
        .agg(
          dsum($"o_totalprice").as("rev"),
          count(lit(1)).as("n"),
          round(dsum($"o_totalprice") / count(lit(1)), 6).as("avg"))
        .na.fill(0, statuses.map(_ + "_n"))
    },

    // crosstab counts (pivot.py:982)
    "rs_crosstab" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "customer")
        .groupBy($"c_mktsegment")
        .pivot("c_nationkey", (0 to 24).map(_.toString))
        .agg(count(lit(1)))
        .na.fill(0)
    },

    // crosstab(margins=True) (pivot.py:982, margins via _add_margins):
    // row totals as an extra column and an 'All' total row. Spark's
    // pivot only composes with plain groupBy (not rollup), so the All
    // ROW is a second aggregation over the already-pivoted frame —
    // group-count-sized input, so the corpus is still scanned and
    // shuffled exactly once; the All COLUMN is map arithmetic.
    "rs_crosstab_margins" -> { (s, d) =>
      import s.implicits._
      val nations = (0 to 6).map(_.toString)
      val counts = Tables(s, d, "customer")
        .filter($"c_nationkey" <= 6)
        .groupBy($"c_mktsegment")
        .pivot("c_nationkey", nations)
        .agg(count(lit(1)))
        .na.fill(0)
      val allRow = counts.groupBy(lit("All").as("c_mktsegment"))
        .agg(nations.map(c => sum(col(c)).as(c)).head,
          nations.map(c => sum(col(c)).as(c)).tail: _*)
      val total = nations.map(col).reduce(_ + _)
      counts.unionByName(allRow)
        .select($"c_mktsegment" +: nations.map(col) :+ total.as("All"): _*)
    },

    // crosstab(normalize='index') (pivot.py:1078 _normalize): each
    // cell / its row total. The row total is computed from the
    // already-pivoted counts — pure map arithmetic after the one
    // pivot shuffle, no second pass over the data.
    "rs_crosstab_norm" -> { (s, d) =>
      import s.implicits._
      val nations = (0 to 24).map(_.toString)
      val counts = Tables(s, d, "customer")
        .groupBy($"c_mktsegment")
        .pivot("c_nationkey", nations)
        .agg(count(lit(1)))
        .na.fill(0)
      val total = nations.map(col).reduce(_ + _)
      counts.select($"c_mktsegment" +:
        nations.map(c => round(col(c) / total, 6).as(c)): _*)
    },

    // multi-column explode (frame.py:13764, explode(['a','b']) —
    // aligned lists burst together): arrays_zip keeps the per-index
    // alignment pandas requires, one generator pass
    "rs_explode_multi" -> { (s, d) =>
      import s.implicits._
      val words = split($"text", " ")
      Tables(s, d, "documents")
        .filter($"doc_id" < 50)
        .select($"doc_id", explode(arrays_zip(
          words.as("word"),
          transform(words, x => length(x)).as("wlen"))).as("z"))
        .select($"doc_id", $"z.word".as("word"), $"z.wlen".as("wlen"))
    },

    // melt / unpivot (melt.py:45; Spark `unpivot`)
    "rs_melt" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "lineitem")
        .filter($"l_orderkey" < 200)
        .unpivot(
          Array($"l_orderkey", $"l_linenumber"),
          Array($"l_quantity", $"l_discount", $"l_tax"),
          "measure", "val")
    },

    // explode list -> rows (frame.py:13764; Series.str.split + explode)
    "rs_explode_words" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "documents")
        .filter($"doc_id" < 50)
        .select($"doc_id", explode(split($"text", " ")).as("word"))
    },

    // get_dummies one-hot (encoding.py:44)
    "rs_get_dummies" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "orders")
        .select($"o_orderkey",
          when($"o_orderstatus" === "F", 1).otherwise(0).as("status_F"),
          when($"o_orderstatus" === "O", 1).otherwise(0).as("status_O"),
          when($"o_orderstatus" === "P", 1).otherwise(0).as("status_P"))
    },

    // get_dummies(drop_first=True, dummy_na=True) (encoding.py:44):
    // k-1 encoding over sorted categories + a NaN indicator, on a
    // column with derived sentinel nulls so dummy_na is exercised
    "rs_get_dummies_opts" -> { (s, d) =>
      import s.implicits._
      val base = Tables(s, d, "orders").select($"o_orderkey",
        when(pmod($"o_orderkey", lit(11)) === 0, lit(null))
          .otherwise($"o_orderpriority").as("prio"))
      graft.api.PFrame(base)
        .getDummies("prio", "prio", dropFirst = true, dummyNa = true).df
    },

    // cut: fixed-width right-closed bins (tile.py:59; pandas default
    // right=True => (lo, hi])
    "rs_cut" -> { (s, d) =>
      import s.implicits._
      val bin = when($"o_totalprice" <= 100000, "(0, 100k]")
        .when($"o_totalprice" <= 250000, "(100k, 250k]")
        .when($"o_totalprice" <= 400000, "(250k, 400k]")
        .otherwise("(400k, inf]")
      Tables(s, d, "orders")
        .groupBy(bin.as("price_bin"))
        .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("sum_price"))
    },

    // cut(right=False, labels=[...]) (tile.py:257): left-closed
    // [a, b) bins with user labels instead of interval strings
    "rs_cut_labels" -> { (s, d) =>
      import s.implicits._
      val label = when($"o_totalprice" < 100000, "low")
        .when($"o_totalprice" < 250000, "mid")
        .when($"o_totalprice" < 400000, "high")
        .otherwise("top")
      Tables(s, d, "orders")
        .groupBy(label.as("price_label"))
        .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("sum_price"))
    },

    // qcut: quantile bins (tile.py:298). NTILE semantics reproduced
    // distributed: global ordinal via GlobalOrder (range partition +
    // zipWithIndex), then the SQL-standard remainder rule — the first
    // (n mod k) buckets get the extra row. No single-partition window.
    "rs_qcut" -> { (s, d) =>
      import s.implicits._
      val k = 4
      val ordered = graft.operators.GlobalOrder.zipOrdinal(
        Tables(s, d, "orders").select($"o_orderkey", $"o_totalprice"),
        Seq($"o_totalprice", $"o_orderkey"))
      val n = ordered.count()
      val q = n / k
      val r = n % k
      val bucket = when(col("__ord") < (q + 1) * r, (col("__ord") / (q + 1)).cast("long"))
        .otherwise(((col("__ord") - r) / q).cast("long"))
      ordered
        .withColumn("q4", (bucket + 1).cast("int"))
        .groupBy($"q4")
        .agg(count(lit(1)).as("n"),
          min($"o_totalprice").as("lo"),
          max($"o_totalprice").as("hi"))
    },

    // wide_to_long (melt.py:287): stubnames {rev, yr} share the suffix
    // set {2024, 2025}; each suffix contributes one row per id
    // carrying ALL stubs. pandas melts per stub and joins on
    // (id, suffix) — composing the suffix rows directly is the Spark
    // shape: one narrow select per suffix, unioned, zero shuffles.
    "rs_wide_to_long" -> { (s, d) =>
      import s.implicits._
      val wide = Tables(s, d, "orders")
        .filter($"o_orderkey" < 5000)
        .select($"o_orderkey",
          $"o_totalprice".as("rev_2024"),
          ($"o_totalprice" * 1.1).as("rev_2025"),
          year($"o_orderdate").as("yr_2024"),
          (year($"o_orderdate") + 1).as("yr_2025"))
      val r2024 = wide.select($"o_orderkey", lit(2024).as("year"),
        $"rev_2024".as("rev"), $"yr_2024".as("yr"))
      val r2025 = wide.select($"o_orderkey", lit(2025).as("year"),
        $"rev_2025".as("rev"), $"yr_2025".as("yr"))
      r2024.unionByName(r2025)
    },

    // multi-level unstack (reshape.py:571 _Unstacker; VERDICT r1 #8):
    // two index levels pivot out at once = pivot on the concatenated
    // level values. Declared pivot values keep it a single shuffle
    // with no discovery pass — the 100 TB rule for any pivot.
    "rs_unstack_multi" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "lineitem")
        .withColumn("band", when($"l_quantity" <= 25, "lo").otherwise("hi"))
        .groupBy($"l_returnflag")
        .pivot(concat($"l_linestatus", lit("_"), $"band"),
          Seq("F_lo", "F_hi", "O_lo", "O_hi"))
        .agg(dsum($"l_extendedprice"))
    },

    // nested struct + array columns (ArrowDtype list/struct surface,
    // arrays/arrow/accessors.py ListAccessor/StructAccessor): struct
    // construction, field access, array slice. Nested values are
    // flattened to hashable scalars for the oracle compare (the
    // driver's pandas sort can't order dict/ndarray cells); the nested
    // types themselves stay covered in ReshapeSpec.
    "rs_nested_struct" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "documents")
        .select($"doc_id",
          struct($"lang", $"n_chars").as("meta"),
          slice(split($"text", " "), 1, 3).as("head_words"))
        .select($"doc_id",
          concat(lit("{lang:"), $"meta.lang", lit(",n_chars:"),
            $"meta.n_chars".cast("string"), lit("}")).as("meta_json"),
          $"meta.lang".as("lang_field"),
          size($"head_words").as("n_head"),
          concat_ws(" ", $"head_words").as("head_str"))
    },

    // from_dummies: inverse one-hot (encoding.py:409)
    "rs_from_dummies" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "orders")
        .select($"o_orderkey",
          when($"o_orderstatus" === "F", 1).otherwise(0).as("status_F"),
          when($"o_orderstatus" === "O", 1).otherwise(0).as("status_O"),
          when($"o_orderstatus" === "P", 1).otherwise(0).as("status_P"))
        .select($"o_orderkey",
          when($"status_F" === 1, "F")
            .when($"status_O" === 1, "O")
            .when($"status_P" === 1, "P").as("status_reconstructed"))
    },

    // stack: columns -> long (reshape.py:668) — same engine op as melt,
    // kept separate to mirror the API split; unstack is rs_pivot
    "rs_stack" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "supplier")
        .unpivot(
          Array($"s_suppkey"),
          Array($"s_name", $"s_nationkey".cast("string").as("s_nation")),
          "attr", "val")
    },

    // qcut(duplicates='drop') (tile.py:340 _bins_to_cuts dup handling):
    // on a low-cardinality column the quantile edges repeat; pandas
    // drops the duplicate edges and returns fewer bins. Edges come from
    // one exact-percentile agg (a single tiny broadcast row — the
    // at-scale shape, no global sort); bin = count of distinct interior
    // edges strictly below the value, i.e. (lo, hi] intervals. Edges
    // are rounded to 6dp before dedup so both engines dedup the same
    // doubles.
    "rs_qcut_dupdrop" -> { (s, d) =>
      import s.implicits._
      val li = Tables(s, d, "lineitem").select($"l_orderkey", $"l_linenumber",
        $"l_quantity")
      // l_quantity is integral 1..50, so decile edges land on repeated
      // integers — exactly the degenerate case duplicates='drop' exists
      // for. Round-15: edges via the distributed exact-percentile
      // operator (no single-reducer value map; values identical,
      // oracle-pinned) — the rounding/dedup stays in the same Spark
      // expressions so both engines keep deduping the same doubles.
      val es = graft.operators.DistributedPercentile.exact(
        li.select($"l_quantity").toDF(), "l_quantity",
        Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9))
      val edges = s.range(1)
        .select(array_distinct(transform(array(es.map(lit): _*),
          e => round(e, 6))).as("es"))
      li.crossJoin(broadcast(edges))
        .withColumn("bin",
          aggregate($"es", lit(0L),
            (acc, e) => acc + when($"l_quantity" > e, 1L).otherwise(0L)))
        .groupBy($"bin")
        .agg(count(lit(1)).as("n"),
          min($"l_quantity").as("lo"),
          max($"l_quantity").as("hi"))
    },

    // df.T (frame.py:3994) on a reduced frame: melt + pivot via
    // PFrame.transposeSmall — returnflag values become columns
    "rs_transpose" -> { (s, d) =>
      import s.implicits._
      val agg = Tables(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(sum($"l_quantity").cast("double").as("sum_qty"),
          max($"l_extendedprice").cast("double").as("max_price"),
          count(lit(1)).cast("double").as("n"))
      graft.api.PFrame(agg).transposeSmall("l_returnflag").df
    },

    // df.dot(other) (frame.py:1458): big-side melt + broadcast weight
    // matrix + partial-agg sum, via PFrame.dot
    "rs_dot" -> { (s, d) =>
      import s.implicits._
      // bal through the decimal-sum discipline: a raw double sum over
      // 1.5M rows differs between engines by an ulp (order-sensitive),
      // which the sf1 differential caught flipping round(.., 6)
      val a = Tables(s, d, "customer")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).cast("double").as("n"),
          sum($"c_acctbal".cast("decimal(38,6)")).cast("double").as("bal"))
      val weights = Seq(("n", 1.0, 0.5), ("bal", 0.001, 2.0))
        .toDF("j", "w1", "w2")
      graft.api.PFrame(a).dot(graft.api.PFrame(weights), "c_mktsegment", "j")
        .df.select($"c_mktsegment",
          round($"w1", 6).as("w1"), round($"w2", 6).as("w2"))
    }
  )

  def oracle: Map[String, String] = Map(
    "rs_pivot_fill" ->
      """SELECT o_orderpriority,
         COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE), 0) AS F,
         COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE), 0) AS O,
         COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE), 0) AS P
         FROM orders WHERE o_totalprice > 450000 GROUP BY o_orderpriority""",

    "rs_pivot" ->
      """SELECT o_orderpriority,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS F,
         CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS O,
         CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS P
         FROM orders GROUP BY o_orderpriority""",

    "rs_pivot_multi" -> {
      val cols = Seq("F", "O", "P").map { st =>
        s"""CAST(SUM(CASE WHEN o_orderstatus = '$st' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS ${st}_rev,
         COUNT(CASE WHEN o_orderstatus = '$st' THEN 1 END) AS ${st}_n,
         ROUND(CAST(SUM(CASE WHEN o_orderstatus = '$st' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE)
           / COUNT(CASE WHEN o_orderstatus = '$st' THEN 1 END), 6) AS ${st}_avg"""
      }.mkString(",\n         ")
      s"""SELECT o_orderpriority,
         $cols
         FROM orders GROUP BY o_orderpriority"""
    },

    "rs_crosstab_norm" -> {
      val cols = (0 to 24)
        .map(k => s"""ROUND(CAST(COUNT(CASE WHEN c_nationkey = $k THEN 1 END) AS DOUBLE) / COUNT(*), 6) AS "$k"""")
        .mkString(",\n         ")
      s"""SELECT c_mktsegment,
         $cols
         FROM customer GROUP BY c_mktsegment"""
    },

    "rs_explode_multi" ->
      """SELECT doc_id, word, LENGTH(word) AS wlen
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
               FROM documents WHERE doc_id < 50)""",

    "rs_crosstab_margins" -> {
      val cols = (0 to 6)
        .map(k => s"""COALESCE(COUNT(CASE WHEN c_nationkey = $k THEN 1 END), 0) AS "$k"""")
        .mkString(",\n         ")
      s"""SELECT COALESCE(c_mktsegment, 'All') AS c_mktsegment,
         $cols,
         COUNT(*) AS "All"
         FROM customer WHERE c_nationkey <= 6
         GROUP BY ROLLUP (c_mktsegment)"""
    },

    "rs_pivot_margins" ->
      """SELECT COALESCE(o_orderpriority, 'All') AS priority,
         COALESCE(o_orderstatus, 'All') AS status,
         COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
         FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""",

    "rs_cube" ->
      """SELECT COALESCE(o_orderpriority, 'All') AS priority,
         COALESCE(o_orderstatus, 'All') AS status,
         GROUPING(o_orderpriority, o_orderstatus) AS gid,
         COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
         FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)""",

    "rs_crosstab" -> {
      val cols = (0 to 24)
        .map(k => s"""COALESCE(COUNT(CASE WHEN c_nationkey = $k THEN 1 END), 0) AS "$k"""")
        .mkString(",\n         ")
      s"""SELECT c_mktsegment,
         $cols
         FROM customer GROUP BY c_mktsegment"""
    },

    "rs_melt" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val
         FROM lineitem WHERE l_orderkey < 200
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
         FROM lineitem WHERE l_orderkey < 200
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
         FROM lineitem WHERE l_orderkey < 200""",

    "rs_explode_words" ->
      """SELECT doc_id, unnest(string_split(text, ' ')) AS word
         FROM documents WHERE doc_id < 50""",

    "rs_get_dummies" ->
      """SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS status_F,
         CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS status_O,
         CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END AS status_P
         FROM orders""",

    "rs_get_dummies_opts" ->
      """WITH b AS (
           SELECT o_orderkey,
             CASE WHEN o_orderkey % 11 = 0 THEN NULL
                  ELSE o_orderpriority END AS prio
           FROM orders)
         SELECT o_orderkey,
           CASE WHEN prio = '2-HIGH' THEN 1 ELSE 0 END AS prio_2_HIGH,
           CASE WHEN prio = '3-MEDIUM' THEN 1 ELSE 0 END AS prio_3_MEDIUM,
           CASE WHEN prio = '4-NOT SPECIFIED' THEN 1 ELSE 0 END AS prio_4_NOT_SPECIFIED,
           CASE WHEN prio = '5-LOW' THEN 1 ELSE 0 END AS prio_5_LOW,
           CASE WHEN prio IS NULL THEN 1 ELSE 0 END AS prio_nan
         FROM b""",

    "rs_cut" ->
      """SELECT CASE WHEN o_totalprice <= 100000 THEN '(0, 100k]'
                     WHEN o_totalprice <= 250000 THEN '(100k, 250k]'
                     WHEN o_totalprice <= 400000 THEN '(250k, 400k]'
                     ELSE '(400k, inf]' END AS price_bin,
         COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY 1""",

    "rs_cut_labels" ->
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
                     WHEN o_totalprice < 250000 THEN 'mid'
                     WHEN o_totalprice < 400000 THEN 'high'
                     ELSE 'top' END AS price_label,
         COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY 1""",

    "rs_qcut" ->
      """SELECT q4, COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
         FROM (SELECT o_totalprice,
                 NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS q4
               FROM orders) t
         GROUP BY q4""",

    "rs_wide_to_long" ->
      """SELECT o_orderkey, 2024 AS year, o_totalprice AS rev,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr
         FROM orders WHERE o_orderkey < 5000
         UNION ALL
         SELECT o_orderkey, 2025, o_totalprice * 1.1,
           CAST(EXTRACT(year FROM o_orderdate) + 1 AS INT)
         FROM orders WHERE o_orderkey < 5000""",

    "rs_unstack_multi" ->
      """SELECT l_returnflag,
         CAST(SUM(CASE WHEN l_linestatus = 'F' AND l_quantity <= 25 THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE) AS "F_lo",
         CAST(SUM(CASE WHEN l_linestatus = 'F' AND l_quantity > 25 THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE) AS "F_hi",
         CAST(SUM(CASE WHEN l_linestatus = 'O' AND l_quantity <= 25 THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE) AS "O_lo",
         CAST(SUM(CASE WHEN l_linestatus = 'O' AND l_quantity > 25 THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE) AS "O_hi"
         FROM lineitem GROUP BY l_returnflag""",

    "rs_nested_struct" ->
      """SELECT doc_id,
         '{lang:' || lang || ',n_chars:' || CAST(n_chars AS VARCHAR) || '}' AS meta_json,
         lang AS lang_field,
         CAST(len(string_split(text, ' ')[1:3]) AS INT) AS n_head,
         array_to_string(string_split(text, ' ')[1:3], ' ') AS head_str
         FROM documents""",

    "rs_from_dummies" ->
      """SELECT o_orderkey, o_orderstatus AS status_reconstructed FROM orders""",

    "rs_stack" ->
      """SELECT s_suppkey, 's_name' AS attr, s_name AS val FROM supplier
         UNION ALL
         SELECT s_suppkey, 's_nation', CAST(s_nationkey AS VARCHAR) FROM supplier""",

    "rs_qcut_dupdrop" ->
      """WITH es AS (
           SELECT list_distinct(list_transform(
             quantile_cont(l_quantity, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
             e -> ROUND(e, 6))) AS es
           FROM lineitem),
         binned AS (
           SELECT l.l_quantity,
             list_sum(list_transform(e.es,
               x -> CASE WHEN l.l_quantity > x THEN 1 ELSE 0 END)) AS bin
           FROM lineitem l, es e)
         SELECT CAST(COALESCE(bin, 0) AS BIGINT) AS bin, COUNT(*) AS n,
           MIN(l_quantity) AS lo, MAX(l_quantity) AS hi
         FROM binned GROUP BY 1""",

    "rs_transpose" ->
      """WITH a AS (
           SELECT l_returnflag AS f,
             CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
             CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
             CAST(COUNT(*) AS DOUBLE) AS n
           FROM lineitem GROUP BY 1)
         SELECT 'sum_qty' AS metric,
           MAX(CASE WHEN f = 'A' THEN sum_qty END) AS "A",
           MAX(CASE WHEN f = 'N' THEN sum_qty END) AS "N",
           MAX(CASE WHEN f = 'R' THEN sum_qty END) AS "R" FROM a
         UNION ALL
         SELECT 'max_price',
           MAX(CASE WHEN f = 'A' THEN max_price END),
           MAX(CASE WHEN f = 'N' THEN max_price END),
           MAX(CASE WHEN f = 'R' THEN max_price END) FROM a
         UNION ALL
         SELECT 'n',
           MAX(CASE WHEN f = 'A' THEN n END),
           MAX(CASE WHEN f = 'N' THEN n END),
           MAX(CASE WHEN f = 'R' THEN n END) FROM a""",

    "rs_dot" ->
      """WITH a AS (
           SELECT c_mktsegment,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS bal
           FROM customer GROUP BY 1)
         SELECT c_mktsegment,
           ROUND(n * 1.0 + bal * 0.001, 6) AS w1,
           ROUND(n * 0.5 + bal * 2.0, 6) AS w2
         FROM a"""
  )
}
