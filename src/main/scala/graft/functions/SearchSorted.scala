package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Range-bucket id by BINARY SEARCH over a sorted literal bounds
  * array: the O(log n)-per-row replacement for the literal
  * `when`-chain fold GlobalOrder and the keyless as-of used to build
  * (`Σ when(v > bᵢ, 1)`). At 256 shuffle partitions that fold is a
  * 255-node expression tree — too large to stay on the fast codegen
  * path — and evaluating it per row turned a 15M-row ordinal
  * assignment into 60 s and the sf100 qcut into 31 MINUTES. One
  * generated `Arrays.binarySearch` call per row restores scan-speed
  * bucketing and keeps the whole projection inside whole-stage
  * codegen, with the bounds array shipped once as a reference object
  * (the same footprint RangePartitioner's bounds broadcast has).
  *
  * Semantics (bounds sorted ascending, DISTINCT — the callers
  * `.distinct.sorted` first):
  *   - strict (inclusive=false): count of bounds strictly below v —
  *     bit-equal to the `v > b` fold, including `NULL → 0` and
  *     NaN-greatest (SQL comparison orders NaN above every double);
  *   - inclusive=true: count of bounds at or below v — bit-equal to
  *     the `v >= b` fold.
  */
case class SearchSorted(child: Expression, bounds: Array[Double],
                        inclusive: Boolean) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  // fold contract: when(null > b, 1).otherwise(0) summed to 0 — the
  // bucket is 0 for null input, never SQL NULL
  override def nullable: Boolean = false

  private def bucket(v0: Double): Int = {
    // NaN: Spark SQL comparison (and Double.compare, hence
    // binarySearch's insertion point) both order NaN GREATEST, so the
    // natural insertion point = bounds.length matches the fold —
    // and puts NaN in the last bucket, where it also sorts.
    // ±0.0: Spark's nanSafeCompareDoubles treats -0.0 == 0.0 but
    // Double.compare (binarySearch) orders -0.0 < 0.0 — normalize the
    // probe (bounds are normalized in bucketOf) so Spark-equal keys
    // never split across adjacent buckets.
    val v = if (v0 == 0.0) 0.0 else v0
    val i = java.util.Arrays.binarySearch(bounds, v)
    if (i >= 0) { if (inclusive) i + 1 else i } else -i - 1
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0 else bucket(v.asInstanceOf[Double])
  }

  override def nullSafeEval(input: Any): Any =
    bucket(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // hand-rolled (not nullSafeCodeGen): output is non-nullable but a
    // null input must yield bucket 0
    val childGen = child.genCode(ctx)
    val b = ctx.addReferenceObj("ssBounds", bounds, "double[]")
    val v = ctx.freshName("v")
    val i = ctx.freshName("i")
    val hit = if (inclusive) s"$i + 1" else i
    val body =
      s"""
         |${childGen.code}
         |int ${ev.value} = 0;
         |if (!(${childGen.isNull})) {
         |  double $v = (double) ${childGen.value};
         |  if ($v == 0.0d) $v = 0.0d;
         |  int $i = java.util.Arrays.binarySearch($b, $v);
         |  ${ev.value} = ($i >= 0) ? ($hit) : (-$i - 1);
         |}
       """.stripMargin
    ev.copy(code = code"$body", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SearchSorted =
    copy(child = newChild)
}

object SearchSorted {
  /** bucket id column over a DOUBLE-typed column: count of `bounds`
    * strictly below (inclusive=false) or at-or-below (true) the value;
    * null → bucket 0; NaN → last bucket (NaN-greatest, matching both
    * SQL comparison and sort order). Bounds are -0.0-normalized,
    * deduplicated and sorted here. */
  def bucketOf(v: Column, bounds: Seq[Double], inclusive: Boolean): Column =
    GraftSqlBridge.exprColumn(SearchSorted(
      GraftSqlBridge.columnExpr(v),
      bounds.map(b => if (b == 0.0) 0.0 else b).distinct.sorted.toArray,
      inclusive))
}
