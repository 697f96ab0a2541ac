package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import PortableHash._

/** Custom Catalyst expressions for the MinHash pipeline.
  *
  * The higher-order-function formulation (transform/aggregate lambdas)
  * is oracle-friendly but interpreted per element — profiling showed
  * it dominating `dedup_minhash_pairs` (SCALE.md round-2 target #1).
  * These expressions compute the same values in tight JVM loops:
  *
  *   - [[PolyHash]]: the portable polynomial string hash, with full
  *     codegen (`doGenCode`) so it stays inside whole-stage codegen;
  *   - [[ShingleHashes]]: text -> distinct word-3-gram shingle hash
  *     array in one pass (split, shingle, hash, dedupe);
  *   - [[MinHashBandKeys]]: shingle-hash array -> the NumBands LSH
  *     band keys, evaluating all NumPerms permutations per element in
  *     one loop.
  *
  * Semantics are bit-identical to the HOF versions (same constants,
  * same integer arithmetic), so the DuckDB oracles are unchanged —
  * PortableHashSpec pins the constants.
  */
object MinHashExprs {

  /** register SQL functions so queries can use expr("...") without
    * depending on version-specific Column construction APIs */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_poly_hash",
      exprs => PolyHash(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_shingle_hashes",
      exprs => ShingleHashes(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_minhash_bands",
      exprs => MinHashBandKeys(exprs.head), "scala_udf")
  }

  private[functions] def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      acc = (acc * 31 + str.charAt(i)) % P
      i += 1
    }
    acc
  }
}

/** Codegen'd portable polynomial hash of a string (graft_poly_hash). */
case class PolyHash(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    MinHashExprs.polyHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |String $s = $c.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $acc = ($acc * 31L + $s.charAt($i)) % ${P}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text -> distinct word-3-gram shingle hashes (graft_shingle_hashes).
  * One JVM pass; equivalent to
  * transform(array_distinct(shingles(text)), wordHash).
  */
case class ShingleHashes(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (words.length < 3) return new GenericArrayData(Array.empty[Long])
    val seenShingle = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + 2 < words.length) {
      seenShingle.add(words(i) + " " + words(i + 1) + " " + words(i + 2))
      i += 1
    }
    val out = new Array[Long](seenShingle.size)
    val it = seenShingle.iterator()
    var j = 0
    while (it.hasNext) {
      val s = it.next()
      var acc = 0L
      var k = 0
      while (k < s.length) { acc = (acc * 31 + s.charAt(k)) % P; k += 1 }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** shingle-hash array -> LSH band keys (graft_minhash_bands): all
  * NumPerms permutations in one loop over the hashes.
  */
case class MinHashBandKeys(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val mins = Array.fill(NumPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var k = 0
      while (k < NumPerms) {
        val v = (permA(k) * h + permB(k)) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    val bands = new Array[Long](NumBands)
    var b = 0
    while (b < NumBands) {
      var acc = 0L
      var pos = 0
      while (pos < BandSize) {
        acc += mins(b * BandSize + pos) * BandPow(pos)
        pos += 1
      }
      bands(b) = acc
      b += 1
    }
    new GenericArrayData(bands)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
