package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** String-accessor expressions Spark lacks natively.
  *
  * pandas `Series.str.normalize` (core/strings/accessor.py:3236 →
  * unicodedata.normalize) has no Spark SQL builtin; this is the
  * preferred extension shape from SURVEY §2.11 — a codegen'd unary
  * Catalyst expression, so it stays inside whole-stage codegen rather
  * than dropping to a UDF. DuckDB's nfc_normalize is the oracle peer.
  */
object StringExprs {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_nfc",
      exprs => NfcNormalize(exprs.head), "scala_udf")
  }
}

/** Unicode NFC normalization (graft_nfc), java.text.Normalizer-backed. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
