package graft.functions

import java.text.Normalizer
import java.util.Locale

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** NFKC-normalize + lowercase + trim, as a native Catalyst expression
  * with whole-stage codegen — the engine form of the reference's `norm`
  * (transformer_loader/main.py:62-73), its accent/width-tolerant name
  * matcher ("FerroiLlautó" fixture, utils/check_rank.py:76).
  *
  * Spark SQL has no NFKC built-in (SURVEY.md §2.10); preference order
  * from the build rules says custom `Expression` with `doGenCode`
  * before a Scala UDF, so the hot entity-resolution path stays inside
  * WholeStageCodegen instead of falling out to a black-box lambda.
  */
case class NormalizeNFKC(child: Expression)
    extends UnaryExpression {

  // Declared input type: a non-string argument is an ANALYSIS error,
  // never a runtime ClassCastException inside generated code.
  // (ExpectsInputTypes would be the idiomatic carrier, but its
  // AbstractDataType signature is private[sql] — checkInputDataTypes
  // is the public extension point.)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "norm_nfkc"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      NormalizeNFKC.norm(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.NormalizeNFKC.norm($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNFKC =
    copy(child = newChild)
}

object NormalizeNFKC {
  /** The scalar kernel (also called from generated code). */
  def norm(s: String): String =
    Normalizer.normalize(s, Normalizer.Form.NFKC).toLowerCase(Locale.ROOT).trim

  private val FN = "norm_nfkc"

  /** Idempotently register `norm_nfkc` in the session's function
    * registry so it is usable from SQL and via [[normCol]]. */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(FN)))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FN, exprs => NormalizeNFKC(exprs.head), "built-in")

  /** Column form (requires [[register]] on the session first). */
  def normCol(c: Column): Column =
    org.apache.spark.sql.functions.call_function(FN, c)
}
