package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Dot product of two `array<float>` columns in double, as a native
  * codegen expression — the hot kernel of every similarity query
  * (q37/q38/q53/q60 cosine, q39 verify). Semantics are EXACTLY the
  * higher-order-function form
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0D, +)`:
  * left-to-right double accumulation (bit-identical sums, so the
  * DuckDB oracles are unchanged), null result when lengths differ or
  * any element is null (zip_with/aggregate's null propagation). The
  * HOF form is CodegenFallback — interpreted with a boxed lambda call
  * per element; this is a generated call into a tight primitive loop.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f"

  // Can return null even for non-null inputs (length mismatch, null
  // element) — without this override the planner would treat the
  // output slot as non-nullable and a folded null reads back as 0.0.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<FLOAT> arguments, got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductF.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dot")
      s"""
         |java.lang.Double $r = graft.functions.DotProductF.dotOrNull($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance between two `array<double>` columns, as a
  * native codegen expression — the assignment kernel of k-means
  * (q85/q86/q89), where the higher-order form
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0D, +)` would run
  * an interpreted boxed lambda per element × k centroids per row.
  * Accumulation is the identical left-to-right double fold (the DuckDB
  * list-comprehension mirror is unchanged, bit for bit); null on
  * length mismatch or null element, matching zip_with/aggregate. */
case class SqDistF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sqdist_f"

  // Null even for non-null inputs (length mismatch, null element) —
  // same hazard as DotProductF: without the override a folded null
  // would read back as 0.0 from a non-nullable slot.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<DOUBLE> arguments, got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SqDistF.sqDistOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("sqd")
      s"""
         |java.lang.Double $r = graft.functions.SqDistF.sqDistOrNull($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistF =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance between two `array<int>` columns as a LONG, as
  * a native codegen expression — the int8-codes candidate kernel of
  * the SQ serving stack (q72 brute scan, q103 cell scan), where the
  * higher-order form `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)),
  * 0, +)` runs an interpreted boxed lambda per element over every
  * candidate row. Accumulation is exact integer arithmetic (codes are
  * 0..255, so a 64-dim sum tops out at ~4.2M — far inside long), so
  * the result is value-identical to the HOF fold and the DuckDB
  * mirrors are unchanged; null on length mismatch or null element,
  * matching zip_with/aggregate. */
case class SqDistI(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sqdist_i"

  // Null even for non-null inputs (length mismatch, null element) —
  // same hazard as DotProductF: without the override a folded null
  // would read back as 0 from a non-nullable slot.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<INT> arguments, got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SqDistI.sqDistOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("sqdi")
      s"""
         |java.lang.Long $r = graft.functions.SqDistI.sqDistOrNull($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistI =
    copy(left = newLeft, right = newRight)
}

object SqDistI {

  /** The kernel (also called from generated code). */
  def sqDistOrNull(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      // widen BEFORE subtracting: sqdist_i is registered as a public
      // SQL function over general ARRAY<INT>, and (Int.MaxValue - -1)
      // in 32-bit silently wraps to 0 — the long diff is exact for the
      // full int domain (accumulator overflow needs ~2^62/diff^2
      // elements, beyond any real vector)
      val d = a.getInt(i).toLong - b.getInt(i).toLong
      acc += d * d
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  private val FN = "sqdist_i"

  /** Idempotently register `sqdist_i(a, b)`. */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(FN)))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FN, exprs => SqDistI(exprs.head, exprs(1)), "built-in")

  /** Column form (requires [[register]] on the session first). */
  def distCol(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(FN, a, b)
}

object SqDistF {

  /** The kernel (also called from generated code). */
  def sqDistOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  private val FN = "sqdist_f"

  /** Idempotently register `sqdist_f(a, b)`. */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(FN)))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FN, exprs => SqDistF(exprs.head, exprs(1)), "built-in")

  /** Column form (requires [[register]] on the session first). */
  def distCol(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(FN, a, b)
}

object DotProductF {

  /** The kernel (also called from generated code). Null on length
    * mismatch or null elements — matching zip_with + aggregate. */
  def dotOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  private val FN = "dot_f"

  /** Idempotently register `dot_f(a, b)`. */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(FN)))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FN, exprs => DotProductF(exprs.head, exprs(1)), "built-in")

  /** Column form (requires [[register]] on the session first). */
  def dotCol(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(FN, a, b)
}
