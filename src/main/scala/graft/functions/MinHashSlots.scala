package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All `nSlots` MinHash values of a shingle array in ONE pass, as a
  * native codegen expression — the fused form of
  * `TextFns.minhash(col, i)` for i = 0 until nSlots (SURVEY.md §9
  * candidate). Slot i's value is the lexicographic minimum of
  * md5("&lt;i&gt;|" + shingle) over the array — bit-identical to the
  * composed built-ins, so the DuckDB oracle (`TextFns.minhashSql`)
  * is unchanged.
  *
  * Why fuse: the composed form traverses the array once per slot
  * through interpreted `transform` lambdas (CodegenFallback) and
  * allocates a boxed md5 string per (element, slot); this expression
  * is a single generated call into a tight JVM loop with a reused
  * ThreadLocal MessageDigest and zero per-element boxing. Still a
  * narrow per-row map — no shuffle, pipelines into any surrounding
  * scan at any scale.
  */
case class MinHashSlots(child: Expression, nSlots: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_slots"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSlots.compute(input.asInstanceOf[ArrayData], nSlots)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSlots.compute($c, $nSlots)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSlots =
    copy(child = newChild)
}

object MinHashSlots {

  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  private val HEX = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): UTF8String = {
    val out = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = HEX(b >>> 4).toByte
      out(i * 2 + 1) = HEX(b & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  // "<slot>|" prefixes are shared across rows (keyed by nSlots): the
  // per-row tabulate + string-format of the earlier version was 8 small
  // allocations per ROW before any hashing started.
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]
  private def prefixes(nSlots: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(nSlots,
      n => Array.tabulate(n)(i => s"$i|".getBytes("UTF-8")))

  // Unsigned byte-wise less-than over two 16-byte digests. Hex encoding
  // is order-isomorphic to the raw bytes (each byte maps to two hex
  // chars most-significant first), so comparing raw digests is
  // bit-identical to comparing their hex strings.
  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** The kernel (also called from generated code): min md5 per slot,
    * null elements skipped (matching array_min-over-transform
    * semantics), all-null/empty input → null slots.
    *
    * Allocation discipline (the driver env amplifies allocation-heavy
    * kernels 4-20×): minima are tracked as RAW 16-byte digests written
    * into a reused scratch buffer (`MessageDigest.digest(buf, off,
    * len)`), swapped — not copied — when a new minimum appears, and
    * hexified ONCE per row for only the nSlots winners. The earlier
    * version allocated a 32-byte hex UTF8String per (element, slot):
    * ~n_shingles × nSlots allocations per row vs ≤ nSlots here. */
  def compute(arr: ArrayData, nSlots: Int): ArrayData = {
    val md = digests.get()
    val pfx = prefixes(nSlots)
    val mins = new Array[Array[Byte]](nSlots)
    var scratch = new Array[Byte](16)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val sBytes = arr.getUTF8String(i).getBytes
        var slot = 0
        while (slot < nSlots) {
          md.reset()
          md.update(pfx(slot))
          md.update(sBytes)
          md.digest(scratch, 0, 16)
          if (mins(slot) == null) {
            mins(slot) = scratch
            scratch = new Array[Byte](16)
          } else if (lessThan(scratch, mins(slot))) {
            val prev = mins(slot)
            mins(slot) = scratch
            scratch = prev
          }
          slot += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](nSlots)
    var slot = 0
    while (slot < nSlots) {
      if (mins(slot) != null) out(slot) = hex(mins(slot))
      slot += 1
    }
    new GenericArrayData(out)
  }

  private val FN = "minhash_slots"

  /** Idempotently register `minhash_slots(arr, nSlots)` (nSlots must
    * be a foldable integer literal). */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(FN)))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FN,
      exprs => MinHashSlots(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue()),
      "built-in")

  /** Column form (requires [[register]] on the session first). */
  def slotsCol(c: Column, nSlots: Int): Column =
    org.apache.spark.sql.functions.call_function(
      FN, c, org.apache.spark.sql.functions.lit(nSlots))
}
