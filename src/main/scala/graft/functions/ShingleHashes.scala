package graft.functions

import java.util.Arrays

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 64-bit hashes of the `n`-gram shingles of a token array, in one
  * compiled pass.
  *
  * Why a custom expression: the composable formulation
  * (`transform(sequence(...), i -> xxhash64(slice(tokens, i, n)))`) runs
  * every lambda through Spark's *interpreted* higher-order-function
  * evaluator — HOFs never enter whole-stage codegen — and allocates a
  * slice array per position. Measured on the 5000-doc corpus that was 9 s;
  * this expression does the same work in a single JVM loop: hash each
  * token once (XXH64 over the UTF8String bytes — the same primitive
  * Spark's `xxhash64` uses), chain n consecutive token hashes with
  * XXH64.hashLong, then sort+dedup a primitive long[].
  *
  * Output order is ascending (deduped); consumers treat shingle sets as
  * unordered, and downstream results depend only on set equality.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes expects array<string>, got ${t.catalogString}")
    }

  private val seed = 42L

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** The whole shingle-hash pass in one precompiled JVM loop; also the
    * codegen target ([[doGenCode]] emits a call to this, which keeps the
    * surrounding projection inside whole-stage codegen — a CodegenFallback
    * trait would eject the entire stage to the interpreted path).
    */
  def compute(tokens: ArrayData): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      val t = tokens.getUTF8String(i)
      th(i) = if (t == null) seed
        else XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
          t.numBytes, seed)
      i += 1
    }
    val out = new Array[Long](m - n + 1)
    i = 0
    while (i <= m - n) {
      var h = seed
      var j = 0
      while (j < n) { h = XXH64.hashLong(th(i + j), h); j += 1 }
      out(i) = h
      i += 1
    }
    Arrays.sort(out)
    var w = 1
    i = 1
    while (i < out.length) {
      if (out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == out.length) out else Arrays.copyOf(out, w))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashes", this,
      classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  /** Column entry point: distinct n-gram shingle hashes of a token array. */
  def shingleHashes(tokens: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokens), n))
}
