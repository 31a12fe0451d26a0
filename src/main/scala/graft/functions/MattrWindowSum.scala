package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Σ over all `w`-token sliding windows of the window's DISTINCT-type
  * count — the numerator of MATTR ([[graft.ops.TextOps.mattr]]).
  *
  * The composable form (`transform(sequence(...), i ->
  * size(array_distinct(slice(ws, i, w))))` → `aggregate`) re-builds and
  * re-deduplicates every window from scratch: O(len·w) interpreted HOF
  * work with per-element boxing. This expression maintains ONE sliding
  * count-map — add the entering token, drop the leaving one, track the
  * live distinct count — O(len) with a single map, inside whole-stage
  * codegen via the precompiled-loop reference pattern
  * ([[QuantizeInt8]]). Measured at sf0.1: warm wall 1.25 s → 0.7 s,
  * task time ~4× down.
  *
  * Semantics match the HOF form exactly (it remains the spec twin):
  * windows are the 1-based slices `[i, i+w)` for i ∈ [1, len−w+1]
  * (zero windows when len < w — callers take the plain-TTR branch
  * there); a NULL element counts as one distinct value, exactly as
  * `array_distinct` keeps a single null.
  */
case class MattrWindowSum(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 1, s"window must be >= 1 (got $w)")

  override def dataType: DataType = LongType

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mattr_window_sum expects array<string>, got ${t.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** The sliding count-map loop; also the codegen target. */
  def compute(v: ArrayData): Long = {
    val n = v.numElements()
    if (n < w) return 0L
    // null key allowed: a null token is one distinct value, matching
    // array_distinct's single-null semantics
    val counts = new java.util.HashMap[AnyRef, Integer]()
    var distinct = 0
    var sum = 0L
    var i = 0
    while (i < n) {
      val in = if (v.isNullAt(i)) null else v.getUTF8String(i)
      val c = counts.get(in)
      if (c == null || c == 0) distinct += 1
      counts.put(in, if (c == null) 1 else c + 1)
      if (i >= w) {
        val j = i - w
        val out = if (v.isNullAt(j)) null else v.getUTF8String(j)
        val oc = counts.get(out)
        if (oc == 1) distinct -= 1
        counts.put(out, oc - 1)
      }
      if (i >= w - 1) sum += distinct
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mattrWindowSum", this,
      classOf[MattrWindowSum].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object MattrWindowSum {
  /** Column-level entry point. */
  def mattrWindowSumCompiled(ws: Column, w: Int): Column =
    ColumnBridge.column(MattrWindowSum(ColumnBridge.expression(ws), w))
}
