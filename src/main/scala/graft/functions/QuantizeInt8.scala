package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Symmetric per-vector int8 quantization in one compiled pass:
  * scale = max|x|/127, element q = ⌊x/scale + 0.5⌋ ∈ [-127, 127],
  * emitted as exact-integer doubles (the representation the fused
  * [[CosineSimilarity]] inner loop consumes directly).
  *
  * The composable form (`transform` → `aggregate` → `transform` →
  * `transform` widen → `exists` guard) walks each vector five times
  * through interpreted HOF lambdas with per-element boxing — measured
  * ~10× the cost of the entire fp32 brute-force scan it was supposed to
  * undercut. This expression is two primitive passes (max-abs, then
  * quantize) inside whole-stage codegen.
  *
  * Semantics match the HOF form exactly (it is the spec twin):
  *   - NULL input → NULL row;
  *   - NULL elements are skipped by the scale pass and stay NULL in the
  *     output (scale > 0), exactly as `greatest(acc, abs(NULL)) = acc`
  *     then `floor(NULL/s + 0.5) = NULL`;
  *   - an all-zero (or empty) vector quantizes to all zeros — including
  *     formerly-NULL slots, matching `transform(dv, _ => lit(0L))` on
  *     the scale == 0 branch;
  *   - arithmetic is double-exact: cast element to double, divide by the
  *     double scale, add 0.5, ⌊·⌋ — floor is exactly specified on IEEE
  *     doubles, so any engine reproduces the identical integers
  *     (see oracle-parity notes on `txt_*` / `emb_*` queries).
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantize_int8 expects array<float|double>, got ${t.catalogString}")
    }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** The quantization loop in precompiled form; also the codegen target
    * ([[doGenCode]] calls it through a plan-time reference), keeping the
    * corpus scan inside whole-stage codegen.
    */
  def compute(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var maxAbs = 0.0
    var anyNull = false
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) anyNull = true
      else {
        val xi = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val a = math.abs(xi)
        if (a > maxAbs) maxAbs = a
      }
      i += 1
    }
    val scale = maxAbs / 127.0
    if (scale == 0.0) {
      // all-zero / all-null vector: the HOF twin's scale==0 branch maps
      // every slot (null or not) to 0
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(new Array[Double](n))
    } else if (!anyNull) {
      // fast path: primitive output, no boxing — downstream consumers
      // (the fused cosine loop) read it with getDouble at array speed
      val out = new Array[Double](n)
      i = 0
      while (i < n) {
        val xi = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        out(i) = math.floor(xi / scale + 0.5)
        i += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        if (!v.isNullAt(i)) {
          val xi = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
          out(i) = math.floor(xi / scale + 0.5)
        }
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantizeInt8", this,
      classOf[QuantizeInt8].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeInt8 {
  /** Column-level entry point: `quantize_int8(v)`. */
  def quantizeInt8Compiled(v: Column): Column =
    ColumnBridge.column(QuantizeInt8(ColumnBridge.expression(v)))
}
