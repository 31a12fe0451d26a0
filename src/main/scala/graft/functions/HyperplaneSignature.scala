package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Random-hyperplane LSH signature in one compiled pass: bit j of the
  * result is the sign of ⟨v, planes(j)⟩.
  *
  * The composable form evaluates one interpreted `aggregate(zip_with(...))`
  * per hyperplane per row — nBits interpreted array walks (HOFs never
  * codegen). This expression walks the vector once per plane inside a
  * single JVM loop over a primitive plane matrix captured at plan time;
  * on the ANN corpus scan (every row, every signature build) that is the
  * difference between the signature being free and being the bottleneck.
  *
  * NULL input → NULL; a vector whose dimension disagrees with the plane
  * matrix → NULL (the zip_with form's null-padding semantics).
  */
case class HyperplaneSignature(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 64,
    "1..64 hyperplanes fit a long signature")

  override def dataType: DataType = LongType

  // NULL for vectors containing NULL elements, regardless of input nullability
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_signature expects array<float|double>, got ${t.catalogString}")
    }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** The signature loop in precompiled form; also the codegen target (a
    * boxed Long so the NULL-element case survives the JNI-free call —
    * [[doGenCode]] unboxes). Keeping this out of CodegenFallback keeps the
    * ANN corpus scan inside whole-stage codegen.
    */
  def compute(input: ArrayData): java.lang.Long = {
    val m = input.numElements()
    // a vector with NULL elements has no meaningful signature; neither
    // does one whose dimension disagrees with the plane matrix — a
    // common-prefix dot would hand a corrupt vector a plausible-looking
    // signature and file it into arbitrary LSH bands (the composed
    // zip_with form returns NULL here; this matches it)
    if (planes.nonEmpty && planes(0).length != m) return null
    var k = 0
    while (k < m) { if (input.isNullAt(k)) return null; k += 1 }
    // copy through the ArrayData accessor ONCE: the plane loop below
    // re-reads every element planes.length times, and primitive array
    // reads beat repeated Unsafe accessor calls on this hot path
    val v = new Array[Double](m)
    k = 0
    while (k < m) {
      v(k) = if (isFloat) input.getFloat(k).toDouble else input.getDouble(k)
      k += 1
    }
    var sig = 0L
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      var dot = 0.0
      var i = 0
      while (i < m) { dot += v(i) * p(i); i += 1 }
      if (dot >= 0) sig |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneSignature", this,
      classOf[HyperplaneSignature].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sig")
      s"""
         |java.lang.Long $r = $ref.compute($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // planes are part of the expression's identity for plan equality
  override def equals(o: Any): Boolean = o match {
    case h: HyperplaneSignature =>
      h.child == child && java.util.Arrays.deepEquals(
        planes.asInstanceOf[Array[AnyRef]], h.planes.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.deepHashCode(
      planes.asInstanceOf[Array[AnyRef]])
}

object HyperplaneSignature {
  def hyperplaneSignature(v: Column, planes: Array[Array[Double]]): Column =
    ColumnBridge.column(
      HyperplaneSignature(ColumnBridge.expression(v), planes))
}
