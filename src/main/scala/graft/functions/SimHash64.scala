package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** 64-bit SimHash of a token array in one compiled pass: per-token XXH64
  * (seed 42 — the same primitive and seed as Spark's `xxhash64`), a ±1 vote
  * per bit position per token occurrence (duplicates vote each time), sign
  * of the vote sum → bit.
  *
  * Why a custom expression: the declarative formulation explodes tokens and
  * runs 64 `sum(when(...))` aggregates — a corpus-sized shuffle keyed by
  * doc_id plus 64 conditional branches per token row, and a self-joining
  * consumer (banded pair generation) pays it twice. Here the fingerprint
  * never leaves the row: zero shuffle, one tight loop per document.
  * Bit-identical to the aggregate formulation (spec-checked): arithmetic
  * vs logical shift is irrelevant under `& 1`, and a strict `votes > 0`
  * sets the bit, so an all-zero vote vector (empty doc) maps to 0L.
  *
  * Null array elements vote 0 (the aggregate form's explicit null guard);
  * a NULL input array yields NULL — callers that want the empty-doc
  * convention coalesce to 0L.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<string>, got ${t.catalogString}")
    }

  private val seed = 42L

  /** The whole fingerprint pass; also the codegen target (called from the
    * generated projection so the stage stays in whole-stage codegen).
    */
  def compute(tokens: ArrayData): Long = {
    val m = tokens.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < m) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
          t.numBytes, seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHash64", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  /** Column entry point: the 64-bit SimHash fingerprint of a token array. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
}
