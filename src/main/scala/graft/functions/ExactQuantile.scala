package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Exact discrete quantile with count-map state — [[ExactMedian]]
  * generalized to any rational quantile `pctNum/pctDen` (25/100, 95/100,
  * ...). Same bounded-memory contract: state ∝ distinct values, two-phase
  * partial/final merge, only maps shuffle.
  *
  * Quantile convention: the element at ascending 1-based rank
  * `max(1, ceil(q·n))`, computed in INTEGER arithmetic as
  * `(pctNum·n + pctDen − 1) div pctDen` — no float multiply decides a
  * rank, so `q = 95/100` over `n = 40` is rank 38 on every engine
  * (double arithmetic would put `0.95·40` a hair above 38 and ceil it to
  * 39). For `pctNum/pctDen = 1/2` this is exactly [[ExactMedian]]'s
  * lower median. NULLs are ignored; an empty group is NULL.
  */
case class ExactQuantile(
    child: Expression,
    pctNum: Int,
    pctDen: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  require(pctDen > 0 && pctNum >= 0 && pctNum <= pctDen,
    s"quantile $pctNum/$pctDen out of [0,1]")

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = true

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"exact_quantile expects double (cast numerics first), got ${t.catalogString}")
    }

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buf: mutable.LongMap[Long], input: InternalRow)
      : mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bits = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
      buf.update(bits, buf.getOrElse(bits, 0L) + 1L)
    }
    buf
  }

  override def merge(buf: mutable.LongMap[Long], other: mutable.LongMap[Long])
      : mutable.LongMap[Long] = {
    other.foreachEntry((bits, c) =>
      buf.update(bits, buf.getOrElse(bits, 0L) + c))
    buf
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    if (buf.isEmpty) return null
    val keys = new Array[Double](buf.size)
    var i = 0
    buf.foreachKey { bits =>
      keys(i) = java.lang.Double.longBitsToDouble(bits); i += 1
    }
    java.util.Arrays.sort(keys)
    var total = 0L
    buf.foreachValue(total += _)
    // integer ceil(pctNum·total / pctDen), clamped to ≥ 1
    val rank = math.max(1L, (pctNum * total + pctDen - 1) / pctDen)
    var cum = 0L
    i = 0
    while (i < keys.length) {
      cum += buf(java.lang.Double.doubleToLongBits(keys(i)))
      if (cum >= rank) return keys(i)
      i += 1
    }
    keys(keys.length - 1) // unreachable: cum reaches total >= rank
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreachEntry((bits, c) => { bb.putLong(bits); bb.putLong(c) })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { buf.update(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactQuantile =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): ExactQuantile =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object ExactQuantile {
  /** Column entry point: exact discrete quantile pctNum/pctDen of a
    * numeric column.
    */
  def exactQuantile(c: Column, pctNum: Int, pctDen: Int): Column =
    ColumnBridge.column(
      ExactQuantile(ColumnBridge.expression(c.cast("double")),
        pctNum, pctDen).toAggregateExpression())
}
