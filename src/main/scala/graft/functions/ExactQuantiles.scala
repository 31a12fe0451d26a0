package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Many exact quantiles from ONE count-map — the multi-quantile form of
  * [[ExactQuantile]]. N independent `ExactQuantile` aggregates each carry
  * their own value→count map through the shuffle (N× identical state);
  * this aggregate shares a single map across all requested quantiles and
  * resolves every rank in one sorted cumulative walk at eval. Same
  * bounded-memory contract (state ∝ distinct values), same integer rank
  * rule per quantile (`(num·n + den − 1) div den`, clamped ≥ 1), NULLs
  * ignored, empty group → NULL (not an empty array).
  */
case class ExactQuantiles(
    child: Expression,
    pctNums: Seq[Int],
    pctDen: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  require(pctNums.nonEmpty, "at least one quantile required")
  require(pctDen > 0 && pctNums.forall(n => n >= 0 && n <= pctDen),
    s"quantiles ${pctNums.mkString(",")}/$pctDen out of [0,1]")

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"exact_quantiles expects double (cast numerics first), got ${t.catalogString}")
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
    // resolve all ranks in one cumulative walk: ranks ascending with
    // their output slot, values ascending alongside
    val ranks = pctNums.zipWithIndex
      .map { case (num, slot) =>
        (math.max(1L, (num.toLong * total + pctDen - 1) / pctDen), slot)
      }
      .sortBy(_._1)
    val out = new Array[Any](pctNums.length)
    var cum = 0L
    var r = 0
    i = 0
    while (i < keys.length && r < ranks.length) {
      cum += buf(java.lang.Double.doubleToLongBits(keys(i)))
      while (r < ranks.length && cum >= ranks(r)._1) {
        out(ranks(r)._2) = keys(i)
        r += 1
      }
      i += 1
    }
    new GenericArrayData(out)
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

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactQuantiles =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): ExactQuantiles =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object ExactQuantiles {
  /** Column entry point: exact discrete quantiles num(i)/den of a numeric
    * column, one shared count-map, array result in input order.
    */
  def exactQuantiles(c: Column, pctNums: Seq[Int], pctDen: Int): Column =
    ColumnBridge.column(
      ExactQuantiles(ColumnBridge.expression(c.cast("double")),
        pctNums, pctDen).toAggregateExpression())
}
