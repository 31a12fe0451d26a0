package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
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
  *
  * Buffer/merge/serialization live in [[CountMapAggregate]], shared with
  * [[ExactMedian]] and [[ExactQuantile]].
  */
case class ExactQuantiles(
    child: Expression,
    pctNums: Seq[Int],
    pctDen: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends CountMapAggregate {

  require(pctNums.nonEmpty, "at least one quantile required")
  require(pctDen > 0 && pctNums.forall(n => n >= 0 && n <= pctDen),
    s"quantiles ${pctNums.mkString(",")}/$pctDen out of [0,1]")

  override protected def fnName: String = "exact_quantiles"

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def eval(buf: mutable.LongMap[Long]): Any = {
    if (buf.isEmpty) return null
    val keys = sortedKeys(buf)
    val total = totalCount(buf)
    // resolve all ranks in one cumulative walk: ranks ascending with
    // their output slot, values ascending alongside
    val ranks = pctNums.zipWithIndex
      .map { case (num, slot) => (rankOf(num, pctDen, total), slot) }
      .sortBy(_._1)
    val out = new Array[Any](pctNums.length)
    var cum = 0L
    var r = 0
    var i = 0
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
