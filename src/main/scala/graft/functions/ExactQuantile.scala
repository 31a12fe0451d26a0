package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
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
  *
  * Buffer/merge/serialization live in [[CountMapAggregate]], shared with
  * [[ExactMedian]] and [[ExactQuantiles]].
  */
case class ExactQuantile(
    child: Expression,
    pctNum: Int,
    pctDen: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends CountMapAggregate {

  require(pctDen > 0 && pctNum >= 0 && pctNum <= pctDen,
    s"quantile $pctNum/$pctDen out of [0,1]")

  override protected def fnName: String = "exact_quantile"

  override def dataType: DataType = DoubleType

  override def eval(buf: mutable.LongMap[Long]): Any = {
    if (buf.isEmpty) return null
    valueAtRank(buf, sortedKeys(buf),
      rankOf(pctNum, pctDen, totalCount(buf)))
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
