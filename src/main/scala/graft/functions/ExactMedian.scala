package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Exact lower-median aggregate with count-map state — the bounded-memory
  * exact twin of `percentile_approx` (SURVEY.md §7.3 stretch).
  *
  * State is a value→count map, so memory is proportional to the number of
  * DISTINCT values in the group, not the group size — the right exact
  * shape for value-bounded domains (counts, prices, scores), where a
  * billion-row group still carries only thousands of map entries through
  * the partial/final merge. Spark runs this as a proper two-phase
  * aggregate: map-side partials fold rows locally and only the maps
  * shuffle. For genuinely unbounded domains the map degenerates to the
  * group size and the GK sketch (`percentile_approx`, q6_median_approx)
  * remains the scale path — the reference's own choice (`CLEAN:243`).
  *
  * Median convention: the LOWER median — the element at ascending rank
  * floor((n+1)/2) — matching `Queries.lowerMedian` (window formulation)
  * and the DuckDB oracle's `rn = floor((cnt+1)/2)`. NULL inputs are
  * ignored; an all-NULL (or empty) group evaluates to NULL. -0.0 and 0.0
  * are distinct map keys but sort adjacently, so ranks are unaffected.
  *
  * Buffer/merge/serialization live in [[CountMapAggregate]], shared with
  * [[ExactQuantile]] and [[ExactQuantiles]].
  */
case class ExactMedian(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends CountMapAggregate {

  override protected def fnName: String = "exact_median"

  override def dataType: DataType = DoubleType

  override def eval(buf: mutable.LongMap[Long]): Any = {
    if (buf.isEmpty) return null
    // lower median = rank ceil(total/2) = (total+1)/2, 1-based
    valueAtRank(buf, sortedKeys(buf), rankOf(1, 2, totalCount(buf)))
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactMedian =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): ExactMedian =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object ExactMedian {
  /** Column entry point: exact lower median of a numeric column. */
  def exactMedian(c: Column): Column =
    ColumnBridge.column(
      ExactMedian(ColumnBridge.expression(c.cast("double")))
        .toAggregateExpression())
}
