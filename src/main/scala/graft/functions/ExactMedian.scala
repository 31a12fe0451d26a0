package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
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
  */
case class ExactMedian(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.LongMap[Long]] {

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
          s"exact_median expects double (cast numerics first), got ${t.catalogString}")
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
    buf.foreachKey { bits => keys(i) = java.lang.Double.longBitsToDouble(bits); i += 1 }
    java.util.Arrays.sort(keys)
    var total = 0L
    buf.foreachValue(total += _)
    val rank = (total + 1) / 2 // lower median, 1-based
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
