package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Shared count-map machinery for the exact-quantile aggregate family
  * ([[ExactMedian]], [[ExactQuantile]], [[ExactQuantiles]]): ONE buffer
  * representation (double-bits → count `LongMap`), ONE update / merge,
  * ONE serialization format. The three aggregates differ only in how
  * they read ranks out of the finished map, so the state machinery —
  * which must stay bit-compatible across partial/final merge — cannot
  * drift apart between them.
  */
private[functions] trait CountMapAggregate
    extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  def child: Expression

  /** SQL-facing name for type-check messages. */
  protected def fnName: String

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$fnName expects double (cast numerics first), got ${t.catalogString}")
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

  /** Ascending distinct values present in the map. */
  protected def sortedKeys(buf: mutable.LongMap[Long]): Array[Double] = {
    val keys = new Array[Double](buf.size)
    var i = 0
    buf.foreachKey { bits =>
      keys(i) = java.lang.Double.longBitsToDouble(bits); i += 1
    }
    java.util.Arrays.sort(keys)
    keys
  }

  protected def totalCount(buf: mutable.LongMap[Long]): Long = {
    var total = 0L
    buf.foreachValue(total += _)
    total
  }

  /** 1-based rank `max(1, ceil(num·total/den))` in INTEGER arithmetic —
    * no float multiply decides a rank (double `0.95·40` lands a hair
    * above 38 and ceils to 39 on some engines; `(95·40+99) div 100` is
    * 38 everywhere).
    */
  protected def rankOf(num: Long, den: Long, total: Long): Long =
    math.max(1L, (num * total + den - 1) / den)

  /** Value at the 1-based `rank` of the cumulative count walk. */
  protected def valueAtRank(buf: mutable.LongMap[Long], keys: Array[Double],
      rank: Long): Double = {
    var cum = 0L
    var i = 0
    while (i < keys.length) {
      cum += buf(java.lang.Double.doubleToLongBits(keys(i)))
      if (cum >= rank) return keys(i)
      i += 1
    }
    keys(keys.length - 1) // unreachable: cum reaches total >= rank
  }
}
