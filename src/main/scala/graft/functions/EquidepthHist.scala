package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Equi-depth histogram from ONE count-map aggregate — the scale-safe
  * replacement for `NTILE(b) OVER (ORDER BY v, key)` + groupBy, which
  * plans an `Exchange SinglePartition` and sorts the whole fact table
  * in one task. This aggregate partial-merges a value→count map across
  * executors (the [[CountMapAggregate]] machinery shared with
  * [[ExactMedian]]/[[ExactQuantiles]]) and computes every bucket's
  * (n_rows, lo, hi) at eval time from the finished map with the exact
  * NTILE integer math:
  *
  *   q = n div b, r = n mod b;
  *   size(k) = q + (k <= r ? 1 : 0);
  *   start(k) = (k-1)·q + min(k-1, r) + 1; end(k) = start(k)+size(k)-1;
  *   lo(k) = value at rank start(k); hi(k) = value at rank end(k)
  *
  * Rank-k value counts multiplicity, so ties split across buckets by
  * the NTILE tie-break key produce identical lo/hi: v is non-decreasing
  * in the composite (v, key) order, so a bucket's min/max are exactly
  * the values at its boundary ranks regardless of how the key orders
  * equal values. Buckets with size 0 (n < b) emit no row, matching
  * groupBy over NTILE output.
  *
  * Memory contract: state ∝ distinct values (same as the quantile
  * family) — bounded for quantized domains (money at 2dp, token
  * counts); for genuinely unbounded continuous domains feed a
  * fixed-fraction sample instead.
  *
  * Result: array<struct<bucket:long, n_rows:long, lo:double,
  * hi:double>> — explode at the call site. Empty input → NULL.
  */
case class EquidepthHist(
    child: Expression,
    buckets: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends CountMapAggregate {

  require(buckets > 0, s"buckets must be positive, got $buckets")

  override protected def fnName: String = "equidepth_hist"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("bucket", LongType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("lo", DoubleType, nullable = false),
      StructField("hi", DoubleType, nullable = false))),
    containsNull = false)

  override def eval(buf: mutable.LongMap[Long]): Any = {
    if (buf.isEmpty) return null
    val keys = sortedKeys(buf)
    val n = totalCount(buf)
    val b = buckets.toLong
    val q = n / b
    val r = n % b
    // boundary ranks ascend with k: one cumulative walk resolves all
    val rows = mutable.ArrayBuffer.empty[InternalRow]
    var i = -1 // index into keys of the last consumed value
    var consumedUpTo = 0L // cumulative count after consuming keys(i)
    def valueAt(rank: Long): Double = {
      while (consumedUpTo < rank) {
        i += 1
        consumedUpTo += buf(java.lang.Double.doubleToLongBits(keys(i)))
      }
      keys(i)
    }
    var k = 1L
    while (k <= b) {
      val size = q + (if (k <= r) 1L else 0L)
      if (size > 0L) {
        val start = (k - 1L) * q + math.min(k - 1L, r) + 1L
        val end = start + size - 1L
        val lo = valueAt(start)
        val hi = valueAt(end)
        rows += InternalRow(k, size, lo, hi)
      }
      k += 1L
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): EquidepthHist =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): EquidepthHist =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object EquidepthHist {
  /** Column entry point: exact NTILE-semantics equi-depth buckets of a
    * numeric column from one partial-merged count-map aggregate.
    */
  def equidepthHist(c: Column, buckets: Int): Column =
    ColumnBridge.column(
      EquidepthHist(ColumnBridge.expression(c.cast("double")), buckets)
        .toAggregateExpression())
}
