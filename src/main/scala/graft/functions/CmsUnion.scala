package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

/** Union of serialized count-min sketches — the MERGE half the built-in
  * `count_min_sketch` aggregate lacks in SQL (it builds a sketch from raw
  * rows; nothing re-aggregates stored sketch BINARIES). With this
  * aggregate the CMS becomes a first-class member of the mergeable-sketch
  * rollup family (HLL `hll_union_agg`, theta `theta_union_agg`, KLL
  * `kll_merge_agg_*`): per-shard frequency sketches stored once, any
  * coarser grouping derived by unioning partials — never re-scanning rows.
  *
  * CMS union is elementwise COUNTER ADDITION (`mergeInPlace`):
  * commutative and associative, so the merged sketch is BIT-identical to
  * the sketch built over the concatenated input in any grouping or order
  * (spec-pinned) — the deterministic end of the sketch spectrum, unlike
  * KLL's randomized compaction. Sketches must agree on depth/width/seed;
  * DataSketches-incompatible inputs surface as the underlying library's
  * IncompatibleMergeException.
  *
  * NULL inputs are skipped; an all-NULL group yields NULL.
  */
case class CmsUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CountMinSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  // null buffer = "no sketch seen yet": the first input's depth/width/seed
  // become the buffer's parameters
  override def createAggregationBuffer(): CountMinSketch = null

  private def read(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def update(buf: CountMinSketch, input: InternalRow)
      : CountMinSketch = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val incoming = read(v.asInstanceOf[Array[Byte]])
      if (buf == null) incoming else { buf.mergeInPlace(incoming); buf }
    }
  }

  override def merge(buf: CountMinSketch, other: CountMinSketch)
      : CountMinSketch =
    if (other == null) buf
    else if (buf == null) other
    else { buf.mergeInPlace(other); buf }

  override def eval(buf: CountMinSketch): Any =
    if (buf == null) null else serialize(buf)

  override def serialize(buf: CountMinSketch): Array[Byte] = {
    if (buf == null) return Array.emptyByteArray
    val out = new java.io.ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    if (bytes.isEmpty) null else read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsUnionAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CmsUnionAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_cms_union"
}

object CmsUnion {
  /** Column entry point: union a column of serialized count-min sketches
    * (as produced by SQL `count_min_sketch(...)`) into one sketch.
    */
  def cmsUnion(c: Column): Column =
    ColumnBridge.column(
      CmsUnionAgg(ColumnBridge.expression(c)).toAggregateExpression())
}
