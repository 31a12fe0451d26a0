package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Scaled-integer Gram accumulator over embedding rows — the
  * one-aggregate form of the upper-triangle covariance pass
  * ([[graft.ops.SimilarityOps]]'s `covUpper`).
  *
  * Replaces the fan-out formulation (per row, EXPLODE d(d+1)/2
  * (i, j, term) struct rows into a 2 080-group hash aggregate — at
  * sf0.1 that is ~21 M generated rows through the operator pipeline
  * for a 64-dim corpus, measured as the whole cost of
  * emb_dim_covariance / emb_pca_power) with one tight per-row loop
  * into a flat long buffer: zero generated rows, zero hash probes,
  * one buffer per partition merged pairwise. The ARITHMETIC is the
  * fan-out form verbatim — each term is
  * `floor(double(x_i) * double(x_j) * 1e9)` as a LONG (and
  * `floor(double(x_i) * 1e9)` for the component sums), accumulated by
  * exact integer addition, so the sums are associative/order-free and
  * bit-identical to the exploded aggregate and to the DuckDB oracle.
  *
  * Buffer: n (rows seen) + d component sums + d(d+1)/2 upper-triangle
  * product sums, all LONG — a constant of the embedding WIDTH, never
  * the corpus. Rows with NULL or short (< dim) arrays are skipped
  * (the fixture has none; the guard keeps the fold total). Output:
  * struct(n, sx: array<long>, spq: array<long>) with spq in row-major
  * upper-triangle order (k = i·d − i(i−1)/2 + (j − i)).
  */
case class GramUpperAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sx", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("spq", ArrayType(LongType, containsNull = false),
      nullable = false)))

  private val nPairs = dim * (dim + 1) / 2
  // layout: [0] = n, [1..dim] = sx, [dim+1 ..] = spq
  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](1 + dim + nPairs)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() < dim) return buf
    buf(0) += 1L
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      x(i) = arr.getFloat(i).toDouble
      buf(1 + i) += math.floor(x(i) * 1e9).toLong
      i += 1
    }
    var k = 1 + dim
    i = 0
    while (i < dim) {
      val xi = x(i)
      var j = i
      while (j < dim) {
        buf(k) += math.floor(xi * x(j) * 1e9).toLong
        k += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    InternalRow(buf(0),
      new GenericArrayData(java.util.Arrays.copyOfRange(buf, 1, 1 + dim)),
      new GenericArrayData(
        java.util.Arrays.copyOfRange(buf, 1 + dim, buf.length)))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramUpperAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): GramUpperAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_gram_upper"
}

object GramUpper {
  /** Column entry point: fold `array<float>` embedding rows into the
    * (n, component-sum, upper-triangle-product-sum) scaled-integer
    * Gram state.
    */
  def gramUpper(c: Column, dim: Int): Column =
    ColumnBridge.column(
      GramUpperAgg(ColumnBridge.expression(c), dim).toAggregateExpression())
}
