package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** The `nProbe` nearest centroid indices of a vector, by cosine similarity,
  * in one compiled row-local pass over a centroid matrix captured at plan
  * time.
  *
  * This is the IVF cell-assignment primitive: a previous formulation
  * (`crossJoin(broadcast(centroids))` + `row_number` over a per-vector
  * window) shuffled and sorted |corpus|×|cells| rows just to take each
  * row's argmax — at 100 TB that window exchange is the bottleneck. Here
  * assignment is a scalar expression: zero shuffle, participates in
  * whole-stage codegen, and the same expression serves both corpus
  * assignment (nProbe=1) and query probing (nProbe=c).
  *
  * Output: array<int> of cell indices ordered by cosine descending, index
  * ascending on ties (deterministic). NULL input or NULL element → NULL.
  * Zero-norm vectors compare with cosine NaN < everything, so they land in
  * the lowest-index cells (deterministic, degenerate input).
  */
case class NearestCentroids(child: Expression,
    centroids: Array[Array[Double]], nProbe: Int,
    metric: String = "cosine")
    extends UnaryExpression {

  require(centroids.nonEmpty, "need at least one centroid")
  require(nProbe >= 1 && nProbe <= centroids.length,
    s"nProbe ($nProbe) must be in 1..${centroids.length}")
  require(metric == "cosine" || metric == "l2",
    s"metric must be 'cosine' or 'l2', got '$metric'")

  private val useL2 = metric == "l2"

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // NULL for vectors containing NULL elements, regardless of input nullability
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroids expects array<float|double>, got ${t.catalogString}")
    }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Row-local top-nProbe by cosine; also the codegen target. Returns null
    * for vectors with NULL elements.
    */
  def compute(input: ArrayData): ArrayData = {
    val m = input.numElements()
    // dimension mismatch vs the centroid matrix → NULL, the same policy
    // as CosineSimilarity/HyperplaneSignature: a common-prefix score
    // would file a corrupt vector into a plausible cell
    if (centroids.nonEmpty && centroids(0).length != m) return null
    var k = 0
    while (k < m) { if (input.isNullAt(k)) return null; k += 1 }
    val v = new Array[Double](m)
    k = 0
    while (k < m) {
      v(k) = if (isFloat) input.getFloat(k).toDouble else input.getDouble(k)
      k += 1
    }
    var vn = 0.0
    k = 0
    while (k < m) { vn += v(k) * v(k); k += 1 }
    val bestIdx = new Array[Int](nProbe)
    val bestSim = new Array[Double](nProbe)
    var filled = 0
    var c = 0
    while (c < centroids.length) {
      val p = centroids(c)
      val n = math.min(m, p.length)
      // score so that LARGER is better under either metric: cosine as-is,
      // L2 as negated squared distance (sequential left-to-right sums —
      // the fold order an oracle engine mirrors exactly)
      var sim = 0.0
      if (useL2) {
        var d2 = 0.0
        var i = 0
        while (i < n) { val dif = v(i) - p(i); d2 += dif * dif; i += 1 }
        sim = -d2
      } else {
        var dot = 0.0
        var cn = 0.0
        var i = 0
        while (i < n) { dot += v(i) * p(i); cn += p(i) * p(i); i += 1 }
        sim = dot / (math.sqrt(vn) * math.sqrt(cn))
      }
      // NaN (zero-norm centroid or vector under cosine) maps to -inf so
      // the ranking stays a total order: a raw NaN that grabbed a slot
      // would be unbeatable (x > NaN is always false) and every later,
      // genuinely better centroid would be rejected — degenerate
      // centroids must rank LAST, not first
      if (sim.isNaN) sim = Double.NegativeInfinity
      // insertion position: first slot this sim strictly beats (ties keep
      // the earlier centroid index ahead — deterministic)
      var pos = filled
      while (pos > 0 && sim > bestSim(pos - 1)) pos -= 1
      if (pos < nProbe) {
        val last = math.min(filled, nProbe - 1)
        var j = last
        while (j > pos) { bestIdx(j) = bestIdx(j - 1); bestSim(j) = bestSim(j - 1); j -= 1 }
        bestIdx(pos) = c
        bestSim(pos) = sim
        if (filled < nProbe) filled += 1
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bestIdx, filled))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroids", this,
      classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("cells")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r = $ref.compute($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // the centroid matrix is part of the expression's identity for plan equality
  override def equals(o: Any): Boolean = o match {
    case e: NearestCentroids =>
      e.child == child && e.nProbe == nProbe && e.metric == metric &&
        java.util.Arrays.deepEquals(
          centroids.asInstanceOf[Array[AnyRef]],
          e.centroids.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * (31 * child.hashCode() + nProbe) + metric.hashCode) +
      java.util.Arrays.deepHashCode(centroids.asInstanceOf[Array[AnyRef]])
}

object NearestCentroids {
  /** Column entry point: indices of the `nProbe` nearest centroids. */
  def nearestCentroids(v: Column, centroids: Array[Array[Double]],
      nProbe: Int, metric: String = "cosine"): Column =
    ColumnBridge.column(
      NearestCentroids(ColumnBridge.expression(v), centroids, nProbe, metric))
}
