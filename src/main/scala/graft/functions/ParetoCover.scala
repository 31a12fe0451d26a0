package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Pareto cover from ONE count-map aggregate: for each requested mass
  * percentage p, the SMALLEST number of units (users, documents,
  * customers) whose combined value covers ≥ p of the total — the
  * "what share of users produce 80% of the value" whale-concentration
  * readout, computed without the global value-desc sort + cumulative
  * window a naive SQL formulation plans (a data-sized single-task
  * window — the [[EquidepthHist]] argument at the other tail).
  *
  * The partial-merged map is value→unit-count (the shared
  * [[CountMapAggregate]] machinery); eval walks values DESCENDING with
  * multiplicity and resolves each target with pure integer arithmetic:
  * target_p = ceil(p·total_mass) and, inside the value group where the
  * cumulative mass crosses it, units = ceil((target − mass_before)/v)
  * — so the answer is exact and independent of how ties between
  * equal-valued units would have been ordered (any tie order crosses
  * the target at the same unit count).
  *
  * Inputs must be NON-NEGATIVE integers carried as doubles (quantize
  * money to cents/micros first): integer-valued doubles keep every
  * sum, target, and division exact. Memory contract: state ∝ distinct
  * values, as the whole quantile family.
  *
  * Result: array<struct<pct:long, n_units:long, unit_share:double,
  * mass_share:double>> — one row per requested percentage, where
  * mass_share is the mass actually covered at that unit count (≥ the
  * requested share). Empty input → NULL.
  */
case class ParetoCover(
    child: Expression,
    pctNums: Seq[Int],
    pctDen: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends CountMapAggregate {

  require(pctNums.nonEmpty, "at least one percentage required")
  require(pctDen > 0 && pctNums.forall(n => n >= 0 && n <= pctDen),
    s"percentages ${pctNums.mkString(",")}/$pctDen out of [0,1]")

  override protected def fnName: String = "pareto_cover"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pct", LongType, nullable = false),
      StructField("n_units", LongType, nullable = false),
      StructField("unit_share", DoubleType, nullable = false),
      StructField("mass_share", DoubleType, nullable = false))),
    containsNull = false)

  override def eval(buf: mutable.LongMap[Long]): Any = {
    if (buf.isEmpty) return null
    val keys = sortedKeys(buf) // ascending; walk from the top
    val totalUnits = totalCount(buf)
    var totalMass = 0L
    keys.foreach { v =>
      totalMass += v.toLong * buf(java.lang.Double.doubleToLongBits(v))
    }
    // targets ascend with pct; one descending walk resolves all
    val targets = pctNums.zipWithIndex
      .map { case (num, slot) =>
        // ceil(num·totalMass/den) in integer arithmetic
        (math.max(0L, (num.toLong * totalMass + pctDen - 1) / pctDen),
          num, slot)
      }
      .sortBy(_._1)
    val out = new Array[Any](pctNums.length)
    var massBefore = 0L
    var unitsBefore = 0L
    var i = keys.length - 1
    var t = 0
    // zero targets need zero units
    while (t < targets.length && targets(t)._1 == 0L) {
      out(targets(t)._3) = InternalRow(targets(t)._2.toLong, 0L, 0.0, 0.0)
      t += 1
    }
    while (i >= 0 && t < targets.length) {
      val v = keys(i).toLong
      val c = buf(java.lang.Double.doubleToLongBits(keys(i)))
      val groupMass = v * c
      while (t < targets.length &&
          massBefore + groupMass >= targets(t)._1) {
        val (target, num, slot) = targets(t)
        // units inside this value group: ceil((target - before)/v);
        // v > 0 here (v = 0 groups carry no mass and cannot cross)
        val within = (target - massBefore + v - 1) / v
        val units = unitsBefore + within
        val mass = massBefore + within * v
        out(slot) = InternalRow(num.toLong, units,
          units.toDouble / totalUnits, mass.toDouble / totalMass)
        t += 1
      }
      massBefore += groupMass
      unitsBefore += c
      i -= 1
    }
    new GenericArrayData(out)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ParetoCover =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): ParetoCover =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object ParetoCover {
  /** Column entry point: smallest unit counts covering num(i)/den of
    * the total mass of a non-negative integer-valued column.
    */
  def paretoCover(c: Column, pctNums: Seq[Int], pctDen: Int): Column =
    ColumnBridge.column(
      ParetoCover(ColumnBridge.expression(c.cast("double")),
        pctNums, pctDen).toAggregateExpression())
}
