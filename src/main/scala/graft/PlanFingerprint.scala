package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning,
  Partitioning, RangePartitioning, RoundRobinPartitioning, SinglePartition}
import org.apache.spark.sql.execution.{ColumnarToRowExec, InputAdapter,
  SortExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec,
  ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BaseJoinExec,
  BroadcastNestedLoopJoinExec, HashJoin}

/** Canonical operator-tree fingerprint of a physical plan: node KINDS
  * plus the scale-deciding qualifiers (join type + build side, exchange
  * partitioning kind, sort locality, aggregate mode), with expression
  * ids, column lists, paths, and codegen wrappers stripped — so two
  * plans fingerprint equal iff they have the same operator SHAPE, the
  * thing wall-clock noise hides and a plan regression changes
  * (round-10 verdict #7: a broadcast→SMJ flip must be caught even when
  * the bench line is too noisy to show it).
  *
  * The committed baseline lives at `plans/fingerprints.tsv`
  * (name \t canonical tree), regenerated via
  * `SPARK_GRAFT_REGEN_FP=1 sbt "testOnly graft.PlanFingerprintSpec"`
  * in the SAME session config the checking spec uses — generation and
  * check share this one canonicalizer, so only a real plan change (or
  * a driver-side testdata regeneration that legitimately flips a size
  * decision) can diff.
  */
object PlanFingerprint {

  private def partKind(p: Partitioning): String = p match {
    case _: HashPartitioning => "hash"
    case _: RangePartitioning => "range"
    case SinglePartition => "single"
    case _: RoundRobinPartitioning => "roundrobin"
    case o => o.getClass.getSimpleName
  }

  private def kindOf(p: SparkPlan): String = {
    val base = p.getClass.getSimpleName.stripSuffix("Exec")
    p match {
      case j: BaseJoinExec =>
        val build = j match {
          case h: HashJoin => " " + h.buildSide
          case b: BroadcastNestedLoopJoinExec => " " + b.buildSide
          case _ => ""
        }
        s"$base[${j.joinType}$build]"
      case e: ShuffleExchangeExec => s"Exchange[${partKind(e.outputPartitioning)}]"
      case _: BroadcastExchangeExec => "BroadcastExchange"
      case s: SortExec => s"Sort[${if (s.global) "global" else "local"}]"
      case a: BaseAggregateExec =>
        val modes = a.aggregateExpressions.map(_.mode.toString)
          .distinct.sorted.mkString("+")
        s"$base[$modes]"
      case _ => base
    }
  }

  /** Canonical tree string. Codegen/columnar wrappers are transparent
    * (a codegen-span change is not a plan-shape change; the lint and
    * targeted snapshot asserts watch codegen), reuse markers are kept
    * (losing an exchange reuse IS a scale regression).
    */
  def canon(p: SparkPlan): String = p match {
    case w: WholeStageCodegenExec => canon(w.child)
    case i: InputAdapter => canon(i.child)
    case c: ColumnarToRowExec => canon(c.child)
    case r: ReusedExchangeExec => s"Reused(${canon(r.child)})"
    case _ =>
      val kids = p.children.map(canon)
      if (kids.isEmpty) kindOf(p)
      else s"${kindOf(p)}(${kids.mkString(",")})"
  }

  /** Fingerprint of a DataFrame's executed plan (caller is responsible
    * for planning with AQE off — adaptive wrappers would fingerprint
    * the unresolved initial plan).
    */
  def of(df: DataFrame): String = canon(df.queryExecution.executedPlan)
}
