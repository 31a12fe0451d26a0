package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native backward as-of join — the whole-operator Catalyst extension
  * (SURVEY.md §7.3 preference (c)): logical node + planner strategy +
  * physical operator, registered per-session via
  * `ExperimentalMethods.extraStrategies` (or `GraftExtensions` at build
  * time). Spark has no first-class as-of join; the composed form
  * (`EventOps.asOfJoin`, union + window) shuffles |L|+|R| rows through
  * ONE sorted window — this operator instead asks the planner for
  * key-clustered, (key, ts)-sorted children and streams BOTH sides once
  * with a per-partition merge: no union row inflation, no window-state
  * buffering, right rows copied only while they remain candidates.
  *
  * Semantics (the DuckDB `ASOF LEFT JOIN` contract, same as the composed
  * twin): for each left row, the single right row with the same key and
  * the greatest `right.ts <= left.ts`; nulls on the right when no such
  * row; rows with NULL key or ts never match.
  *
  * Scale shape: identical to a sort-merge join — one shuffle per side
  * keyed by the join key, sort amortized by the exchange, merge is O(|L|
  * + |R|) per partition with O(1) retained state (the current best
  * match). AQE handles skew/coalescing exactly as for SMJ since the
  * requirements are declared, not hand-planned.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // key-clustered children; EnsureRequirements co-partitions the pair
  // (same mechanism SMJ relies on) and inserts the sorts below.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  // left rows pass through in order, exactly once
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTs, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTs, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      .asInstanceOf[Ordering[Any]]
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
      .asInstanceOf[Ordering[Any]]
    val rightArity = right.output.size
    val outAttrs = output
    // bind against nullability-RELAXED right attrs: the unmatched-row
    // path feeds an all-null row, and a non-nullable BoundReference
    // would read primitive garbage (0.0) instead of null
    val inAttrs = left.output ++ right.output.map(_.withNullability(true))
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rightArity)
      val resultProj = UnsafeProjection.create(outAttrs, inAttrs)
      // lookahead right row: values extracted eagerly (sort iterators
      // reuse row buffers); the row itself is copied only if retained
      var rRow: InternalRow = null
      var rKey: Any = null
      var rTs: Any = null
      def advanceRight(): Unit = {
        rRow = null
        while (rRow == null && rIter.hasNext) {
          val row = rIter.next()
          val k = rkB.eval(row)
          val t = rtB.eval(row)
          if (k != null && t != null) { rRow = row; rKey = k; rTs = t }
        }
      }
      advanceRight()
      // best match so far for the key currently being merged
      var matchRow: InternalRow = null
      var matchKey: Any = null
      lIter.map { lRow =>
        val k = lkB.eval(lRow)
        val t = ltB.eval(lRow)
        if (k != null && t != null) {
          // consume right rows that are no longer ahead of (k, t): rows
          // on earlier keys can never match again (left keys ascend);
          // rows on this key with ts <= t each become the new best match
          // (ts ascends, so the last one standing is the greatest <= t)
          var continue = rRow != null
          while (continue) {
            val kc = keyOrd.compare(rKey, k)
            if (kc < 0) advanceRight()
            else if (kc == 0 && tsOrd.compare(rTs, t) <= 0) {
              // retain via the COPY on both row and key: rKey may be a
              // UTF8String/binary view into the sort iterator's reused
              // buffer, which advanceRight() overwrites — re-evaluating
              // against the copied row deep-copies for any key type
              matchRow = rRow.copy(); matchKey = rkB.eval(matchRow)
              advanceRight()
            } else continue = false
            if (rRow == null) continue = false
          }
        }
        val matched = k != null && matchRow != null &&
          keyOrd.compare(matchKey, k) == 0
        numOutputRows += 1
        if (matched) numMatchedRows += 1
        resultProj(joiner(lRow, if (matched) matchRow else nullRight))
      }
    }
  }
}

/** Public API for the native operator. `join` registers the strategy on
  * the DataFrame's session (idempotent), builds the resolved logical
  * node directly, and prefixes every right-side column with `asof_`
  * (fresh attribute ids — the right side may derive from the same scan
  * as the left, and without re-aliasing the node would carry duplicate
  * expression ids).
  */
object AsOfJoinNative {

  def install(s: org.apache.spark.sql.SparkSession): Unit = {
    val cs = s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(AsOfJoinStrategy))
      cs.experimental.extraStrategies =
        cs.experimental.extraStrategies :+ AsOfJoinStrategy
  }

  def join(left: DataFrame, right: DataFrame,
      key: String, ts: String): DataFrame = {
    install(left.sparkSession)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    val rAliases = rp.output.map(a => Alias(a, s"asof_${a.name}")())
    val rProject = Project(rAliases, rp)
    val rAttrs = rAliases.map(_.toAttribute)
    def find(out: Seq[Attribute], n: String): Attribute =
      out.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not found in ${out.map(_.name).mkString(", ")}"))
    val plan = AsOfJoinPlan(lp, rProject,
      find(lp.output, key), find(rAttrs, s"asof_$key"),
      find(lp.output, ts), find(rAttrs, s"asof_$ts"))
    org.apache.spark.sql.graftshim.Internal.ofRows(left.sparkSession, plan)
  }
}
