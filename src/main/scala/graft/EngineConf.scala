package graft

import org.apache.spark.sql.SparkSession

/** The engine's STANDARD session configuration, applied by every entry
  * point (Verify/Bench/Explain/ProfileQuery/ScheduledRunner and the
  * test session) so the planner's environment is identical no matter
  * which query runs first.
  *
  * Why this exists (round 12): `Relational.storagePartitionedJoinAgg`
  * needs `requireAllClusterKeysForCoPartition=false` (its join keys are
  * a superset of the source-reported partition key) and set it
  * session-wide without restore. The conf is not a no-op for the rest
  * of the registry: with it, EnsureRequirements accepts SUBSET-key
  * co-partitioning for joins (hash(query_id) satisfies a join on
  * (query_id, neighbor_id)), eliding exchanges in seven registered
  * plans — so their shapes depended on whether that one query had run
  * in the session yet, which is exactly the nondeterminism the plan-
  * fingerprint gate exists to forbid. Making the conf the session
  * DEFAULT makes those shapes (the better, fewer-exchange ones)
  * deterministic everywhere: fingerprints, snapshots, bench, verify.
  *
  * The two decisions, on their merits:
  *  - `requireAllClusterKeysForCoPartition=false`: reuse an existing
  *    hash partitioning when it clusters a PREFIX-subset of the join
  *    keys instead of re-shuffling both sides on the full key list. At
  *    100 TB that deletes a fact-sized exchange wherever a window/agg
  *    already partitioned by the leading key. Trade-off: clustering on
  *    fewer keys is coarser, so a heavily skewed leading key would
  *    concentrate work — this engine's leading keys are high-cardinality
  *    ids (query_id/doc_id/user_id), the safe case. (Spark's `true`
  *    default is the conservative general-purpose choice, not a
  *    correctness requirement.)
  *  - `sources.v2.bucketing.enabled=true`: honor DSv2 sources' reported
  *    `KeyGroupedPartitioning` (the storage-partitioned-join lever);
  *    a no-op for every non-KeyGrouped source.
  */
object EngineConf {
  val confs: Seq[(String, String)] = Seq(
    "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
    "spark.sql.sources.v2.bucketing.enabled" -> "true")

  def apply(s: SparkSession): Unit =
    confs.foreach { case (k, v) => s.conf.set(k, v) }
}
