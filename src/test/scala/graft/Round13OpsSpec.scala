package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GraphOps

/** Round-13 operator additions: incremental SCC maintenance (the
  * directed twin of the componentsIncremental fold) and the
  * condensation-served reachability census.
  */
class Round13OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  // the round-12 bow-tie: 7→1, A = {1→2→3→1}, bridge 3→4,
  // B = {4→5→4}, 5→6 — base SCCs 1:{1,2,3}, 4:{4,5}, 6, 7
  private def bowTie = Seq((7L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
    (3L, 4L), (4L, 5L), (5L, 4L), (5L, 6L)).toDF("a", "b")

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.select("node", "scc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("sccIncremental on the hand bow-tie: a delta edge closing the " +
      "giant cycle merges three base SCCs THROUGH a base condensation " +
      "path, a brand-new 2-cycle forms its own SCC, an intra-SCC delta " +
      "edge is a structural no-op, and the result is label-identical " +
      "to the FULL recompute over base ∪ delta") {
    val base = bowTie
    // 6→1 closes 1→2→3→4→5→6→1 (merge needs the base path — the
    // bridge-must-carry-the-condensation case); 8→7/7→8 is a new SCC
    // with one never-seen node; 2→1 is intra-SCC; 6→9 adds a new sink
    val delta = Seq((6L, 1L), (8L, 7L), (7L, 8L), (2L, 1L), (6L, 9L))
      .toDF("a", "b")
    val baseLab = GraphOps.sccFromEdges(base).localCheckpoint()
    val inc = GraphOps.sccIncremental(base, baseLab, delta)
      .localCheckpoint()
    val got = labelsOf(inc)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 1L, 6L -> 1L, 7L -> 7L, 8L -> 7L, 9L -> 9L))
    // the algebraic identity the oracle enforces: incremental ≡ full
    val full = labelsOf(GraphOps.sccFromEdges(base.unionByName(delta)))
    assert(got === full, "incremental fold diverged from full recompute")
    // base_scc carries the merge lineage: delta-only nodes are NULL
    val baseScc = inc.collect()
      .map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(baseScc(8L).isEmpty && baseScc(9L).isEmpty,
      "never-seen nodes must carry NULL base_scc")
    assert(baseScc(4L) === Some(4L) && baseScc(6L) === Some(6L),
      "base nodes must carry their base label")
  }

  test("sccIncremental with an EMPTY delta passes every base label " +
      "through unchanged — the no-op fold") {
    val base = bowTie
    val baseLab = GraphOps.sccFromEdges(base).localCheckpoint()
    val inc = GraphOps.sccIncremental(base, baseLab,
      Seq.empty[(Long, Long)].toDF("a", "b"))
    assert(labelsOf(inc) === labelsOf(baseLab))
  }

  test("reachCensusFromParts on the hand bow-tie: per nontrivial SCC, " +
      "descendant/ancestor SCC and node counts on the contracted DAG, " +
      "self excluded") {
    val edges = bowTie
    val labels = GraphOps.sccFromEdges(edges).localCheckpoint()
    // condensation: 7→1, 1→4, 4→6; seeds = {1 (size 3), 4 (size 2)}
    // seed 1: desc {4, 6} → (2 sccs, 3 nodes); anc {7} → (1, 1)
    // seed 4: desc {6} → (1, 1); anc {1, 7} → (2, 4)
    val got = GraphOps.reachCensusFromParts(edges, labels).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === Seq(
      (1L, 3L, 2L, 3L, 1L, 1L),
      (4L, 2L, 1L, 1L, 2L, 4L)))
  }

  test("topoLayersIncremental at the fixture: the merged-graph layer " +
      "histogram is row-identical to a from-scratch recompute (full " +
      "FW-BW labels over base ∪ delta, then the same Kahn peel) and " +
      "accounts every merged node exactly once") {
    val d = TestSpark.sf0001
    val inc = GraphOps.topoLayersIncremental(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(inc.nonEmpty, "vacuous layering at the fixture")
    val (base, delta) = GraphOps.precedenceEdgesByYear(spark, d, 1998)
    val all = base.unionByName(delta).distinct().localCheckpoint()
    val full = GraphOps.sccFromEdges(all).localCheckpoint()
    val expect = GraphOps.topoLayersFromParts(all, full)
      .join(full.groupBy("scc_id")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_nodes")),
        Seq("scc_id"))
      .groupBy("layer")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_sccs"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("n_nodes")).as("n_nodes"))
      .orderBy("layer").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(inc === expect,
      "incremental layering diverged from the from-scratch recompute")
    assert(inc.map(_._3).sum === full.count(),
      "layer histogram must account every merged node exactly once")
  }

  test("personalizedPageRankBucketed is BIT-identical to the plain " +
      "personalizedPageRank (the pageRankBucketed layout-is-pure-" +
      "physics contract, extended to the based teleport): same rows, " +
      "same micro-unit ranks, same order") {
    val d = TestSpark.sf0001
    val plain = GraphOps.personalizedPageRank(spark, d).collect().toSeq
    val bucketed = GraphOps.personalizedPageRankBucketed(spark, d)
      .collect().toSeq
    assert(bucketed === plain)
    assert(plain.nonEmpty)
  }

  test("registry fixture faces are non-vacuous and mutually consistent: " +
      "graph_scc_incremental's merged census has rows and its base-scc " +
      "lineage counts are sane; graph_reach_census rows are exactly " +
      "graph_scc's nontrivial SCCs with matching sizes") {
    val d = TestSpark.sf0001
    val inc = SparkEntry.queries("graph_scc_incremental")(spark, d)
      .collect()
    assert(inc.nonEmpty, "incremental census is vacuous at the fixture")
    inc.foreach { r =>
      val (m, b, nw) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(m >= 2 && b >= 0 && nw >= 0 && nw <= m,
        s"inconsistent census row: $r")
    }
    val census = SparkEntry.queries("graph_reach_census")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sccs = SparkEntry.queries("graph_scc")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(census === sccs.filter(_._2 >= 2),
      "census seed set must be exactly the nontrivial SCCs")
  }
}
