package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GraphOps

/** Round-12 hardening: edge-case parity fixes from the round-11 advice
  * pass (empty-audit-seed ANF diameter) and this round's operator
  * additions.
  */
class Round12OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("anfDiameterFromEdges with NO audit seeds returns the oracle's " +
      "EMPTY frame (same columns), not maxR vacuous rows with a false " +
      "r=1 effective diameter (0 >= 0) and NULL est_agrees") {
    // nodes 1..3: none ≡ 0 (mod 8) → the sampled audit has no sources
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got = GraphOps.anfDiameterFromEdges(edges, maxR = 3, auditMod = 8)
    assert(got.columns.toSeq === Seq("r", "pairs_exact", "frac",
      "is_effective_diameter", "est_agrees"))
    assert(got.count() === 0L,
      "no seeds ⇒ zero rows, matching the oracle's recursive closure")
    // and the seeded case on the same graph still produces the curve
    assert(GraphOps.anfDiameterFromEdges(edges, maxR = 3, auditMod = 1)
      .count() === 3L)
  }

  test("shared ANF curve artifact: graph_anf and graph_anf_diameter " +
      "serve from ONE stored superstep run (round-11 verdict #6 — they " +
      "recomputed identical supersteps), and both readouts are row-" +
      "identical to the direct from-edges computation") {
    val d = TestSpark.sf0001
    val edges = GraphOps.coPurchaseEdges(spark, d).select("a", "b")
    // artifact-backed faces (first call builds, second serves)
    val anf = GraphOps.neighborhoodFunction(spark, d).collect().toSeq
    val dia = GraphOps.anfDiameter(spark, d).collect().toSeq
    // the stored curve must exist with its fingerprint marker
    val dir = graft.sources.Sinks.namespaced(
      s"${graft.sources.Artifact.stagingRoot(spark)}/graft_anf_stages/" +
        new java.io.File(d).getName, d)
    assert(new java.io.File(s"$dir/anf_curve_3_2_8").isDirectory,
      "the shared curve artifact must be persisted")
    assert(new java.io.File(s"$dir/anf_3_2_8.fingerprint").isFile,
      "the artifact must be fingerprint-guarded")
    // bit-parity with the direct (artifact-free) computation
    assert(anf === GraphOps.anfFromEdges(edges, 3, 8, 0.05)
      .collect().toSeq, "neighborhoodFunction diverged from from-edges")
    assert(dia === GraphOps.anfDiameterFromEdges(edges, 3, 8)
      .collect().toSeq, "anfDiameter diverged from from-edges")
    // the serve path reads the table instead of re-running supersteps:
    // a served call schedules an order of magnitude fewer jobs than the
    // superstep loop (each round runs eager checkpoints)
    val (_, prof) = Metrics.profile(spark) {
      GraphOps.anfDiameter(spark, d).collect(): Unit
    }
    // measured: serve ≈ 14 jobs (artifact probe + curve read + the
    // readout's checkpoint/aggregates); the build path's superstep
    // loop alone runs 3 rounds × (2 checkpoints + joins) on TOP of
    // that — well past 20
    assert(prof.jobs <= 20,
      s"served anfDiameter ran ${prof.jobs} jobs — artifact not reused?")
  }

  test("the planner session environment is the EngineConf defaults, and " +
      "building the SPJ query leaves it UNCHANGED — the round-12 conf " +
      "leak (an op flipping requireAllClusterKeysForCoPartition " +
      "session-wide) made seven plans depend on query order; this pins " +
      "the contract that query construction never drifts the session") {
    EngineConf.confs.foreach { case (k, v) =>
      assert(spark.conf.get(k) === v, s"session missing engine default $k")
    }
    val before = EngineConf.confs.map { case (k, _) => k -> spark.conf.get(k) }
    graft.ops.Relational.storagePartitionedJoinAgg(spark)
      .queryExecution.executedPlan // force planning
    before.foreach { case (k, v) =>
      assert(spark.conf.get(k) === v,
        s"building a query drifted session conf $k")
    }
  }

  test("sccFromEdges on the hand bow-tie (3-cycle → 2-cycle → sink, " +
      "plus an upstream chain): FW-BW-Trim coloring emits exactly the " +
      "min-mutual-reach labels Tarjan would") {
    // 7→1, A = {1→2→3→1}, bridge 3→4, B = {4→5→4}, 5→6
    val edges = Seq((7L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (4L, 5L), (5L, 4L), (5L, 6L)).toDF("a", "b")
    val got = GraphOps.sccFromEdges(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 6L, 7L -> 7L))
    // round-count pin (round-12 verdict #6): the fixpoint serves from
    // the sccArtifact in production, so a reformulation that silently
    // went quadratic-round would hide behind build-once serves — the
    // bow-tie's convergence shape is deterministic (trim peels the
    // chain/sink tails, one coloring pass per SCC layer bounded by the
    // color-graph diameter, BW closure bounded by SCC diameter + 1).
    // A count DRIFTING UP here means the loop structure regressed.
    val r = GraphOps.lastSccRounds
    assert(r.outer === 2, s"outer rounds moved: $r")
    assert(r.coloring <= 8, s"coloring rounds past the fixture bound: $r")
    assert(r.backward <= 6, s"backward-closure rounds past the bound: $r")
  }

  test("directed-structure faces at the spec fixture: the precedence " +
      "graph has a nontrivial giant core (non-vacuous scc census), the " +
      "condensation is a DAG, and the layer histogram accounts for " +
      "every SCC exactly once") {
    val d = TestSpark.sf0001
    val sccRows = GraphOps.scc(spark, d).collect()
    assert(sccRows.nonEmpty, "no multi-member SCC — vacuous fixture")
    assert(sccRows.forall(r => r.getLong(1) >= 2))
    // internal edges of a ≥2-member SCC are at least its size (every
    // member lies on a cycle within the component)
    assert(sccRows.forall(r => r.getLong(2) >= r.getLong(1)),
      "an SCC needs >= size internal edges to be strongly connected")
    val layers = GraphOps.topoLayers(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val labels = GraphOps.sccFromEdges(
      GraphOps.precedenceEdges(spark, d)).collect()
    val nSccs = labels.map(_.getLong(1)).distinct.length
    assert(layers.map(_._2).sum === nSccs.toLong,
      "layer histogram must partition the SCC set")
    assert(layers.map(_._3).sum === labels.length.toLong,
      "layer histogram must account for every node")
    assert(layers.map(_._1).toSeq === layers.map(_._1).toSeq.sorted)
    // condensation acyclicity is enforced structurally: topoLayers'
    // peel REQUIREs progress every round and it just completed
  }
}
