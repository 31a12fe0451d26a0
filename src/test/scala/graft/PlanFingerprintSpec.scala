package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan-SHAPE regression gate (round-10 verdict #7): every registry
  * query's canonical operator tree ([[PlanFingerprint]]) must equal the
  * committed baseline in `plans/fingerprints.tsv`. Wall-clock noise on
  * this host runs 2× run-to-run, so a broadcast→SMJ flip or a lost
  * exchange reuse can hide inside a noisy bench line for a whole round —
  * the fingerprint is deterministic, so it cannot.
  *
  * Regenerate after an INTENDED plan change (or a driver-side testdata
  * regeneration that legitimately moves a size-based join decision):
  *   SPARK_GRAFT_REGEN_FP=1 sbt "testOnly graft.PlanFingerprintSpec"
  * and review the diff like code — every changed line is a changed
  * plan shape and should be explainable by the commit that caused it.
  */
class PlanFingerprintSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private val baselinePath = java.nio.file.Paths.get("plans/fingerprints.tsv")

  /** Queries whose operator tree varies with SESSION HISTORY, not code.
    * EMPTY since round 12 — all 7 former entries (dedup_simhash_audit,
    * emb_dim_truncation, emb_recall_audit, ev_segment_exclusive/overlap,
    * graph_jaccard_neighbors, graph_modularity) turned out to share ONE
    * root cause, found by bisection: `storagePartitionedJoinAgg` set
    * `spark.sql.requireAllClusterKeysForCoPartition=false` session-wide
    * without restore, so whether those seven plans' subset-key
    * exchanges elided depended on whether that query had run first in
    * the session (round-11 attribution to "cache partitioning metadata"
    * was wrong). The conf is now the deterministic session default
    * ([[graft.EngineConf]]), every entry point applies it, and all 270
    * plans are pinned. The map stays as the documented mechanism in
    * case a genuinely state-dependent plan ever appears — with its
    * sanity test keeping entries honest.
    */
  private val sessionStateDependent: Map[String, String] = Map.empty

  private def computeAll(): Seq[(String, String)] =
    TestSpark.withConfs(Seq(
      "spark.sql.adaptive.enabled" -> "false",
      // the Explain-session conf: bucketed scans report their sort
      // order, so the bucketed queries fingerprint their exchange-free
      // shape (the shape the snapshot audit certifies)
      "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true")
      // the engine session defaults, re-asserted here so a prior suite
      // that mutated them cannot leak into the fingerprint pass (the
      // round-12 root cause class)
      ++ EngineConf.confs: _*) {
      // COLD cache state first: several operators plan over
      // Caches-registered persisted/checkpointed frames, and a frame
      // cached by an EARLIER suite carries different partitioning
      // knowledge (exchange elision) than one this spec materializes
      // itself — the full-suite run would otherwise fingerprint
      // differently than the stand-alone regen run. From cold, the
      // fixed name order below rebuilds caches identically every time.
      Caches.releaseAll()
      spark.sqlContext.clearCache()
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val fp = try PlanFingerprint.of(fn(spark, TestSpark.sf0001))
          catch { case e: Throwable => s"[failed to plan] ${e.getMessage}" }
        name -> fp
      }
    }

  test("every registry plan's operator tree matches the committed " +
      "fingerprint baseline (plans/fingerprints.tsv)") {
    val current = computeAll()
    if (sys.env.get("SPARK_GRAFT_REGEN_FP").contains("1")) {
      val body = current.map { case (n, f) => s"$n\t$f" }.mkString("\n")
      java.nio.file.Files.write(baselinePath,
        (body + "\n").getBytes("UTF-8"))
      succeed
    } else {
      assert(java.nio.file.Files.exists(baselinePath),
        "no committed baseline — regenerate with SPARK_GRAFT_REGEN_FP=1")
      val baseline = new String(
        java.nio.file.Files.readAllBytes(baselinePath), "UTF-8")
        .linesIterator.filter(_.nonEmpty)
        .map { l => val i = l.indexOf('\t'); l.take(i) -> l.drop(i + 1) }
        .toMap
      val missing = current.map(_._1).filterNot(baseline.contains)
      val stale = (baseline.keySet -- current.map(_._1).toSet).toSeq.sorted
      val diffs = current.collect {
        case (n, f) if !sessionStateDependent.contains(n) &&
            baseline.get(n).exists(_ != f) =>
          s"$n:\n  baseline: ${baseline(n)}\n  current:  $f"
      }
      assert(missing.isEmpty && stale.isEmpty && diffs.isEmpty,
        s"\nplan-shape drift — missing baselines: $missing; stale " +
          s"baselines: $stale; changed shapes:\n${diffs.mkString("\n")}\n" +
          "— if intended, regenerate: SPARK_GRAFT_REGEN_FP=1 sbt " +
          "\"testOnly graft.PlanFingerprintSpec\" and review the diff")
    }
  }

  test("the session-state exclusion list only names registered queries " +
      "(entries must not outlive renames)") {
    val unknown = sessionStateDependent.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"stale exclusion entries: $unknown")
  }

  test("the gate catches a deliberately injected broadcast→SMJ flip " +
      "(the regression class wall-clock noise hides)") {
    TestSpark.withConfs("spark.sql.adaptive.enabled" -> "false") {
      val healthy = PlanFingerprint.of(
        SparkEntry.queries("q1_category_per_country")(
          spark, TestSpark.sf0001))
      assert(healthy.contains("BroadcastHashJoin"),
        s"q1's dimension joins must broadcast: $healthy")
      val flipped = TestSpark.withConfs(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        PlanFingerprint.of(
          SparkEntry.queries("q1_category_per_country")(
            spark, TestSpark.sf0001))
      }
      assert(flipped !== healthy,
        "the fingerprint failed to see a broadcast flip")
      assert(flipped.contains("SortMergeJoin")
          || flipped.contains("ShuffledHashJoin"), flipped)
    }
  }

  test("the fingerprint is insensitive to codegen wrappers and ids but " +
      "keeps exchange partitioning kinds and build sides") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    TestSpark.withConfs("spark.sql.adaptive.enabled" -> "false") {
      val df = (1 to 10).map(i => (i.toLong, s"k${i % 3}")).toDF("v", "k")
        .groupBy("k").agg(sum("v").as("s"))
      val a = PlanFingerprint.of(df)
      // identical query, fresh expression ids
      val b = PlanFingerprint.of(
        (1 to 10).map(i => (i.toLong, s"k${i % 3}")).toDF("v", "k")
          .groupBy("k").agg(sum("v").as("s")))
      assert(a === b, "expression ids leaked into the fingerprint")
      assert(a.contains("Exchange[hash]"), a)
      assert(a.contains("[Partial]") && a.contains("[Final]"), a)
      assert(!a.contains("WholeStageCodegen"), a)
    }
  }

  test("the fingerprint keeps Reused(...) exchange markers — losing an " +
      "exchange reuse IS a plan regression the gate must see") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    TestSpark.withConfs("spark.sql.adaptive.enabled" -> "false",
        "spark.sql.exchange.reuse" -> "true") {
      val base = (1 to 50).map(i => (i.toLong % 7, i.toLong)).toDF("k", "v")
        .groupBy("k").agg(sum("v").as("s"))
      // self-join of one aggregated subtree: the planner reuses the
      // shuffle for the second occurrence
      val joined = base.join(
        base.withColumnRenamed("s", "s2"), Seq("k"))
      val fp = PlanFingerprint.of(joined)
      assert(fp.contains("Reused("), fp)
      val without = TestSpark.withConfs(
        "spark.sql.exchange.reuse" -> "false") {
        PlanFingerprint.of(base.join(
          base.withColumnRenamed("s", "s2"), Seq("k")))
      }
      assert(without !== fp,
        "a lost exchange reuse must change the fingerprint")
      assert(!without.contains("Reused("), without)
    }
  }
}
