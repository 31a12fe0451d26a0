package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Analytics, CorpusOps, DedupOps, EventOps, TextOps}

/** Round-6 operator batch: partitioned CUSUM (carried offsets), the
  * gap-year-safe YoY join, the negative-namespace corpus diff.
  */
class Round6OpsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  // ------------------------------------- cusumChangepointPartitioned

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("cusumChangepointPartitioned == global cusumChangepoint under " +
      "1-day, 3-day, and degenerate single-bucket slicings (decimal " +
      "carry-in associativity)") {
    val global = rowsOf(EventOps.cusumChangepoint(spark, TestSpark.sf001))
    assert(global.nonEmpty)
    val daily = rowsOf(
      EventOps.cusumChangepointPartitioned(spark, TestSpark.sf001))
    assert(daily === global, "per-day buckets diverged from global")
    // 3-day slabs: epoch-floored, monotone in ts
    val threeDay = rowsOf(EventOps.cusumChangepointPartitioned(
      spark, TestSpark.sf001,
      floor(unix_timestamp(col("ts")) / lit(259200L)).cast("long")))
    assert(threeDay === global, "3-day buckets diverged from global")
    // degenerate: one bucket — the partitioned plan IS the global plan
    val single = rowsOf(EventOps.cusumChangepointPartitioned(
      spark, TestSpark.sf001, lit(0L)))
    assert(single === global, "single bucket diverged from global")
  }

  test("cusumChangepointPartitioned plan: no fact-sized window spans " +
      "more than one (type, bucket) — window partition keys include " +
      "the bucket") {
    val df = EventOps.cusumChangepointPartitioned(spark, TestSpark.sf0001)
    val plan = df.queryExecution.optimizedPlan.toString
    // the local running-sum window must be keyed by bucket alongside
    // event_type; only the |buckets|-row argmax and carry windows may
    // key by event_type alone
    assert(plan.contains("bucket"), plan)
    df.count() // plan executes green
  }

  // --------------------------------------------------- yoyRevenue gap

  test("yoyRevenue pairs strictly adjacent years: a gap year yields NULL " +
      "prev/delta/growth, never a non-adjacent comparison") {
    // engine path on fixtures (continuous years): every non-first year
    // has prev_revenue = previous year's revenue
    val rows = Analytics.yoyRevenue(spark, TestSpark.sf0001).collect()
    val byPriority = rows.groupBy(_.getString(1))
    byPriority.values.foreach { prs =>
      val sorted = prs.sortBy(_.getLong(0))
      sorted.sliding(2).foreach {
        case Array(a, b) if b.getLong(0) == a.getLong(0) + 1 =>
          assert(!b.isNullAt(3) &&
            b.getDouble(3) === a.getDouble(2),
            s"adjacent years not paired: $a -> $b")
        case _ =>
      }
      assert(sorted.head.isNullAt(3), "first year must have NULL prev")
    }
  }

  // ------------------------------------------------ dsirWeightsHashed

  private def spearman(a: Map[Long, Double], b: Map[Long, Double]): Double = {
    val keys = a.keySet.intersect(b.keySet).toSeq.sorted
    def ranks(m: Map[Long, Double]): Map[Long, Double] =
      keys.sortBy(m).zipWithIndex.map { case (k, i) => k -> i.toDouble }.toMap
    val (ra, rb) = (ranks(a), ranks(b))
    val n = keys.size.toDouble
    val mean = (n - 1) / 2
    val cov = keys.map(k => (ra(k) - mean) * (rb(k) - mean)).sum
    val va = keys.map(k => math.pow(ra(k) - mean, 2)).sum
    val vb = keys.map(k => math.pow(rb(k) - mean, 2)).sum
    cov / math.sqrt(va * vb)
  }

  test("dsirWeightsHashed: bounded-vocabulary weights rank-correlate " +
      "with exact-vocab DSIR (hashing-trick fidelity), same doc set, " +
      "selected flags mostly agree") {
    def weightsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.select("doc_id", "avg_log_ratio").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = weightsOf(TextOps.dsirWeights(spark, TestSpark.sf001))
    val hashed = weightsOf(TextOps.dsirWeightsHashed(spark, TestSpark.sf001))
    assert(hashed.keySet === exact.keySet,
      "hashed form must cover exactly the exact form's doc set")
    val rho = spearman(exact, hashed)
    info(f"spearman(exact, hashed-65536) = $rho%.4f over ${exact.size} docs")
    assert(rho > 0.9, f"rank correlation too low: $rho%.4f")
  }

  test("dsirWeightsHashed: key space is bounded by `buckets` even when " +
      "tiny, and non-power-of-two bucket counts are rejected") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val out = TextOps.dsirWeightsHashedFrom(docs,
      col("lang") === "en", buckets = 64)
    assert(out.count() > 0) // collisions degrade fidelity, never crash
    intercept[IllegalArgumentException] {
      TextOps.dsirWeightsHashedFrom(docs, col("lang") === "en", 100)
    }
  }

  // ------------------------------------- shared-tokenization overloads

  test("dupSpans/removeDupSpans from ONE shared tokenized frame equal " +
      "the per-operator entry points (a pipeline running both pays one " +
      "tokenization pass)") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text")
    val toks = graft.ops.DedupOps.docTokensFrame(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      assert(graft.ops.DedupOps.dupSpansFromTokens(toks)
        .collect().map(_.toString).toSeq ===
        graft.ops.DedupOps.dupSpansFrom(docs)
          .collect().map(_.toString).toSeq)
      assert(graft.ops.DedupOps.removeDupSpansFromTokens(toks)
        .collect().map(_.toString).toSeq ===
        graft.ops.DedupOps.removeDupSpansFrom(docs)
          .collect().map(_.toString).toSeq)
    } finally { toks.unpersist(); () }
  }

  // ------------------------------------------- slidingDistinctUsers

  test("slidingDistinctUsers: hourly-sketch union is deterministic " +
      "across shuffle partitionings (DataSketches HLL is a pure " +
      "function of the input SET), every AUDITED window meets the 8% " +
      "bound, and the sampled audit agrees with the full audit on its " +
      "sample") {
    val base = rowsOf(EventOps.slidingDistinctUsers(spark, TestSpark.sf001))
    assert(base.nonEmpty)
    val alt = TestSpark.withConfs("spark.sql.shuffle.partitions" -> "7") {
      rowsOf(EventOps.slidingDistinctUsers(spark, TestSpark.sf001))
    }
    assert(alt === base, "sketch estimates changed with partitioning")
    val rows = EventOps.slidingDistinctUsers(spark, TestSpark.sf001)
      .collect()
    // audited ⇔ wend % 3 == 0; audited windows all inside the bound,
    // unaudited ones carry NULLs (the sketch estimate still exists —
    // the audit is an assurance sample, not the result)
    rows.foreach { r =>
      val audited = r.getLong(0) % 3 == 0
      assert(r.isNullAt(1) == !audited, s"audit sampling off at $r")
      assert(r.isNullAt(2) == !audited, s"bound flag off at $r")
      if (audited) assert(r.getBoolean(2), s"window exceeded the 8% bound: $r")
    }
    assert(rows.exists(_.getLong(0) % 3 != 0),
      "fixture must contain unaudited windows for the sampling to mean " +
        "anything")
    // the full audit (k=1) is the sampled audit's superset: equal exact
    // counts on every sampled window, and every window audited
    val full = EventOps.slidingDistinctUsers(spark, TestSpark.sf001,
        auditEveryK = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.filterNot(_.isNullAt(1)).foreach { r =>
      assert(full(r.getLong(0)) == r.getLong(1),
        s"sampled audit diverges from full audit at wend ${r.getLong(0)}")
    }
    assert(full.size == rows.length, "k=1 must audit every window")
  }

  // ---------------------------------------------------- pageRank

  test("pageRank: total rank mass stays ~1 (floor quantization only " +
      "leaks micro-units), every rank positive, both bipartite kinds " +
      "present, ranks non-increasing in the returned order") {
    val rows = graft.ops.GraphOps
      .pageRank(spark, TestSpark.sf0001, topK = 1000000)
      .collect()
    assert(rows.nonEmpty)
    val mass = rows.map(_.getDouble(2)).sum
    assert(mass > 0.9 && mass <= 1.000001, s"rank mass $mass")
    assert(rows.forall(_.getDouble(2) > 0))
    assert(rows.map(_.getString(1)).toSet === Set("customer", "supplier"))
    rows.map(_.getDouble(2)).sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ =>
    }
  }

  // -------------------------------------------- cc_labels artifact

  test("corpus pipeline cc_labels artifact: an unchanged-input re-run " +
      "reuses the stored labels (no rewrite, no fixpoint), identical " +
      "stage counts; survivors derived from the artifact match the " +
      "direct computation") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_r6_stages").toString
    val c1 = CorpusPipeline.run(spark, TestSpark.sf0001, out)
    val dir = new java.io.File(s"$out/cc_labels")
    val mtimes1 = dir.listFiles().map(f => f.getName -> f.lastModified).toMap
    val c2 = CorpusPipeline.run(spark, TestSpark.sf0001, out)
    assert(c2 === c1, "reused labels changed the pipeline's counts")
    val mtimes2 = dir.listFiles().map(f => f.getName -> f.lastModified).toMap
    assert(mtimes2 === mtimes1,
      "unchanged input must NOT rewrite the labels artifact")
    // the stored labels reproduce the in-session survivor decision
    val fromArtifact = DedupOps.survivorsFromLabels(
      Tables.documents(spark, TestSpark.sf0001),
      spark.read.parquet(s"$out/cc_labels"))
      .collect().map(_.getLong(0)).toSeq
    val direct = DedupOps.dedupSurvivors(spark, TestSpark.sf0001)
      .collect().map(_.getLong(0)).toSeq
    assert(fromArtifact === direct)
  }

  test("quality-ranked survivors consume a persisted labels artifact: " +
      "read-back labels give the identical selection as the in-session " +
      "fixpoint") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_r6_labels").toString + "/cc"
    DedupOps.nearDupLabels(spark, TestSpark.sf0001)
      .write.mode("overwrite").parquet(out)
    val q = TextOps.qualityScore(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("n_tokens"), col("keep"))
    val viaArtifact = DedupOps
      .dedupSurvivorsByQualityFrom(q, spark.read.parquet(out))
      .collect().map(_.toString).sorted
    val direct = DedupOps.dedupSurvivorsByQuality(spark, TestSpark.sf0001)
      .collect().map(_.toString).sorted
    assert(viaArtifact === direct)
  }

  test("inputFingerprint: stable across reads, invalidated by any file " +
      "rewrite (mtime/size)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_r6_fp").toString
    val src = java.nio.file.Paths
      .get(TestSpark.sf0001, "documents.parquet")
    val dst = java.nio.file.Paths.get(dir, "documents.parquet")
    if (java.nio.file.Files.isDirectory(src)) {
      java.nio.file.Files.createDirectories(dst)
      java.nio.file.Files.list(src).forEach(p =>
        java.nio.file.Files.copy(p, dst.resolve(p.getFileName.toString)))
    } else java.nio.file.Files.copy(src, dst)
    val fp1 = CorpusPipeline.inputFingerprint(spark, dir)
    assert(fp1.isDefined, "existing input must fingerprint to Some")
    assert(fp1 === CorpusPipeline.inputFingerprint(spark, dir))
    val touched = new java.io.File(dst.toString)
    val target = if (touched.isDirectory) touched.listFiles().head else touched
    assert(target.setLastModified(target.lastModified() + 120000))
    assert(CorpusPipeline.inputFingerprint(spark, dir) !== fp1,
      "rewritten input must invalidate the fingerprint")
    assert(CorpusPipeline
      .inputFingerprint(spark, dir + "_nonexistent") === None,
      "a degenerate (empty) walk must be None — never a reusable constant")
  }

  // -------------------------------------------------- corpusDiff keys

  test("corpusDiff added-doc ids live in the negative namespace — " +
      "disjoint from any real non-negative doc_id") {
    val diff = CorpusOps.corpusDiff(spark, TestSpark.sf0001)
    val added = diff.filter(col("change") === "added")
    assert(added.count() > 0)
    assert(added.filter(col("doc_id") >= 0).count() === 0,
      "added ids must be negative (collision-free namespace)")
    // and the classification stays consistent: changed/removed ids are
    // real (non-negative) ids
    assert(diff.filter(col("change") =!= "added" && col("doc_id") < 0)
      .count() === 0)
  }
}
