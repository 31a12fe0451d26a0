package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{CorpusOps, DedupOps, TextOps}

/** The end-to-end training-corpus pipeline — the ops composed in the
  * order a real corpus build runs them, with a parquet materialization
  * at every stage boundary (restartable; each stage's output is the next
  * stage's input, which is also exactly the 100 TB shape — no stage
  * holds another's working set in memory):
  *
  *   1. near-dup survivors   (pair gen → connected components → minima)
  *   2. boilerplate removal  (cross-doc segment dedup; hollow docs drop)
  *   3. quality gate + PII   (stateless per-row)
  *   4. quantile gate        (per-language top keepPct% by alpha ratio)
  *   5. mixture balancing    (optional τ=0.5 per-language budgets)
  *   6. decontamination      (drop the eval slice AND docs overlapping it)
  *   7. context-window chunking
  *   8. sequence packing     (token-budget bins per shard)
  *   9. shuffled doc export  (deterministic hash order)
  *
  * Returns the per-stage row counts (the numbers a pipeline report
  * prints). Filter stages compose by doc_id semi/anti joins so each
  * decision stays independently testable against its own oracle.
  */
object CorpusPipeline {

  case class StageCounts(
      total: Long, survivors: Long, afterBoiler: Long, afterQuality: Long,
      afterGate: Long, afterBalance: Long, afterDecontam: Long,
      chunks: Long, bins: Long)

  /** Per-stage wall-times of the most recent [[run]], in execution order.
    * The pipeline's bench number is otherwise a 9-stage black box — a
    * regression should name its stage, not the whole pipeline. Written at
    * the end of every run (driver-thread only; the bench reads it right
    * after the measured rep it belongs to).
    */
  @volatile var lastStageSeconds: Seq[(String, Double)] = Nil

  def run(s: SparkSession, d: String, outDir: String,
      gatePct: Int = 80, mixtureBudget: Option[Long] = None): StageCounts = {
    val stageSecs = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      stageSecs += ((name, (System.nanoTime() - t0) / 1e9))
      r
    }
    // every stage boundary below is write-then-read-back: the staged
    // parquet IS the stage's output (restartable, externally countable —
    // the driver oracle re-counts these files), and downstream stages
    // read the materialization instead of recomputing lineage
    def stage(df: DataFrame, name: String): DataFrame = {
      write(df, s"$outDir/$name")
      s.read.parquet(s"$outDir/$name")
    }
    val docs = Tables.documents(s, d)
    val total = timed("1_total") { docs.count() }

    val (surviving, survivors) = timed("2_survivors") {
      // the CC fixpoint is the pipeline's most expensive sub-stage and a
      // pure function of the input corpus — persist its labels as a
      // fingerprint-guarded stage artifact and DERIVE survivors from the
      // stored table: an unchanged input re-run (the restartable-build
      // contract every stage boundary here exists for) skips pair
      // generation and the fixpoint entirely, paying one tiny label read
      // + one semi-join. A changed input (fingerprint mismatch) recomputes.
      val labels = labelsArtifact(s, d, outDir)
      val sv = stage(
        docs.join(DedupOps.survivorsFromLabels(docs, labels),
          Seq("doc_id"), "left_semi"), "survivors")
      (sv, sv.count())
    }

    // cross-doc boilerplate removal: rewrite each doc to its unshared
    // segments; docs hollowed to nothing (pure boilerplate) drop here.
    // Runs AFTER near-dup dedup so a surviving near-dup's text is not
    // gutted by its dropped twin's segments.
    val (deboiled, afterBoiler) = timed("3_boilerplate") {
      val db = stage(surviving.drop("text", "n_chars")
        .join(CorpusOps.segmentDedupFrom(surviving)
            .filter(col("kept_segs") > 0)
            .select(col("doc_id"), col("clean_text").as("text")),
          Seq("doc_id")), "deboiled")
      (db, db.count())
    }

    val (quality, afterQuality) = timed("4_quality") {
      val qf = stage(deboiled
        .filter(TextOps.qualityKeep(col("text")))
        .withColumn("text", TextOps.redactText(col("text"))), "quality")
      (qf, qf.count())
    }

    // per-language quantile cut (composes by doc_id semi-join so the gate
    // stays independently oracle-testable). Deliberate: the eval slice
    // (~5%) still competes here and in the mixture budgets even though
    // stage 6 drops it — keep rates apply to the whole corpus, the
    // simpler contract; gate on trainable-only instead by filtering
    // isEvalDoc before this stage if budgets must be post-eval exact

    val (gated, afterGate) = timed("5_gate") {
      val g = stage(quality.join(
        TextOps.qualityGateFrom(quality, gatePct).select("doc_id"),
        Seq("doc_id"), "left_semi"), "gated")
      (g, g.count())
    }

    // optional mixture balancing toward a per-language τ=0.5 budget
    val (balanced, afterBalance) = timed("6_balance") {
      val b = stage(mixtureBudget match {
        case Some(budget) => gated.join(
          TextOps.mixtureSampleFrom(gated, budget).select("doc_id"),
          Seq("doc_id"), "left_semi")
        case None => gated
      }, "balanced")
      (b, b.count())
    }

    // eval grams come from the FULL documents frame, not the pipeline
    // survivors: an eval doc dropped by dedup/quality/gate must still
    // contaminate the training docs that overlap it
    val (cleanBack, afterDecontam) = timed("7_decontam") {
      val contaminatedIds = CorpusOps.decontaminateAgainst(balanced, docs)
        .select(col("doc_id"))
      // Two exclusions, not one: docs OVERLAPPING the eval slice (the
      // contamination anti-join) AND the eval-slice documents themselves —
      // benchmark docs must never reach chunking/packing/export.
      val cb = stage(balanced.filter(!CorpusOps.isEvalDoc)
        .join(contaminatedIds, Seq("doc_id"), "left_anti"), "clean")
      (cb, cb.count())
    }

    val (chunksBack, nChunks) = timed("8_chunks") {
      val cw = stage(CorpusOps.chunkWindowsFrom(cleanBack), "chunks")
      (cw, cw.count())
    }

    val bins = timed("9_packed") {
      write(CorpusOps.packSequencesFrom(chunksBack), s"$outDir/packed")
      s.read.parquet(s"$outDir/packed").count()
    }

    timed("10_shuffled") {
      write(CorpusOps.shuffleExportFrom(cleanBack), s"$outDir/shuffled")
    }

    val counts = StageCounts(total, survivors, afterBoiler, afterQuality,
      afterGate, afterBalance, afterDecontam, nChunks, bins)
    lastStageSeconds = stageSecs.toSeq
    Caches.releaseAll()
    counts
  }

  /** Read-or-compute the near-dup CC labels stage artifact: reuse
    * `outDir/cc_labels` when the stored input fingerprint matches the
    * current corpus files, else run [[DedupOps.nearDupLabels]] and
    * persist both. The fingerprint is file METADATA (name, size, mtime
    * of every part file) — no scan; any rewrite of the input invalidates
    * it. Unreadable/missing artifacts fall through to recompute, never
    * fail the pipeline.
    */
  private def labelsArtifact(s: SparkSession, d: String,
      outDir: String): DataFrame =
    graft.sources.Artifact.readOrCompute(s, outDir,
      "cc_labels.fingerprint", Seq(s"$d/documents.parquet"),
      Seq("cc_labels"))(
      () => Map("cc_labels" -> DedupOps.nearDupLabels(s, d)))("cc_labels")

  /** Metadata fingerprint of the `documents` input (single file or part
    * directory): stable across reads, changed by any rewrite. Walks the
    * Hadoop `FileSystem` API ([[graft.sources.Fingerprint]]) — portable
    * to hdfs/s3a; None (nothing found) means never-reusable.
    */
  private[graft] def inputFingerprint(s: SparkSession,
      d: String): Option[String] =
    graft.sources.Fingerprint.of(s, Seq(s"$d/documents.parquet"))

  /** Per-dataset staging dir: SF basename for human readability PLUS
    * the full-path MD5 namespace (`Sinks.namespaced`) under the
    * configurable staging root — the same keying as the sketch/BPE
    * artifacts, closing the last basename-only staging path: two
    * checkouts whose datasets share a basename (two `data/sf0_1`
    * trees) must not thrash or serve each other's corpus stages. The
    * oracle's `read_parquet` paths are GENERATED from the same helper
    * over the canonical gate dir, so the two sides cannot drift.
    */
  def stageDir(s: SparkSession, d: String): String =
    graft.sources.Sinks.namespaced(
      s"${graft.sources.Artifact.stagingRoot(s)}/graft_corpus_stages/" +
        new java.io.File(d).getName, d)

  /** Driver-gate face of the pipeline: run end-to-end, then surface the
    * stage-count reconciliation (total → survivors → … → packed) as a
    * deterministic (stage, n_rows) frame. The DuckDB twin re-counts the
    * STAGED PARQUET for every stage — an independent audit that the
    * numbers the pipeline reports are the numbers it actually wrote, the
    * reconciliation row a 100 TB corpus build publishes per run.
    */
  def stageSummary(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = run(s, d, stageDir(s, d))
    Seq(
      ("1_total", c.total), ("2_survivors", c.survivors),
      ("3_boilerplate", c.afterBoiler), ("4_quality", c.afterQuality),
      ("5_gate", c.afterGate), ("6_balance", c.afterBalance),
      ("7_decontam", c.afterDecontam), ("8_chunks", c.chunks),
      ("9_packed", c.bins)
    ).toDF("stage", "n_rows").orderBy("stage")
  }

  /** The stage DataFrames composed IN-MEMORY (no parquet boundaries) —
    * the plan-audit face of [[run]]: each stage's full operator plan is
    * visible instead of a scan of the previous stage's materialization.
    * `Explain` snapshots these as the `corpus_pipeline_stages` stage-plan
    * set. Building them executes the bounded prep jobs some ops run at
    * construction (CC fixpoint, bloom build) — cheap at audit SFs.
    */
  def stagePlanFrames(s: SparkSession, d: String,
      gatePct: Int = 80): Seq[(String, DataFrame)] = {
    val docs = Tables.documents(s, d)
    val surviving = docs.join(
      DedupOps.dedupSurvivors(s, d), Seq("doc_id"), "left_semi")
    val deboiled = surviving.drop("text", "n_chars")
      .join(CorpusOps.segmentDedupFrom(surviving)
          .filter(col("kept_segs") > 0)
          .select(col("doc_id"), col("clean_text").as("text")),
        Seq("doc_id"))
    val quality = deboiled
      .filter(TextOps.qualityKeep(col("text")))
      .withColumn("text", TextOps.redactText(col("text")))
    val gated = quality.join(
      TextOps.qualityGateFrom(quality, gatePct).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val clean = gated.filter(!CorpusOps.isEvalDoc)
      .join(CorpusOps.decontaminateAgainst(gated, docs).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
    val chunks = CorpusOps.chunkWindowsFrom(clean)
    Seq(
      "2_survivors" -> surviving,
      "3_boilerplate" -> deboiled,
      "4_quality" -> quality,
      "5_gate" -> gated,
      "7_decontam" -> clean,
      "8_chunks" -> chunks,
      "9_packed" -> CorpusOps.packSequencesFrom(chunks),
      "10_shuffled" -> CorpusOps.shuffleExportFrom(clean))
  }

  private def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)
}
