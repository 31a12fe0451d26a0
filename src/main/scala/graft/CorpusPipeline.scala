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

  def run(s: SparkSession, d: String, outDir: String,
      gatePct: Int = 80, mixtureBudget: Option[Long] = None): StageCounts = {
    val docs = Tables.documents(s, d)
    val total = docs.count()

    val survivorIds = DedupOps.dedupSurvivors(s, d)
    val surviving = docs.join(survivorIds, Seq("doc_id"), "left_semi")
    val survivors = surviving.count()

    // cross-doc boilerplate removal: rewrite each doc to its unshared
    // segments; docs hollowed to nothing (pure boilerplate) drop here.
    // Runs AFTER near-dup dedup so a surviving near-dup's text is not
    // gutted by its dropped twin's segments.
    val deboiled = surviving.drop("text", "n_chars")
      .join(CorpusOps.segmentDedupFrom(surviving)
          .filter(col("kept_segs") > 0)
          .select(col("doc_id"), col("clean_text").as("text")),
        Seq("doc_id"))
    val afterBoiler = deboiled.count()

    val quality = deboiled
      .filter(TextOps.qualityKeep(col("text")))
      .withColumn("text", TextOps.redactText(col("text")))
    val afterQuality = quality.count()

    // per-language quantile cut (composes by doc_id semi-join so the gate
    // stays independently oracle-testable)
    val gated = quality.join(
      TextOps.qualityGateFrom(quality, gatePct).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val afterGate = gated.count()

    // optional mixture balancing toward a per-language τ=0.5 budget
    val balanced = mixtureBudget match {
      case Some(b) => gated.join(
        TextOps.mixtureSampleFrom(gated, b).select("doc_id"),
        Seq("doc_id"), "left_semi")
      case None => gated
    }
    val afterBalance = balanced.count()

    val contaminatedIds = CorpusOps.decontaminateFrom(balanced)
      .select(col("doc_id"))
    // Two exclusions, not one: docs OVERLAPPING the eval slice (the
    // contamination anti-join) AND the eval-slice documents themselves —
    // benchmark docs must never reach chunking/packing/export.
    val clean = balanced.filter(!CorpusOps.isEvalDoc)
      .join(contaminatedIds, Seq("doc_id"), "left_anti")
    write(clean, s"$outDir/clean")
    val cleanBack = s.read.parquet(s"$outDir/clean")
    val afterDecontam = cleanBack.count()

    val chunks = CorpusOps.chunkWindowsFrom(cleanBack)
    write(chunks, s"$outDir/chunks")
    val chunksBack = s.read.parquet(s"$outDir/chunks")

    val packed = CorpusOps.packSequencesFrom(chunksBack)
    write(packed, s"$outDir/packed")

    write(CorpusOps.shuffleExportFrom(cleanBack), s"$outDir/shuffled")

    val counts = StageCounts(total, survivors, afterBoiler, afterQuality,
      afterGate, afterBalance, afterDecontam,
      chunksBack.count(), s.read.parquet(s"$outDir/packed").count())
    Caches.releaseAll()
    counts
  }

  private def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)
}
