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
  *   2. quality gate + PII   (stateless per-row)
  *   3. decontamination      (drop the eval slice AND docs overlapping it)
  *   4. context-window chunking
  *   5. sequence packing     (token-budget bins per shard)
  *   6. shuffled doc export  (deterministic hash order)
  *
  * Returns the per-stage row counts (the numbers a pipeline report
  * prints). Filter stages compose by doc_id semi/anti joins so each
  * decision stays independently testable against its own oracle.
  */
object CorpusPipeline {

  case class StageCounts(
      total: Long, survivors: Long, afterQuality: Long,
      afterDecontam: Long, chunks: Long, bins: Long)

  def run(s: SparkSession, d: String, outDir: String): StageCounts = {
    val docs = Tables.documents(s, d)
    val total = docs.count()

    val survivorIds = DedupOps.dedupSurvivors(s, d)
    val surviving = docs.join(survivorIds, Seq("doc_id"), "left_semi")
    val survivors = surviving.count()

    val quality = surviving
      .filter(TextOps.qualityKeep(col("text")))
      .withColumn("text", TextOps.redactText(col("text")))
    val afterQuality = quality.count()

    val contaminatedIds = CorpusOps.decontaminateFrom(quality)
      .select(col("doc_id"))
    // Two exclusions, not one: docs OVERLAPPING the eval slice (the
    // contamination anti-join) AND the eval-slice documents themselves —
    // benchmark docs must never reach chunking/packing/export.
    val clean = quality.filter(!CorpusOps.isEvalDoc)
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

    val counts = StageCounts(total, survivors, afterQuality, afterDecontam,
      chunksBack.count(), s.read.parquet(s"$outDir/packed").count())
    Caches.releaseAll()
    counts
  }

  private def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)
}
