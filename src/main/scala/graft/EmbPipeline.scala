package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.SimilarityOps

/** End-to-end embedding-corpus curation — the vector-side twin of
  * [[CorpusPipeline]], the other half of a multimodal training-data
  * build: validity gate → semantic dedup → budget sample → quantized
  * export, each stage MATERIALIZED to parquet and consumed by the next
  * from disk (at 100 TB every stage boundary is a durable,
  * independently recountable table — exactly what the driver's DuckDB
  * twin audits: the reported counts must be the counts actually
  * written).
  *
  * Stages:
  *  1. total    — the raw embedding table.
  *  2. valid    — drop zero-norm vectors (failed encoder outputs; the
  *                [[SimilarityOps.normProfile]] min=0 pathology). The
  *                norm² is the integer-nanos row-local sum, so the gate
  *                is engine-exact.
  *  3. semdedup — SemDeDup survivors ([[SimilarityOps
  *                .semanticDedupFrom]] over the STAGED valid set:
  *                cluster-blocked exact-cosine pairs, greedy keep-
  *                lowest-id).
  *  4. sample   — deterministic 80% budget downsample (vec_id mod 100
  *                < 80 — reproducible, join-free, the same id-hash
  *                discipline as the text splits).
  *  5. export   — int8-quantized index representation
  *                ([[graft.functions.QuantizeInt8]] — the 4×-smaller
  *                form a 100 TB ANN index actually stores), one row per
  *                sampled vector.
  */
object EmbPipeline {

  /** Per-dataset staging dir — the same full-path-MD5 namespacing under
    * the configurable staging root as [[CorpusPipeline.stageDir]] and
    * the sketch/BPE artifacts.
    */
  def stageDir(s: SparkSession, d: String): String =
    graft.sources.Sinks.namespaced(
      s"${graft.sources.Artifact.stagingRoot(s)}/graft_emb_stages/" +
        new java.io.File(d).getName, d)

  final case class Counts(total: Long, valid: Long, survivors: Long,
      sample: Long, exported: Long)

  /** Zero-norm validity predicate: integer-nanos norm² > 0 (row-local,
    * engine-exact — shared with [[SimilarityOps.normProfile]]'s
    * quantization).
    */
  private def norm2Nanos = expr(
    """aggregate(embedding, 0L, (acc, x) ->
      acc + cast(floor(cast(x as double) * cast(x as double) * 1e9)
        as bigint))""")

  def run(s: SparkSession, d: String, outDir: String,
      cells: Int = 10, threshold: Double = 0.4,
      samplePct: Int = 80): Counts = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val total = emb.count()
    write(emb.filter(norm2Nanos > 0), s"$outDir/valid")
    val valid = s.read.parquet(s"$outDir/valid")
    write(SimilarityOps.semanticDedupFrom(valid, cells, threshold),
      s"$outDir/survivors")
    val survivors = s.read.parquet(s"$outDir/survivors")
    write(valid
        .join(survivors.select("vec_id"), Seq("vec_id"), "left_semi")
        .filter(col("vec_id") % 100 < samplePct),
      s"$outDir/sample")
    val sample = s.read.parquet(s"$outDir/sample")
    write(sample.select(col("vec_id"),
        graft.functions.QuantizeInt8.quantizeInt8Compiled(
          col("embedding")).cast("array<int>").as("q8")),
      s"$outDir/export_int8")
    Counts(total, valid.count(), survivors.count(), sample.count(),
      s.read.parquet(s"$outDir/export_int8").count())
  }

  /** Driver-gate face: run end-to-end, surface the stage-count
    * reconciliation. The DuckDB twin re-counts the STAGED parquet per
    * stage — the independent audit that the reported numbers are the
    * numbers actually written.
    */
  def stageSummary(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = run(s, d, stageDir(s, d))
    Seq(
      ("1_total", c.total), ("2_valid", c.valid),
      ("3_semdedup", c.survivors), ("4_sample", c.sample),
      ("5_export_int8", c.exported)
    ).toDF("stage", "n_rows").orderBy("stage")
  }

  /** The stage frames composed IN-MEMORY — the plan-audit face (the
    * [[CorpusPipeline.stagePlanFrames]] discipline): each stage's full
    * operator plan is visible instead of a scan of the previous
    * stage's materialization.
    */
  def stagePlanFrames(s: SparkSession, d: String): Seq[(String, DataFrame)] = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val valid = emb.filter(norm2Nanos > 0)
    val survivors = SimilarityOps.semanticDedupFrom(valid, 10, 0.4)
    val sample = valid
      .join(survivors.select("vec_id"), Seq("vec_id"), "left_semi")
      .filter(col("vec_id") % 100 < 80)
    val export = sample.select(col("vec_id"),
      graft.functions.QuantizeInt8.quantizeInt8Compiled(
        col("embedding")).cast("array<int>").as("q8"))
    Seq("2_valid" -> valid, "3_semdedup" -> survivors,
      "4_sample" -> sample, "5_export_int8" -> export)
  }

  private def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)
}
