package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.Path

/** Read-or-compute for fingerprint-guarded parquet artifacts — the
  * build-once/serve-many discipline every expensive derived stage here
  * shares (near-dup CC labels, the trained BPE tokenizer, the hourly
  * sketch partials, the bucketed PageRank layout): reuse the persisted
  * frames while the input files are unchanged, else rebuild and
  * re-mark. The fingerprint is file METADATA via [[Fingerprint]]
  * (portable to hdfs/s3a) — no scan; any input rewrite invalidates.
  *
  * Crash discipline: the marker is written LAST, after every frame
  * landed — a crash mid-build leaves no (or a stale-keyed) marker and
  * the next call rebuilds. The fingerprint is re-read AFTER the build
  * and the marker skipped if it moved — an input rewritten DURING the
  * build would otherwise mark a torn artifact (built from mixed
  * input) as covered by the pre-build fingerprint and silently serve
  * it until the next input change. A `None` fingerprint (degenerate
  * walk — missing/empty input) always rebuilds and never writes a
  * marker, so a guard can never match a degenerate constant.
  * Unreadable artifacts fall through to rebuild, never fail the
  * caller.
  */
object Artifact {

  /** Staging root for artifact/stage directories — configurable so a
    * cluster deployment points at job-scoped scratch storage instead
    * of the shared default-FS `/tmp`.
    */
  def stagingRoot(s: SparkSession): String =
    s.conf.get("spark.graft.staging.root", "/tmp")

  /** Target on-disk file size for artifact parts (guide §6: output
    * files in the 128 MB–1 GB range) — conf-overridable for cluster
    * deployments with different storage economics.
    */
  private def targetFileBytes(s: SparkSession): Long =
    s.conf.get("spark.graft.artifact.targetFileBytes",
      (128L * 1024 * 1024).toString).toLong

  /** Compact a freshly-written artifact part to its size-derived file
    * count: `max(1, ceil(totalBytes / targetFileBytes))`. Two jobs this
    * fixes, one per scale regime:
    *
    *  - SMALL parts (every test SF): the first write inherits the
    *    BUILDER session's partitioning — 4 files from a `local[4]`
    *    verify, 32 from the `local[32]` bench — so the on-disk layout
    *    (and with it the size ESTIMATES that pick join build sides in
    *    every consumer plan) depended on which session happened to
    *    build the artifact first. That is session-history plan
    *    nondeterminism, the exact class round 12 eliminated for confs
    *    (EngineConf): round 13's inherited tree had 3 artifact-served
    *    queries (graph_scc/graph_condensation/graph_reach_census) whose
    *    committed fingerprints matched a warm-/tmp build and flipped
    *    build sides on a cold one. The size-derived count is a pure
    *    function of the artifact's bytes, never of the builder.
    *  - LARGE parts (the 100 TB regime): the build's final stage may
    *    legitimately run thousands of tasks; without compaction every
    *    SERVE of the artifact pays the small-files tax (listing + one
    *    footer/open per file — guide §6) on every read, forever. The
    *    build is one-time; the reads are the steady state.
    *
    * Only ever COALESCES (files > target): a part already at or below
    * its target count is left byte-identical, so a re-build by a
    * different session converges on the same layout instead of
    * oscillating. Runs before the fingerprint marker is written —
    * a crash mid-compaction leaves a missing/partial part dir that
    * the `reusable` check rejects, so the next call rebuilds.
    */
  private def compactPart(s: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, dir: Path): Unit = {
    val files = fs.listStatus(dir)
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    if (files.isEmpty) return
    val total = files.map(_.getLen).sum
    val target = math.max(1L,
      (total + targetFileBytes(s) - 1) / targetFileBytes(s))
    if (files.length > target) {
      val tmp = new Path(dir.getParent, s".${dir.getName}_compact")
      try fs.delete(tmp, true) catch { case _: Exception => () }
      s.read.parquet(dir.toString)
        .coalesce(math.min(target, Int.MaxValue.toLong).toInt)
        .write.mode("overwrite").parquet(tmp.toString)
      fs.delete(dir, true)
      fs.rename(tmp, dir)
    }
  }

  /** Reuse-or-rebuild the artifact frames named by `parts` (each
    * persisted at `outDir/<part>`): returns part → read-back frame.
    * `build` must produce exactly the `parts` keys.
    */
  def readOrCompute(s: SparkSession, outDir: String, markerName: String,
      fpRoots: Seq[String], parts: Seq[String])(
      build: () => Map[String, DataFrame]): Map[String, DataFrame] = {
    val fpFile = new Path(s"$outDir/$markerName")
    val fs = fpFile.getFileSystem(s.sparkContext.hadoopConfiguration)
    val fp = Fingerprint.of(s, fpRoots)
    def stored: Option[String] =
      try {
        if (!fs.exists(fpFile)) None
        else {
          val in = fs.open(fpFile)
          try {
            val b = new java.io.ByteArrayOutputStream()
            org.apache.hadoop.io.IOUtils.copyBytes(in, b, 4096, false)
            Some(b.toString("UTF-8"))
          } finally in.close()
        }
      } catch { case _: Exception => None }
    val reusable = fp.isDefined && stored == fp &&
      (try parts.forall(p => fs.exists(new Path(s"$outDir/$p")))
       catch { case _: Exception => false })
    if (!reusable) {
      try fs.delete(fpFile, false) catch { case _: Exception => () }
      val frames = build()
      require(frames.keySet == parts.toSet,
        s"artifact build produced ${frames.keySet}, expected $parts")
      parts.foreach { p =>
        frames(p).write.mode("overwrite").parquet(s"$outDir/$p")
        compactPart(s, fs, new Path(s"$outDir/$p"))
      }
      // marker only if the input did NOT move during the build —
      // otherwise leave unmarked so the next call rebuilds cleanly
      val fpAfter = Fingerprint.of(s, fpRoots)
      if (fpAfter == fp) fp.foreach { f =>
        val out = fs.create(fpFile, true)
        try out.write(f.getBytes("UTF-8")) finally out.close()
      }
    }
    parts.map(p => p -> s.read.parquet(s"$outDir/$p")).toMap
  }
}
