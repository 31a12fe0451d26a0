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
      parts.foreach(p =>
        frames(p).write.mode("overwrite").parquet(s"$outDir/$p"))
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
