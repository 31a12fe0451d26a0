package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: dumps the formatted physical plan of each (or one named)
  * SparkEntry query so scan pruning (ReadSchema/PushedFilters), join
  * strategy (BroadcastHashJoin vs SortMergeJoin), and WholeStageCodegen
  * coverage can be reviewed. Usage:
  *   runMain graft.Explain <sfDir> [queryName|--out <dir>]
  * With `--out <dir>`, one `<dir>/<name>.txt` per query (the committed
  * plan snapshots under `plans/`; PlanSnapshotSpec guards the invariants).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 2 && args(1) == "--out") Some(args(2))
      else None
    // `<sfDir> --out <dir> [name]` snapshots one query without touching
    // the other committed snapshots; `<sfDir> [name]` prints to stdout.
    val only =
      if (outDir.isDefined) args.lift(3)
      else if (args.length > 1 && args(1) != "--out") Some(args(1))
      else None
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // report bucketed scans' sort order (self-guarded: only trusted
      // when each bucket is one file) so the superstep snapshot shows
      // the sort-free SMJ the one-file-per-bucket layout buys
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    EngineConf(spark)
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_ == n) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        def fmt(df: org.apache.spark.sql.DataFrame): String =
          try df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          catch { case e: Throwable => s"[explain failed] $e" }
        // the staged pipeline's driver face is a 9-row local summary —
        // its useful plan audit is the per-stage operator plans, composed
        // in-memory so each stage's full lineage is visible
        val plan =
          if (name == "corpus_pipeline_stages")
            try CorpusPipeline.stagePlanFrames(spark, sfDir)
              .map { case (sn, df) => s"===== stage $sn =====\n${fmt(df)}" }
              .mkString("\n")
            catch { case e: Throwable => s"[explain failed] $e" }
          // the embedding pipeline's driver face is a 5-row local
          // summary — same per-stage composition for the plan audit
          else if (name == "emb_pipeline_stages")
            try EmbPipeline.stagePlanFrames(spark, sfDir)
              .map { case (sn, df) => s"===== stage $sn =====\n${fmt(df)}" }
              .mkString("\n")
            catch { case e: Throwable => s"[explain failed] $e" }
          // the pagerank loops checkpoint per round, so the query's own
          // plan is a vacuous post-checkpoint scan — snapshot a REAL
          // superstep frame alongside it
          else if (name == "graph_pagerank" || name == "graph_pagerank_bucketed")
            try ops.GraphOps
              .explainFrames(spark, sfDir, name.endsWith("_bucketed"))
              .map { case (sn, df) => s"===== $sn =====\n${fmt(df)}" }
              .mkString("\n")
            catch { case e: Throwable => s"[explain failed] $e" }
          else if (name == "graph_ppr_bucketed")
            try ops.GraphOps.pprExplainFrames(spark, sfDir)
              .map { case (sn, df) => s"===== $sn =====\n${fmt(df)}" }
              .mkString("\n")
            catch { case e: Throwable => s"[explain failed] $e" }
          // same treatment for the round-8 checkpointed loops: the full
          // query plus the fact-sized edge build and (kcore) a real
          // peel round — the frames the loop's checkpoints hide
          else if (name == "graph_kcore" || name == "graph_components"
              || name == "graph_hop_histogram"
              || name == "graph_label_prop" || name == "graph_modularity"
              || name == "graph_anf" || name == "graph_anf_diameter")
            try ops.GraphOps.explainLoopFrames(spark, sfDir, name)
              .map { case (sn, df) => s"===== $sn =====\n${fmt(df)}" }
              .mkString("\n")
            catch { case e: Throwable => s"[explain failed] $e" }
          else if (name == "emb_mmr_rerank")
            try ops.SimilarityOps.mmrExplainFrames(spark, sfDir)
              .map { case (sn, df) => s"===== $sn =====\n${fmt(df)}" }
              .mkString("\n")
            catch { case e: Throwable => s"[explain failed] $e" }
          else fmt(fn(spark, sfDir))
        outDir match {
          case Some(dir) =>
            new java.io.File(dir).mkdirs()
            java.nio.file.Files.write(
              java.nio.file.Paths.get(dir, s"$name.txt"),
              plan.getBytes("UTF-8"))
            println(s"[explain] wrote $dir/$name.txt")
          case None =>
            println(s"\n===== $name =====")
            println(plan)
        }
      }
    spark.stop()
  }
}
