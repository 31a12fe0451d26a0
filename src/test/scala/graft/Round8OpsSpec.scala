package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GraphOps
import graft.sources.Fingerprint

/** Round-8 hardening of the bucketed-PageRank artifact machinery: the
  * filesystem-portable layout fingerprint (rebuild on change, reuse on
  * no-change, never reuse a degenerate walk), restart-resume from the
  * round marker, and the per-dataset warehouse namespace.
  */
class Round8OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  // small undirected graph: 1—2, 2—3, 3—4, 4—1, 1—3 (both directions)
  private def ringEdges: DataFrame = {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
  }

  private def ranks(df: DataFrame): Seq[(Long, Long)] =
    df.orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("Fingerprint.of walks the Hadoop FileSystem API: Some for real " +
      "inputs, stable across calls, changed by a file touch, and None " +
      "(never a reusable constant) for an empty/missing walk") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r8_fp")
    val f = dir.resolve("a.bin")
    java.nio.file.Files.write(f, Array[Byte](1, 2, 3))
    val fp1 = Fingerprint.of(spark, Seq(dir.toString))
    assert(fp1.isDefined)
    assert(fp1 === Fingerprint.of(spark, Seq(dir.toString)))
    // full path is part of the entry — two different inputs never collide
    assert(fp1.get.contains("a.bin") && fp1.get.contains(dir.toString))
    assert(new java.io.File(f.toString)
      .setLastModified(System.currentTimeMillis() + 120000))
    assert(Fingerprint.of(spark, Seq(dir.toString)) !== fp1)
    assert(Fingerprint.of(spark, Seq(dir.toString + "_missing")) === None)
    val empty = java.nio.file.Files.createTempDirectory("graft_r8_empty")
    assert(Fingerprint.of(spark, Seq(empty.toString)) === None)
  }

  test("bucketed layout guard: unchanged input reuses the written edge " +
      "layout; touching one input file rebuilds it; results identical " +
      "throughout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r8_ds")
    def copyTable(name: String): Unit = {
      val src = java.nio.file.Paths.get(TestSpark.sf0001, name)
      val dst = dir.resolve(name)
      if (java.nio.file.Files.isDirectory(src)) {
        java.nio.file.Files.createDirectories(dst)
        java.nio.file.Files.list(src).forEach(p =>
          java.nio.file.Files.copy(p, dst.resolve(p.getFileName.toString)))
      } else java.nio.file.Files.copy(src, dst)
    }
    Seq("orders.parquet", "lineitem.parquet", "customer.parquet")
      .foreach(copyTable)
    val d = dir.toString
    val pfx = GraphOps.tablePrefixFor(d)
    def edgeFileStamps: Map[String, Long] = {
      val whConf = spark.conf.get("spark.sql.warehouse.dir")
      val whPath = if (whConf.contains(":"))
        new java.net.URI(whConf).getPath else whConf
      val wh = new java.io.File(whPath, s"${pfx}_edges_bkt")
      Option(wh.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified).toMap
    }
    def run(): Seq[String] =
      GraphOps.pageRankBucketed(spark, d, iters = 3)
        .collect().map(_.toString).toSeq
    val r1 = run()
    val stamps1 = edgeFileStamps
    assert(stamps1.nonEmpty)
    val r2 = run()
    assert(edgeFileStamps === stamps1,
      "unchanged input must reuse the edge layout, not rewrite it")
    assert(r2 === r1)
    // touch one input file → fingerprint changes → layout rebuilds
    val op = new java.io.File(dir.resolve("orders.parquet").toString)
    val part = if (op.isDirectory)
      op.listFiles().filter(_.getName.endsWith(".parquet")).head else op
    assert(part.setLastModified(part.lastModified() + 120000))
    val r3 = run()
    assert(edgeFileStamps !== stamps1,
      "changed input must invalidate and rebuild the edge layout")
    assert(r3 === r1, "same bytes → same ranks, rebuilt or not")
  }

  test("restart-resume: kill the loop after round k, re-invoke — the " +
      "final ranks are bit-identical to an uninterrupted run and only " +
      "iters − k further supersteps execute") {
    val iters = 6
    val expected = ranks(GraphOps.pageRankFromBucketed(spark, ringEdges,
      iters = iters, buckets = 4, tablePrefix = "graft_r8_exp",
      layoutKey = Some("k8")))
    val killed = scala.collection.mutable.ArrayBuffer.empty[Int]
    val boom = intercept[RuntimeException] {
      GraphOps.pageRankFromBucketed(spark, ringEdges, iters = iters,
        buckets = 4, tablePrefix = "graft_r8_res", layoutKey = Some("k8"),
        onRoundComplete = i => {
          killed += i; if (i == 2) throw new RuntimeException("kill")
        })
    }
    assert(boom.getMessage === "kill")
    assert(killed.toSeq === Seq(1, 2))
    val resumed = scala.collection.mutable.ArrayBuffer.empty[Int]
    val res = ranks(GraphOps.pageRankFromBucketed(spark, ringEdges,
      iters = iters, buckets = 4, tablePrefix = "graft_r8_res",
      layoutKey = Some("k8"), onRoundComplete = resumed += _))
    assert(resumed.toSeq === (3 to iters),
      s"resume must execute exactly iters − k supersteps, ran: $resumed")
    assert(res === expected)
    // a COMPLETED run re-invoked with an unchanged key returns the
    // stored ranks without any further superstep — the pure-function
    // artifact semantics every fingerprint-guarded stage here has
    val again = scala.collection.mutable.ArrayBuffer.empty[Int]
    val res2 = ranks(GraphOps.pageRankFromBucketed(spark, ringEdges,
      iters = iters, buckets = 4, tablePrefix = "graft_r8_res",
      layoutKey = Some("k8"), onRoundComplete = again += _))
    assert(again.isEmpty && res2 === expected)
    // a CHANGED layout key must not resume over stale ranks
    val fresh = scala.collection.mutable.ArrayBuffer.empty[Int]
    GraphOps.pageRankFromBucketed(spark, ringEdges, iters = iters,
      buckets = 4, tablePrefix = "graft_r8_res", layoutKey = Some("k9"),
      onRoundComplete = fresh += _)
    assert(fresh.toSeq === (1 to iters),
      "changed layout key must rebuild and rerun from round 0")
  }

  test("BPE training artifact: bpeEncode after bpeMerges runs ZERO " +
      "further merge rounds (the trained state is read back, not " +
      "retrained), and an unchanged input never retrains") {
    import graft.ops.TextOps
    // fresh copy → fresh fingerprint → the first call must train
    val dir = java.nio.file.Files.createTempDirectory("graft_r8_bpe")
    val src = java.nio.file.Paths.get(TestSpark.sf0001, "documents.parquet")
    val dst = dir.resolve("documents.parquet")
    if (java.nio.file.Files.isDirectory(src)) {
      java.nio.file.Files.createDirectories(dst)
      java.nio.file.Files.list(src).forEach(p =>
        java.nio.file.Files.copy(p, dst.resolve(p.getFileName.toString)))
    } else java.nio.file.Files.copy(src, dst)
    val d = dir.toString
    val before = TextOps.trainRounds.get()
    val merges = TextOps.bpeMerges(spark, d).collect()
    assert(merges.length === 8)
    assert(TextOps.trainRounds.get() === before + 8,
      "first call over a fresh input must train all 8 rounds")
    val mid = TextOps.trainRounds.get()
    val enc = TextOps.bpeEncode(spark, d).collect()
    assert(enc.nonEmpty)
    assert(TextOps.trainRounds.get() === mid,
      "encode must consume the trained artifact, never retrain")
    val merges2 = TextOps.bpeMerges(spark, d).collect()
    assert(TextOps.trainRounds.get() === mid,
      "unchanged input must reuse the stored merge table")
    assert(merges2.map(_.toString).toSeq === merges.map(_.toString).toSeq)
  }

  test("sketchPartials artifact: built on first consumer touch, reused " +
      "by the rest of the family (no second fact pass), invalidated by " +
      "an input change; every consumer's sketch side reads the stored " +
      "partials, not events") {
    import graft.ops.EventOps
    val d = TestSpark.sf0001
    val art = new java.io.File("/tmp/graft_sketch_stages/" +
      new java.io.File(d).getName)
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
      f.delete(); ()
    }
    deleteRec(art)
    val sliding = EventOps.slidingDistinctUsers(spark, d).collect()
    assert(sliding.nonEmpty)
    assert(art.exists, "first consumer must persist the partials")
    def partStamps: Map[String, Long] = {
      val dir = new java.io.File(art, "hourly_partials")
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified).toMap
    }
    val stamps = partStamps
    assert(stamps.nonEmpty)
    // the other four family members read the same stored partials —
    // no rebuild (file stamps unchanged), flags all hold
    val daily = EventOps.quantileRollupDaily(spark, d).collect()
    assert(daily.nonEmpty &&
      daily.forall(r => r.getBoolean(4) && r.getBoolean(5)))
    val slidingQ = EventOps.slidingQuantile(spark, d).collect()
    assert(slidingQ.nonEmpty)
    val overlap = EventOps.segmentOverlap(spark, d).collect()
    assert(overlap.nonEmpty && overlap.forall(_.getBoolean(3)))
    val excl = EventOps.segmentExclusive(spark, d).collect()
    assert(excl.nonEmpty && excl.forall(_.getBoolean(3)))
    assert(partStamps === stamps,
      "family members after the first must NOT rebuild the partials")
    // sketch side reads the artifact (its theta_sk column exists only
    // in the stored partials), not a fresh per-type fact sketch
    val planStr = EventOps.segmentOverlap(spark, d)
      .queryExecution.optimizedPlan.toString
    assert(planStr.contains("theta_sk") &&
      planStr.contains("theta_union_agg"),
      s"sketch side must union the stored partials:\n$planStr")
  }

  test("per-dataset table namespace: two interleaved invocations over " +
      "different inputs land in disjoint warehouse tables and both stay " +
      "correct") {
    assert(GraphOps.tablePrefixFor("/a") !== GraphOps.tablePrefixFor("/b"))
    import spark.implicits._
    val pairsB = Seq((1L, 2L), (2L, 3L))
    val edgesB = (pairsB ++ pairsB.map(_.swap)).toDF("src", "dst")
    val expA = ranks(GraphOps.pageRankFromBucketed(spark, ringEdges,
      iters = 3, buckets = 4, tablePrefix = "graft_r8_nsa",
      layoutKey = Some("a")))
    val expB = ranks(GraphOps.pageRankFromBucketed(spark, edgesB,
      iters = 3, buckets = 4, tablePrefix = "graft_r8_nsb",
      layoutKey = Some("b")))
    // interleave again — B's run must not have clobbered A's tables
    val againA = ranks(GraphOps.pageRankFromBucketed(spark, ringEdges,
      iters = 3, buckets = 4, tablePrefix = "graft_r8_nsa",
      layoutKey = Some("a")))
    val againB = ranks(GraphOps.pageRankFromBucketed(spark, edgesB,
      iters = 3, buckets = 4, tablePrefix = "graft_r8_nsb",
      layoutKey = Some("b")))
    assert(againA === expA && againB === expB)
    assert(expA !== expB)
  }
}
