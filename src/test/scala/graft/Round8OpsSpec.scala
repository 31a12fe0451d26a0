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
    // the full-path-namespaced artifact dir (same-basename datasets
    // must not collide — round-9 advice fix)
    val art = new java.io.File(graft.sources.Sinks.namespaced(
      graft.sources.Artifact.stagingRoot(spark) +
        "/graft_sketch_stages/" + new java.io.File(d).getName, d))
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

  test("personalized PageRank: rank mass conserved within quantization " +
      "loss, teleport lands only near the seed nation (its customers " +
      "out-rank their plain-PageRank standing), deterministic reruns") {
    import graft.ops.GraphOps
    val d = TestSpark.sf0001
    val ppr = GraphOps.personalizedPageRank(spark, d).collect()
    assert(ppr.length === 20)
    // personalization must actually change the ranking vs the plain loop
    val plain = GraphOps.pageRank(spark, d).collect()
    assert(ppr.map(_.getLong(0)).toSeq !== plain.map(_.getLong(0)).toSeq,
      "seeded teleport must reorder the global ranking")
    assert(ppr.forall(_.getDouble(2) > 0))
    // deterministic: bit-identical rerun (scaled-integer contract)
    val again = GraphOps.personalizedPageRank(spark, d).collect()
    assert(again.map(_.toString).toSeq === ppr.map(_.toString).toSeq)
  }

  test("rrfFusion: per-query lists are contiguous top-10 ranks, every " +
      "fused score equals 1/(60+rank_bm25) + 1/(60+rank_tfidf) with " +
      "absent ranks contributing zero, and a doc ranked first by both " +
      "retrievers is ranked first in the fusion") {
    import graft.ops.TextOps
    val d = TestSpark.sf0001
    val rows = TextOps.rrfFusion(spark, d).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (q, rs) =>
      val ranks = rs.map(_.getLong(1)).sorted.toSeq
      assert(ranks === (1L to ranks.length), s"query $q ranks: $ranks")
      assert(ranks.length <= 10)
    }
    rows.foreach { r =>
      val ra = Option(r.get(3)).map(_.asInstanceOf[Long])
      val rb = Option(r.get(4)).map(_.asInstanceOf[Long])
      val want = ra.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rb.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(r.getDouble(5) === want, r.toString)
      assert(ra.isDefined || rb.isDefined)
    }
    // agreement case: rank-1 in both retrievers dominates every other
    // attainable rrf score (1/61 + 1/61 is the maximum)
    val bm25First = TextOps.bm25TopK(spark, d).collect()
      .filter(_.getLong(1) == 1L).map(r => r.getLong(0) -> r.getLong(2))
      .toMap
    val tfidfFirst = TextOps.queryTfidfTopK(spark, d).collect()
      .filter(_.getLong(1) == 1L).map(r => r.getLong(0) -> r.getLong(2))
      .toMap
    byQ.foreach { case (q, rs) =>
      if (bm25First.get(q).isDefined &&
          bm25First.get(q) == tfidfFirst.get(q)) {
        val top = rs.find(_.getLong(1) == 1L).get
        assert(top.getLong(2) === bm25First(q),
          s"query $q: both-retrievers-agree doc must fuse to rank 1")
      }
    }
  }

  test("triangleCounts: K4 yields 4 triangles with every node in 3; a " +
      "path has none; a hub star has none (orientation bounds the " +
      "wedge fan-out without losing any closure)") {
    import spark.implicits._
    import graft.ops.GraphOps
    def edgesOf(pairs: (Long, Long)*) = pairs.toDF("a", "b")
    // K4 on {1,2,3,4}: C(4,3) = 4 triangles, each node in C(3,2) = 3
    val k4 = GraphOps.triangleCountsFromEdges(
      edgesOf((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)),
      topK = 10).collect()
    assert(k4.map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // path 1-2-3-4: wedges exist, no closures
    assert(GraphOps.triangleCountsFromEdges(
      edgesOf((1L, 2L), (2L, 3L), (3L, 4L)), topK = 10).count() === 0)
    // star: hub 1 to 5 leaves — zero triangles, and orientation points
    // every edge AT the hub (leaves have smaller degree), so the hub
    // produces zero wedges instead of C(5,2)
    assert(GraphOps.triangleCountsFromEdges(
      edgesOf((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L)),
      topK = 10).count() === 0)
    // driver entry returns rows on the fixture
    assert(GraphOps.triangleCounts(spark, TestSpark.sf0001).count() > 0)
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

  test("pmiCollocations: every emitted pair's count and PMI match an " +
      "independent driver-side recount (ln association ratio rounded " +
      "onto DECIMAL(20,8)), minCount holds, scores are non-increasing " +
      "with (w1, w2) tie-breaks, and reruns are bit-identical") {
    import graft.ops.TextOps
    val d = TestSpark.sf0001
    val rows = TextOps.pmiCollocations(spark, d).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    // independent recount over the SAME tokenizer output
    val toks = graft.Tables.documents(spark, d)
      .select(TextOps.tokens(lower(col("text"))).as("t"))
      .collect().map(_.getSeq[String](0))
    val uni = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    val pair = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    var nb = 0L
    toks.foreach { ts =>
      ts.foreach(t => uni(t) += 1)
      if (ts.length >= 2) {
        nb += ts.length - 1
        ts.sliding(2).foreach { w => pair((w(0), w(1))) += 1 }
      }
    }
    val nt = uni.values.sum
    def pmiOf(w1: String, w2: String): Double =
      BigDecimal(math.log(pair((w1, w2)).toDouble * nt * nt
          / (nb.toDouble * uni(w1) * uni(w2))))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      val (w1, w2, n) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(n >= 5 && n === pair((w1, w2)), s"count of ($w1, $w2)")
      assert(r.getDouble(3) === pmiOf(w1, w2), s"pmi of ($w1, $w2)")
    }
    rows.toSeq.sliding(2).foreach {
      case Seq(x, y) =>
        val tie = x.getDouble(3) == y.getDouble(3)
        assert(x.getDouble(3) >= y.getDouble(3))
        if (tie) assert(
          x.getString(0) < y.getString(0) ||
            (x.getString(0) == y.getString(0) &&
              x.getString(1) < y.getString(1)),
          "tie must break by (w1, w2)")
      case _ => ()
    }
    val again = TextOps.pmiCollocations(spark, d).collect()
    assert(again.map(_.toString).toSeq === rows.map(_.toString).toSeq)
  }

  test("heapsFit: beta and ln_k equal a driver-side OLS recompute over " +
      "the same per-doc (tokens, types) points exactly, and the " +
      "fixture exponent is sublinear (0 < beta < 1)") {
    import graft.ops.TextOps
    val d = TestSpark.sf0001
    val row = TextOps.heapsFit(spark, d).collect()(0)
    val pts = graft.Tables.documents(spark, d)
      .select(TextOps.tokens(lower(col("text"))).as("t"))
      .collect().map(_.getSeq[String](0))
      .filter(_.nonEmpty)
      .map(t => (t.length.toLong, t.distinct.length.toLong))
    def d9(v: Double): BigDecimal =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val n = pts.length.toLong
    val sx = pts.map(p => d9(math.log(p._1.toDouble))).sum.toDouble
    val sy = pts.map(p => d9(math.log(p._2.toDouble))).sum.toDouble
    val sxy = pts.map(p => d9(math.log(p._1.toDouble)
      * math.log(p._2.toDouble))).sum.toDouble
    val sxx = pts.map(p => d9(math.log(p._1.toDouble)
      * math.log(p._1.toDouble))).sum.toDouble
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val lnK = (sy - beta * sx) / n
    assert(row.getLong(0) === n)
    assert(row.getDouble(1) === beta)
    assert(row.getDouble(2) === lnK)
    assert(beta > 0.0 && beta < 1.0)
  }

  test("clusteringCoeff: K4 is perfectly transitive (C exactly 1.0, " +
      "4 triangles / 12 wedges / 6 edges); a path has wedges but C " +
      "exactly 0.0") {
    import spark.implicits._
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("a", "b")
    val rk = GraphOps.clusteringCoeffFromEdges(k4).collect()(0)
    assert((rk.getLong(0), rk.getLong(1), rk.getLong(2), rk.getLong(3),
      rk.getDouble(4)) === ((4L, 6L, 12L, 4L, 1.0)))
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val rp = GraphOps.clusteringCoeffFromEdges(path).collect()(0)
    assert((rp.getLong(2), rp.getLong(3), rp.getDouble(4))
      === ((2L, 0L, 0.0)))
  }

  test("dedupRateReport: per-language counts reconcile with the label " +
      "table and the doc list (n_docs sums to corpus size, n_removed = " +
      "n_clustered - clusters-per-lang survivor count, rate = ratio)") {
    import graft.ops.DedupOps
    val d = TestSpark.sf0001
    val got = DedupOps.dedupRateReport(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.nonEmpty)
    val docs = graft.Tables.documents(spark, d)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val lab = DedupOps.nearDupLabels(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byLang = docs.groupBy(_._2)
    val labByDoc = lab.toMap
    got.foreach { case (lang, nDocs, nClustered, nRemoved, rate) =>
      val ids = byLang(lang).keys.toSeq
      assert(nDocs === ids.size.toLong)
      assert(nClustered === ids.count(labByDoc.contains).toLong)
      assert(nRemoved ===
        ids.count(i => labByDoc.get(i).exists(_ != i)).toLong)
      assert(rate === nRemoved.toDouble / nDocs)
    }
    assert(got.map(_._2).sum === docs.size.toLong)
  }

  test("seasonalAnomaly: the flagged cell set equals a driver-side " +
      "STL-style recompute (detrend, deseasonalize, exact-lower-median " +
      "MAD fence) exactly") {
    import graft.ops.EventOps
    val d = TestSpark.sf0001
    val got = EventOps.seasonalAnomaly(spark, d).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val raw = graft.Tables.events(spark, d)
      .groupBy(date_trunc("day", col("ts")).as("day"),
        hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
    val dayMean = raw.groupBy(_._1).map { case (day, rs) =>
      day -> rs.map(_._3).sum.toDouble / rs.length
    }
    def d9(v: Double): BigDecimal =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val cells = raw.map { case (day, hod, c) =>
      (day, hod, c, d9(c - dayMean(day)))
    }
    val seas = cells.groupBy(_._2).map { case (hod, rs) =>
      hod -> rs.map(_._4).sum.toDouble / rs.length
    }
    val resid = cells.map { case (day, hod, c, r) =>
      (day, hod, c, r.toDouble - seas(hod))
    }
    def lowerMed(xs: Seq[Double]): Double = {
      val s0 = xs.sorted
      s0(math.max(1, (50 * s0.length + 99) / 100) - 1)
    }
    val med = lowerMed(resid.map(_._4).toSeq)
    val mad = lowerMed(resid.map(r => math.abs(r._4 - med)).toSeq)
    val want = resid.filter(r => math.abs(r._4 - med) > 4.4478 * mad)
      .sortBy(r => (r._1.getTime, r._2)).toSeq
    assert(got === want)
    assert(want.nonEmpty,
      "fixture should produce at least one seasonally-adjusted anomaly")
  }

  test("incrementalCC: a delta batch that bridges two base components, " +
      "opens a new one, and attaches a fresh node yields EXACTLY the " +
      "full-recompute summary — on the hand graph and on the fixture " +
      "trade graph") {
    import spark.implicits._
    import graft.ops.DedupOps
    val base = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val delta = Seq((2L, 3L), (5L, 6L), (7L, 1L)).toDF("a", "b")
    val inc = GraphOps.incrementalCC(base, delta).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(inc === Seq((1L, 5L), (5L, 2L)))
    // engine-side full recompute agrees
    val full = DedupOps.connectedComponents(
        base.unionByName(delta)
          .select(col("a").as("doc_a"), col("b").as("doc_b")))
      .groupBy(col("cluster_id").as("component_id"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy(col("n_members").desc, col("component_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(inc === full)
    // fixture: incremental fold equals the full trade-graph recompute
    val d = TestSpark.sf0001
    val gotInc = GraphOps.componentsIncremental(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val pairs = graft.Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(graft.Tables.lineitem(spark, d)
          .select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("doc_a"),
        (col("l_suppkey") * 2 + 1).as("doc_b")).distinct()
    val gotFull = DedupOps.connectedComponents(pairs)
      .groupBy(col("cluster_id").as("component_id"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy(col("n_members").desc, col("component_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotInc === gotFull)
  }

  test("dimTruncationAudit: truncating to the FULL dimension recovers " +
      "recall exactly 1.0 for every query (self-consistency), and the " +
      "16-dim audit matches a driver-side truncated-cosine recompute") {
    import graft.ops.SimilarityOps
    val d = TestSpark.sf0001
    val dim = graft.Tables.embeddings(spark, d)
      .select(size(col("embedding")).cast("long").as("n"))
      .groupBy().agg(max(col("n")).as("n")).collect()(0).getLong(0).toInt
    val fullSelf = SimilarityOps.dimTruncationAudit(spark, d, 5, dim)
      .collect()
    assert(fullSelf.nonEmpty)
    fullSelf.foreach { r =>
      assert(r.getLong(1) === 5L && r.getDouble(2) === 1.0)
    }
    // 16-dim audit vs driver recompute
    val got = SimilarityOps.dimTruncationAudit(spark, d, 5, 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val embs = graft.Tables.embeddings(spark, d)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cosD(a: Array[Float], b: Array[Float], n: Int): Double = {
      var dt = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        dt += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      BigDecimal(dt / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def top5(q: Long, n: Int): Set[Long] =
      embs.keys.filter(_ != q).toSeq
        .map(v => v -> cosD(embs(q), embs(v), n))
        .sortBy { case (v, cs) => (-cs, v) }.take(5).map(_._1).toSet
    got.foreach { case (q, hits, rec) =>
      val want = (top5(q, dim) & top5(q, 16)).size.toLong
      assert(hits === want, s"query $q")
      assert(rec === hits.toDouble / 5)
    }
  }

  test("anfFromEdges: on a 5-path with every node audited, the exact " +
      "ball-pair counts are 13/19/23 for r=1..3, n_sources is 5, and " +
      "the HLL estimate (exact regime at these cardinalities) sits " +
      "inside the bound") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val rows = GraphOps.anfFromEdges(und, 3, 1, 0.05).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(rows.toSeq === Seq((1L, 5L, 13L, true), (2L, 5L, 19L, true),
      (3L, 5L, 23L, true)))
  }

  test("equidepthHist: bucket heights differ by at most one, buckets " +
      "are contiguous with non-overlapping monotone bounds, and the " +
      "heights sum to the table row count") {
    import graft.ops.Relational
    val d = TestSpark.sf0001
    val rows = Relational.equidepthHist(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.map(_._1).toSeq === (1L to 10L))
    val heights = rows.map(_._2)
    assert(heights.max - heights.min <= 1L, "equi-depth property")
    assert(heights.sum === graft.Tables.orders(spark, d).count())
    rows.foreach { case (_, _, lo, hi) => assert(lo <= hi) }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3,
        s"bucket ${a._1} hi ${a._4} must not exceed bucket ${b._1} lo")
      case _ => ()
    }
  }

  test("zipfFit: slope and intercept equal a driver-side OLS recompute " +
      "over the same determinate ranks exactly, and the fixture slope " +
      "is negative (frequency falls with rank)") {
    import graft.ops.TextOps
    val d = TestSpark.sf0001
    val row = TextOps.zipfFit(spark, d).collect()(0)
    val ctf = graft.Tables.documents(spark, d)
      .select(explode(TextOps.tokens(lower(col("text")))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("ctf"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val ranked = ctf.sortBy { case (t, c) => (-c, t) }.zipWithIndex
      .map { case ((_, c), i) => (i + 1L, c) }
    def d9(v: Double): BigDecimal =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val n = ranked.length.toLong
    val sx = ranked.map(r => d9(math.log(r._1.toDouble))).sum.toDouble
    val sy = ranked.map(r => d9(math.log(r._2.toDouble))).sum.toDouble
    val sxy = ranked.map(r => d9(math.log(r._1.toDouble)
      * math.log(r._2.toDouble))).sum.toDouble
    val sxx = ranked.map(r => d9(math.log(r._1.toDouble)
      * math.log(r._1.toDouble))).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - slope * sx) / n
    assert(row.getLong(0) === n)
    assert(row.getDouble(1) === slope)
    assert(row.getDouble(2) === intercept)
    assert(slope < 0.0)
  }

  test("annRecallAudit: per-query n_hits equals the driver-side " +
      "intersection of the two REGISTERED operators' outputs, recall " +
      "= n_hits/k, and every query is present exactly once") {
    import graft.ops.SimilarityOps
    val d = TestSpark.sf0001
    val got = SimilarityOps.annRecallAudit(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val truth = SimilarityOps.bruteForceTopK(spark, d, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = SimilarityOps.ivfTopKSeeded(spark, d, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.map(_._1).toSeq === truth.keys.toSeq.sorted)
    got.foreach { case (q, hits, rec) =>
      val want = (truth(q) & approx.getOrElse(q, Set.empty)).size.toLong
      assert(hits === want, s"query $q")
      assert(rec === hits.toDouble / 5)
    }
  }

  test("assortativity: a star is perfectly disassortative (exactly -1), " +
      "and a triangle-plus-pendant matches the closed-form Pearson over " +
      "the directed edge list") {
    import spark.implicits._
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val rStar = GraphOps.assortativityFromEdges(star).collect()(0)
    assert(rStar.getLong(0) === 6L)
    assert(rStar.getDouble(1) === -1.0)
    val mixed = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)).toDF("a", "b")
    val rMix = GraphOps.assortativityFromEdges(mixed).collect()(0)
    assert(rMix.getLong(0) === 8L)
    // degs: 1->3, 2->2, 3->2, 4->1; closed form over 8 directed edges
    val (n, sx, sy, sxy, sxx, syy) =
      (8.0, 18.0, 18.0, 38.0, 44.0, 44.0)
    val want = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(rMix.getDouble(1) === want)
  }

  test("knScore: every doc's interpolated Kneser–Ney mean bigram " +
      "logprob matches an independent driver-side model recompute " +
      "exactly (counts, continuation counts, discount, decimal " +
      "rounding), and every smoothed p stays in (0, 1)") {
    import graft.ops.TextOps
    val d = TestSpark.sf0001
    val got = TextOps.knScore(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.nonEmpty)
    val toks = graft.Tables.documents(spark, d)
      .select(col("doc_id"), TextOps.tokens(lower(col("text"))).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq)
    // corpus model
    val cb = scala.collection.mutable
      .Map.empty[(String, String), Long].withDefaultValue(0L)
    toks.foreach { case (_, ts) =>
      ts.sliding(2).filter(_.length == 2)
        .foreach(w => cb((w(0), w(1))) += 1)
    }
    val cp = cb.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
    val n1p = cb.keys.groupBy(_._1).map { case (p, k) => p -> k.size }
    val n1c = cb.keys.groupBy(_._2).map { case (c, k) => c -> k.size }
    val ntypes = cb.size
    def pKn(prev: String, cur: String): Double =
      (cb((prev, cur)) - 0.75) / cp(prev) +
        (0.75 * n1p(prev) / cp(prev)) *
          (n1c(cur).toDouble / ntypes)
    val want = toks.filter(_._2.length >= 2).map { case (id, ts) =>
      // per-doc (prev, cur) tf first — the engine rounds tf·ln(p) ONCE
      // per group, not once per position
      val tf = scala.collection.mutable
        .Map.empty[(String, String), Long].withDefaultValue(0L)
      ts.sliding(2).filter(_.length == 2)
        .foreach(w => tf((w(0), w(1))) += 1)
      val lpSum = tf.toSeq.map { case ((p0, c0), t) =>
        val p = pKn(p0, c0)
        assert(p > 0.0 && p < 1.0, s"p($p0, $c0) = $p out of (0, 1)")
        BigDecimal(t * math.log(p))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.foldLeft(BigDecimal(0))(_ + _)
      val n = ts.length - 1L
      id -> (n, lpSum.toDouble / n)
    }.toMap
    assert(got === want,
      "KN scores must equal the independent model recompute exactly")
  }

  test("seasonalProfile: every hour-of-day row matches an independent " +
      "driver-side decomposition exactly, and the n_days-weighted " +
      "seasonal components cancel (day residuals sum to zero before " +
      "rounding)") {
    import graft.ops.EventOps
    val d = TestSpark.sf0001
    val got = EventOps.seasonalProfile(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.nonEmpty &&
      got.map(_._1).toSeq == got.map(_._1).sorted.toSeq)
    // driver-side recompute from the raw (day, hod) counts
    val raw = graft.Tables.events(spark, d)
      .groupBy(date_trunc("day", col("ts")).as("day"),
        hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
    val byDay = raw.groupBy(_._1)
    val dayMean = byDay.map { case (day, rows) =>
      day -> rows.map(_._3).sum.toDouble / rows.length
    }
    val byHod = raw.groupBy(_._2)
    val want = byHod.map { case (hod, rows) =>
      val rs = rows.map { case (day, _, c) =>
        BigDecimal(c - dayMean(day))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }
      (hod, rows.length.toLong, rows.map(_._3).sum,
        rs.sum.toDouble / rows.length)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq === want)
    // weighted seasonal components cancel up to the 1e-9 rounding grain
    val weighted = got.map { case (_, nd, _, s0) => nd * s0 }.sum
    assert(math.abs(weighted) < 1e-6,
      s"weighted seasonal sum $weighted should be ~0")
  }

  test("components: summary matches an independent driver-side " +
      "union-find over the same thresholded edge set (sizes AND min-id " +
      "component labels), and member counts sum to the node count") {
    val d = TestSpark.sf0001
    val edges = GraphOps.coPurchaseEdges(spark, d)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.toSeq.groupBy(find).map { case (c, ms) =>
      c -> ms.length.toLong
    }
    val got = GraphOps.components(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(got.toMap === want)
    assert(got.map(_._2).sum === parent.keys.size.toLong)
    // presentation order: size desc, then component id
    assert(got.toSeq === got.toSeq.sortBy { case (c, n) => (-n, c) })
  }

  test("kcore: K4 + pendant tail peels the tail one node per round and " +
      "keeps exactly the K4 at degree 3; a cycle has no 3-core; the " +
      "fixture output equals an independent driver-side peel") {
    import spark.implicits._
    import graft.ops.GraphOps
    def und(pairs: (Long, Long)*) = pairs.toDF("a", "b")
    // K4 on {1,2,3,4} with tail 4-5-6-7-8: peel cascades down the tail
    // (one node per round — exercises the multi-round determinate peel)
    val k4tail = GraphOps.kcoreFromEdges(
      und((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
        (4L, 5L), (5L, 6L), (6L, 7L), (7L, 8L)),
      k = 3, maxRounds = 16).collect()
    assert(k4tail.map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // 6-cycle: all degrees 2 — 3-core is empty
    assert(GraphOps.kcoreFromEdges(
      und((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 1L)),
      k = 3, maxRounds = 16).count() === 0)
    // fixture: independent driver-side simultaneous peel
    val d = TestSpark.sf0001
    var e = GraphOps.coPurchaseEdges(spark, d)
      .select("a", "b").collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)),
        (r.getLong(1), r.getLong(0)))).toSet
    var rounds = 0
    var done = false
    while (!done && rounds < 16) {
      val deg = e.groupBy(_._1).map { case (n, es) => n -> es.size }
      val keep = deg.filter(_._2 >= 3).keySet
      val e2 = e.filter { case (s2, d2) => keep(s2) && keep(d2) }
      done = e2.size == e.size
      e = e2
      rounds += 1
    }
    val want = e.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val got = GraphOps.kcore(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(got.toMap === want)
    assert(got.map(_._1).toSeq === got.map(_._1).toSeq.sorted)
  }

  test("adamicAdar: 4-cycle diagonals score exactly 2·round9(1/ln 2), " +
      "adjacent pairs never appear, and a hub beyond maxHub contributes " +
      "no wedges") {
    import spark.implicits._
    import graft.ops.GraphOps
    def und(pairs: (Long, Long)*) = pairs.toDF("a", "b")
    // cycle 1-2-3-4: non-adjacent diagonals (1,3), (2,4); both endpoints
    // share two degree-2 neighbors
    val cyc = GraphOps.adamicAdarFromEdges(
      und((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)), maxHub = 64,
      topK = 10).collect()
    val per = BigDecimal(1.0 / math.log(2.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val wantScore = (per * 2).toDouble
    assert(cyc.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 3L), (2L, 4L)))
    cyc.foreach { r =>
      assert(r.getLong(2) === 2L)
      assert(r.getDouble(3) === wantScore)
    }
    // hub guard: star hub has degree 4 > maxHub=3 — no wedge centers
    assert(GraphOps.adamicAdarFromEdges(
      und((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L)), maxHub = 3,
      topK = 10).count() === 0)
    // fixture: u < v everywhere, no emitted pair is a known edge
    val d = TestSpark.sf0001
    val rows = GraphOps.adamicAdar(spark, d).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    val known = GraphOps.coPurchaseEdges(spark, d)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val p = (r.getLong(0), r.getLong(1))
      assert(p._1 < p._2)
      assert(!known(p), s"emitted pair $p is an existing edge")
    }
  }

  test("hopHistogram: BFS layers on a path, two frontiers meeting in " +
      "the middle, the maxHops cap truncates, disconnected nodes never " +
      "appear, and the fixture matches a driver-side BFS recount") {
    import spark.implicits._
    import graft.ops.GraphOps
    def und(pairs: (Long, Long)*) = {
      val p = pairs.toSeq
      (p ++ p.map(_.swap)).toDF("src", "dst")
    }
    def seedsOf(ns: Long*) = ns.toDF("node")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
    // path 0-1-2-3 (alternating parity), seed 0: one node per layer
    val path = und((0L, 1L), (1L, 2L), (2L, 3L))
    assert(rows(GraphOps.hopHistogramFromEdges(path, seedsOf(0L), 20)) ===
      Seq((0L, 1L, 0L), (1L, 0L, 1L), (2L, 1L, 0L), (3L, 0L, 1L)))
    // seeds at both ends of 0-1-2-3-4: frontiers meet at 2
    val path5 = und((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    assert(rows(GraphOps.hopHistogramFromEdges(path5, seedsOf(0L, 4L),
      20)) === Seq((0L, 2L, 0L), (1L, 0L, 2L), (2L, 1L, 0L)))
    // cap truncates: only layers 0..2 survive maxHops = 2; the isolated
    // edge 10-11 is unreachable and never appears
    assert(rows(GraphOps.hopHistogramFromEdges(
      und((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)),
      seedsOf(0L), 2)) ===
      Seq((0L, 1L, 0L), (1L, 0L, 1L), (2L, 1L, 0L)))
    // fixture: independent driver-side BFS over collected trade edges
    val d = TestSpark.sf0001
    val tp = graft.Tables.orders(spark, d)
      .select("o_orderkey", "o_custkey")
      .join(graft.Tables.lineitem(spark, d)
          .select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"),
        (col("l_suppkey") * 2 + 1).as("sp"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.Set[Long]]
    def link(a: Long, b: Long): Unit =
      adj.getOrElseUpdate(a,
        scala.collection.mutable.Set.empty[Long]) += b
    tp.foreach { case (c, sp) => link(c, sp); link(sp, c) }
    val seeds = graft.Tables.customer(spark, d)
      .join(graft.Tables.nation(spark, d)
          .filter(col("n_name") === "NATION_0"),
        col("c_nationkey") === col("n_nationkey"))
      .select((col("c_custkey") * 2).as("node"))
      .collect().map(_.getLong(0)).filter(adj.contains).toSet
    val distM = scala.collection.mutable.Map.empty[Long, Long]
    seeds.foreach(distM(_) = 0L)
    var frontier = seeds
    var hop = 1L
    while (frontier.nonEmpty && hop <= 20) {
      val next = frontier.flatMap(adj(_)).filterNot(distM.contains)
      next.foreach(distM(_) = hop)
      frontier = next
      hop += 1
    }
    val want = distM.toSeq.groupBy(_._2).toSeq.sortBy(_._1).map {
      case (dd, ns) =>
        (dd, ns.count(_._1 % 2 == 0).toLong,
          ns.count(_._1 % 2 == 1).toLong)
    }
    assert(rows(GraphOps.hopHistogram(spark, d)) === want)
  }

  test("butterflies: K2,2 is one butterfly crediting all four nodes " +
      "once; K2,3 yields three with suppliers at 2 and customers at 3; " +
      "stars and paths have none; fixture matches a driver-side recount") {
    import spark.implicits._
    import graft.ops.GraphOps
    def bip(pairs: (Long, Long)*) = pairs.toDF("c", "sp")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
        .toMap
    // K2,2: one 2×2 biclique
    assert(asMap(GraphOps.butterfliesFromEdges(
      bip((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)), topK = 10)) ===
      Map((2L, "customer") -> 1L, (4L, "customer") -> 1L,
        (3L, "supplier") -> 1L, (5L, "supplier") -> 1L))
    // K2,3: C(3,2) supplier pairs, one butterfly each
    assert(asMap(GraphOps.butterfliesFromEdges(
      bip((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L), (2L, 3L)),
      topK = 10)) ===
      Map((2L, "customer") -> 3L, (4L, "customer") -> 3L,
        (3L, "supplier") -> 2L, (5L, "supplier") -> 2L,
        (7L, "supplier") -> 2L))
    // star (one customer) and path: no 2×2 closure
    assert(GraphOps.butterfliesFromEdges(
      bip((1L, 1L), (1L, 2L), (1L, 3L)), topK = 10).count() === 0)
    assert(GraphOps.butterfliesFromEdges(
      bip((1L, 1L), (2L, 1L), (2L, 2L)), topK = 10).count() === 0)
    // fixture: independent driver-side recount of the full top-20
    val d = TestSpark.sf0001
    val tp = graft.Tables.orders(spark, d)
      .select("o_orderkey", "o_custkey")
      .join(graft.Tables.lineitem(spark, d)
          .select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"),
        col("o_orderkey").as("o"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val edges = tp.groupBy(t => (t._1, t._2))
      .filter(_._2.map(_._3).distinct.length >= 2).keys.toSeq
    val bySupPair = edges.groupBy(_._1)
      .values.flatMap { es =>
        val sps = es.map(_._2).sorted
        for (i <- sps.indices; j <- (i + 1) until sps.length)
          yield ((sps(i), sps(j)), es.head._1)
      }.toSeq.groupBy(_._1)
    val credit = scala.collection.mutable.Map.empty[(Long, String), Long]
      .withDefaultValue(0L)
    bySupPair.foreach { case ((s1, s2), cs) =>
      val w = cs.length.toLong
      if (w >= 2) {
        credit((s1 * 2 + 1, "supplier")) += w * (w - 1) / 2
        credit((s2 * 2 + 1, "supplier")) += w * (w - 1) / 2
        cs.foreach { case (_, c) => credit((c * 2, "customer")) += w - 1 }
      }
    }
    val wantTop = credit.toSeq
      .sortBy { case ((n, _), b) => (-b, n) }.take(20)
      .map { case ((n, k), b) => (n, k, b) }
    val got = GraphOps.butterflies(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === wantTop)
  }

  test("mmrRerank: every query's 5-pick slate (ids, ranks, AND scores) " +
      "equals an independent driver-side greedy MMR over independently " +
      "recomputed rounded cosines; pick 1 is the relevance argmax") {
    import graft.ops.SimilarityOps
    val d = TestSpark.sf0001
    val got = SimilarityOps.mmrRerank(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.nonEmpty)
    // independent recompute: embeddings -> rounded cosines -> greedy
    val embs = graft.Tables.embeddings(spark, d)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dotS = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dotS += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      BigDecimal(dotS / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = embs.keys.filter(_ < 10L).toSeq.sorted.flatMap { q =>
      val cand = embs.keys.filter(_ != q).toSeq
        .map(v => v -> cos(embs(q), embs(v)))
        .sortBy { case (v, rel) => (-rel, v) }.take(10)
      val sel = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Double, Double)]
      val rel = cand.toMap
      var remaining = cand.map(_._1)
      for (rank <- 1 to 5) {
        val scoredC = remaining.map { v =>
          val ms =
            if (sel.isEmpty) 0.0
            else sel.map(s => cos(embs(v), embs(s._3))).max
          v -> (0.7 * rel(v) - 0.3 * ms)
        }
        val (pick, mmr) = scoredC.minBy { case (v, m) => (-m, v) }
        sel += ((q, rank.toLong, pick, rel(pick), mmr))
        remaining = remaining.filterNot(_ == pick)
      }
      sel
    }
    assert(got.toSeq === want,
      "greedy MMR slate must match the independent recompute exactly")
  }

  test("labelPropagation: two triangles bridged by one edge settle into " +
      "two size-3 communities in 4 synchronous rounds (tie-break toward " +
      "the smaller label); modularity matches the hand-computed " +
      "Newman–Girvan Q with the decimal(24,9) term rounding") {
    import spark.implicits._
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
        (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
      .toDF("a", "b")
    val lab = GraphOps.lpaLabels(und, 4)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(lab === Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 3L), (5L, 3L), (6L, 3L)))
    // histogram face over the same frame
    val hist = GraphOps.lpaLabels(und, 4)
      .groupBy("lab").agg(count(lit(1)).as("community_size"))
      .groupBy("community_size").agg(count(lit(1)).as("n_communities"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hist === Seq((3L, 2L)))
    // modularity: m = 7, both communities mc = 3, dc = 7
    val q = GraphOps.modularityFromEdges(und, 4).collect()(0)
    assert(q.getLong(q.fieldIndex("n_communities")) === 2L)
    assert(q.getLong(q.fieldIndex("m_edges")) === 7L)
    val term = java.math.BigDecimal.valueOf(
        3.0 / 7 - (7.0 / 14) * (7.0 / 14))
      .setScale(9, java.math.RoundingMode.HALF_UP)
    assert(q.getDouble(q.fieldIndex("modularity"))
      === term.add(term).doubleValue)
  }

  test("lpaRound is determinate: a perfectly symmetric 4-cycle keeps " +
      "oscillating under synchronous updates, but identically on every " +
      "invocation (the shared-cap engine/oracle agreement argument)") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val a = GraphOps.lpaLabels(und, 3).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = GraphOps.lpaLabels(und, 3).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a === b)
    // and one more round CHANGES it (the oscillation is real — the cap
    // is what pins both engines to the same snapshot)
    val c = GraphOps.lpaLabels(und, 4).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a !== c)
  }
}
