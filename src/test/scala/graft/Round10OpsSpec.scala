package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventOps

/** Round-10 operators. */
class Round10OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("dauWauMauSketch: audited days' exact columns equal dauWauMau's " +
      "exact counts, every bound flag is TRUE (HLL is near-exact at " +
      "fixture cardinalities), unaudited days carry NULLs, and the day " +
      "set equals the exact form's") {
    val d = TestSpark.sf0001
    val exact = EventOps.dauWauMau(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val sk = EventOps.dauWauMauSketch(spark, d).collect()
    assert(sk.map(_.getLong(0)).toSet === exact.keySet,
      "sketch surface must cover exactly the observed days")
    var audited = 0
    sk.foreach { r =>
      val day = r.getLong(0)
      if (day % 3 == 0) {
        audited += 1
        assert((r.getLong(1), r.getLong(2), r.getLong(3)) === exact(day),
          s"audited day $day exact mismatch")
        assert(r.getBoolean(4) && r.getBoolean(5) && r.getBoolean(6),
          s"bound flag false on day $day")
      } else {
        (1 to 6).foreach(i => assert(r.isNullAt(i),
          s"unaudited day $day must carry NULLs (col $i)"))
      }
    }
    assert(audited > 0, "fixture must contain at least one audited day")
  }

  test("powerlawFitFromEdges on a hand star S4: exact two-point fit " +
      "(slope = -ln5/ln4, intercept = ln5)") {
    import spark.implicits._
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("a", "b")
    val r = graft.ops.GraphOps.powerlawFitFromEdges(star).collect()(0)
    assert(r.getLong(0) === 2L) // degree grid {1, 4}
    // 1e-8 tolerance: each OLS factor is quantized onto DECIMAL(24,9)
    assert(math.abs(r.getDouble(1) - (-math.log(5) / math.log(4))) < 1e-8)
    assert(math.abs(r.getDouble(2) - math.log(5)) < 1e-8)
  }

  test("interarrival ≡ driver-side replay (sorted per-(type,user) " +
      "timestamp diffs, ceil-rank quantiles) on sf0.001") {
    val d = TestSpark.sf0001
    val got = EventOps.interarrival(spark, d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val ev = Tables.events(spark, d)
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts)").as("us")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val gaps = ev.groupBy(e => (e._1, e._2)).toSeq.flatMap { case ((t, _), es) =>
      val s = es.map(_._3).sorted
      s.zip(s.drop(1)).map { case (a, b) => t -> (b - a) }
    }
    val want = gaps.groupBy(_._1).map { case (t, g) =>
      val xs = g.map(_._2).sorted
      def q(pct: Int) = xs(math.max(1, (pct * xs.size + 99) / 100) - 1)
      t -> (xs.size.toLong, q(50).toDouble / 1e6, q(90).toDouble / 1e6)
    }
    assert(got === want)
  }

  test("jsDivergence: symmetric-bounded (0 ≤ jsd ≤ ln 2), all lang " +
      "pairs present, and zero iff distributions identical (fixture " +
      "langs differ, so strictly positive)") {
    val rows = graft.ops.TextOps.jsDivergence(spark, TestSpark.sf0001)
      .collect()
    val langs = Tables.documents(spark, TestSpark.sf0001)
      .select("lang").distinct().count()
    assert(rows.length === (langs * (langs - 1) / 2).toInt)
    rows.foreach { r =>
      val j = r.getDouble(3)
      assert(j > 0 && j <= math.log(2) + 1e-9,
        s"jsd out of range for ${r.getString(0)}/${r.getString(1)}: $j")
    }
  }

  test("readability ≡ driver-side Flesch replay on a sample of docs") {
    val d = TestSpark.sf0001
    val got = graft.ops.TextOps.readability(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5))).toMap
    val docs = Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).take(50)
    docs.foreach { case (id, text) =>
      val ws = text.trim match {
        case "" => Array.empty[String]
        case tt => tt.split("\\s+")
      }
      if (ws.nonEmpty) {
        val words = ws.length.toLong
        val sentences = math.max(1,
          "[.!?]+".r.findAllIn(text).length).toLong
        val syl = ws.map(w =>
          "[aeiouy]+".r.findAllIn(w.toLowerCase).length).sum.toLong
        val flesch = 206.835 - 1.015 * (words.toDouble / sentences) -
          84.6 * (syl.toDouble / words)
        val (gw, gs, gy, gf) = got(id)
        assert((gw, gs, gy) === ((words, sentences, syl)), s"doc $id")
        assert(math.abs(gf - flesch) < 1e-9, s"doc $id flesch")
      }
    }
  }

  test("churnWeekly + newVsReturning invariants: churned ≤ active, new " +
      "+ returning = active, week-0 actives are all new") {
    val d = TestSpark.sf0001
    val nr = EventOps.newVsReturning(spark, d).collect()
    nr.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) === r.getLong(1))
    }
    assert(nr.head.getLong(1) === nr.head.getLong(2),
      "every first-day active user is new by definition")
    val ch = EventOps.churnWeekly(spark, d).collect()
    assert(ch.nonEmpty)
    ch.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("streaks ≡ driver-side gaps-and-islands replay on sf0.001, and " +
      "total streak-days reconcile with the distinct (user, day) count") {
    val d = TestSpark.sf0001
    val got = EventOps.streaks(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ud = Tables.events(spark, d)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val streaks = ud.groupBy(_._1).toSeq.flatMap { case (u, ds) =>
      val days = ds.map(_._2).sorted
      days.zipWithIndex.map { case (day, i) => day - i }
        .groupBy(identity).toSeq
        .map { case (_, g) => u -> g.size.toLong }
    }
    val want = streaks.groupBy(_._2).map { case (len, g) =>
      len -> (g.size.toLong, g.map(_._1).distinct.size.toLong)
    }
    assert(got === want)
    val totalDays = got.map { case (len, (n, _)) => len * n }.sum
    assert(totalDays === ud.length.toLong,
      "every distinct active day belongs to exactly one streak")
  }

  test("vocabCoverage: monotone non-decreasing in N, bounded by 1, " +
      "covered(10000) = total when vocab < 10000 (sf0.001 fixture)") {
    val rows = graft.ops.TextOps.vocabCoverage(spark, TestSpark.sf0001)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(100L, 1000L, 10000L))
    val cov = rows.map(_.getDouble(3))
    assert(cov.zip(cov.drop(1)).forall { case (a, b) => a <= b })
    assert(cov.forall(c => c > 0 && c <= 1.0))
  }

  test("normProfile ≡ driver-side integer-nanos replay on sf0.001") {
    val d = TestSpark.sf0001
    val r = graft.ops.SimilarityOps.normProfile(spark, d).collect()(0)
    val vecs = Tables.embeddings(spark, d).select("embedding").collect()
      .map(_.getSeq[Float](0))
    val norms = vecs.map(v => math.sqrt(
      v.map(x => math.floor(x.toDouble * x.toDouble * 1e9).toLong)
        .sum.toDouble / 1e9)).sorted
    def q(pct: Int) =
      norms(math.max(1, (pct * norms.length + 99) / 100) - 1)
    assert(r.getLong(0) === norms.length.toLong)
    assert(r.getDouble(1) === norms.head)
    assert(r.getDouble(2) === q(25))
    assert(r.getDouble(3) === q(50))
    assert(r.getDouble(4) === q(75))
    assert(r.getDouble(5) === norms.last)
  }

  test("componentSizes reconciles with components: Σ(size·n_components) " +
      "= total labeled nodes and Σ n_components = total components") {
    val d = TestSpark.sf0001
    val comp = graft.ops.GraphOps.components(spark, d).collect()
    val sizes = graft.ops.GraphOps.componentSizes(spark, d).collect()
    assert(sizes.map(_.getLong(1)).sum === comp.length.toLong)
    assert(sizes.map(_.getLong(2)).sum === comp.map(_.getLong(1)).sum)
  }

  test("components and componentSizes serve from the STORED labels " +
      "artifact (one CC fixpoint per dataset, consumers read the " +
      "label table)") {
    Seq(graft.ops.GraphOps.components(spark, TestSpark.sf0001),
        graft.ops.GraphOps.componentSizes(spark, TestSpark.sf0001))
      .foreach { df =>
        val scans = df.queryExecution.executedPlan.collectLeaves()
          .map(_.toString).mkString("\n")
        assert(scans.contains("graft_graph_labels"),
          s"no stored-labels scan in:\n$scans")
      }
  }

  test("componentsIncremental serves its BASE labels from the stored " +
      "trade-labels artifact — per call the work is the delta fold, " +
      "not the base fixpoint") {
    val df = graft.ops.GraphOps
      .componentsIncremental(spark, TestSpark.sf0001)
    val scans = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scans.contains("graft_trade_labels"),
      s"no stored base-labels scan in:\n$scans")
  }

  test("percentileCont ≡ driver-side linear interpolation at h = (n-1)p " +
      "per type on sf0.001") {
    val d = TestSpark.sf0001
    val got = EventOps.percentileCont(spark, d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val ev = Tables.events(spark, d)
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    val want = ev.groupBy(_._1).map { case (t, vs) =>
      val xs = vs.map(_._2).sorted
      def q(p: Double) = {
        val h = (xs.length - 1) * p
        val lo = h.toInt
        if (lo + 1 < xs.length) xs(lo) + (h - lo) * (xs(lo + 1) - xs(lo))
        else xs(lo)
      }
      t -> (xs.length.toLong, q(0.25), q(0.5), q(0.9))
    }
    got.foreach { case (t, (n, a, b, c)) =>
      val (wn, wa, wb, wc) = want(t)
      assert(n === wn, t)
      assert(math.abs(a - wa) < 1e-9 && math.abs(b - wb) < 1e-9 &&
        math.abs(c - wc) < 1e-9, s"$t: ($a,$b,$c) vs ($wa,$wb,$wc)")
    }
  }

  test("userEntropy: buckets cover [0, ln|types|·64], user counts " +
      "reconcile with the distinct-user total, single-type users land " +
      "in bucket 0") {
    val d = TestSpark.sf0001
    val rows = EventOps.userEntropy(spark, d).collect()
    val nUsers = Tables.events(spark, d)
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum === nUsers)
    val maxBucket = (math.log(5) * 64).toLong
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= maxBucket)
      assert(r.getDouble(2) >= 0 && r.getDouble(2) <= math.log(5) + 1e-9)
    }
  }

  test("mattr: equals plain TTR for docs at or under the window, sits " +
      "in (0, 1], and equals a driver-side replay on a sample") {
    val d = TestSpark.sf0001
    val got = graft.ops.TextOps.mattr(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    got.values.foreach { case (_, m) => assert(m > 0 && m <= 1.0) }
    val docs = Tables.documents(spark, d).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).take(40)
    docs.foreach { case (id, text) =>
      val ws = if (text.trim.isEmpty) Array.empty[String]
        else text.trim.toLowerCase.split("\\s+")
      if (ws.nonEmpty) {
        val n = ws.length
        val expect =
          if (n <= 50) ws.distinct.length.toDouble / n
          else (0 to n - 50).map(i =>
            ws.slice(i, i + 50).distinct.length.toLong).sum.toDouble /
            (50L * (n - 50 + 1))
        val (gn, gm) = got(id)
        assert(gn === n.toLong, s"doc $id token count")
        assert(math.abs(gm - expect) < 1e-12, s"doc $id mattr")
      }
    }
  }

  test("EmbPipeline: stage counts reconcile with the STAGED parquet, " +
      "are monotone non-increasing, and the export is 1:1 with the " +
      "sample (int8 rows carry the quantized array)") {
    val d = TestSpark.sf0001
    val dir = java.nio.file.Files
      .createTempDirectory("emb_pipe").toString
    val c = EmbPipeline.run(spark, d, dir)
    assert(c.total >= c.valid && c.valid >= c.survivors &&
      c.survivors >= c.sample && c.sample === c.exported)
    Seq("valid" -> c.valid, "survivors" -> c.survivors,
        "sample" -> c.sample, "export_int8" -> c.exported)
      .foreach { case (st, n) =>
        assert(spark.read.parquet(s"$dir/$st").count() === n,
          s"stage $st recount")
      }
    // the export really is the quantized representation
    val q = spark.read.parquet(s"$dir/export_int8")
    assert(q.columns.toSeq === Seq("vec_id", "q8"))
    val row = q.orderBy("vec_id").select("q8").collect()(0)
      .getSeq[Int](0)
    assert(row.forall(v => v >= -127 && v <= 127))
    assert(row.exists(_ != 0))
  }

  test("EmbPipeline.stagePlanFrames (the in-memory plan-audit face) " +
      "produces the same counts as the staged run — the two faces " +
      "cannot drift") {
    val d = TestSpark.sf0001
    val dir = java.nio.file.Files
      .createTempDirectory("emb_pipe_faces").toString
    val c = EmbPipeline.run(spark, d, dir)
    val frames = EmbPipeline.stagePlanFrames(spark, d).toMap
    assert(frames("2_valid").count() === c.valid)
    assert(frames("3_semdedup").count() === c.survivors)
    assert(frames("4_sample").count() === c.sample)
    assert(frames("5_export_int8").count() === c.exported)
  }

  test("Sinks.namespaced: deterministic per path, distinct for " +
      "distinct dataset paths sharing a basename (the staging-" +
      "collision contract every artifact dir rides on)") {
    import graft.sources.Sinks.namespaced
    val a = namespaced("/tmp/x/sf0.01", "/data/a/sf0.01")
    assert(a === namespaced("/tmp/x/sf0.01", "/data/a/sf0.01"))
    assert(a !== namespaced("/tmp/x/sf0.01", "/data/b/sf0.01"))
    assert(a.startsWith("/tmp/x/sf0.01_"))
  }

  test("dauWauMauSketch estimates come from the SHARED hourly partials " +
      "artifact (build-once/serve-many), not a private fact re-scan: " +
      "plan reads the staged parquet") {
    val df = EventOps.dauWauMauSketch(spark, TestSpark.sf0001)
    val scans = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scans.contains("graft_sketch_stages"),
      s"no staged-partials scan in:\n$scans")
  }
}
