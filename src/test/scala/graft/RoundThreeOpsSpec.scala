package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{EventOps, Relational, SimilarityOps, TextOps}

/** Specs for the round-3 operator additions: keyed merge (MERGE INTO),
  * int8-quantized ANN, calibrated quality gates, temperature mixture
  * sampling, and incremental aggregate maintenance. Value-level parity is
  * the DuckDB oracle gate; these cover the algebraic invariants.
  */
class RoundThreeOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._
  private val d = TestSpark.sf001

  // ------------------------------------------------- native sessionize

  test("sessionizeNative: exact-micros gap boundary — exactly 30:00 after " +
      "the last event still merges (touching windows), +1µs splits; " +
      "end = last + gap") {
    import java.sql.Timestamp
    val base = 1700000000000000L // micros
    def ts(deltaMicros: Long): Timestamp = {
      val t = new Timestamp((base + deltaMicros) / 1000)
      t.setNanos((((base + deltaMicros) % 1000000) * 1000).toInt)
      t
    }
    val gap = 30L * 60 * 1000000
    val ev = Seq(
      (7L, ts(0)),                // session 1 start
      (7L, ts(gap)),              // exactly 30:00 later -> merges (touching)
      (7L, ts(2 * gap + 1)),      // 30:00.000001 after prev -> splits
    ).toDF("user_id", "ts")
    val out = graft.ops.EventOps.sessionizeNativeFrom(ev).collect()
    assert(out.length == 2, out.mkString("; "))
    assert(out(0).getLong(3) == 2 && out(1).getLong(3) == 1)
    // session_end is the gap-extended bound: last event ts + 30 min
    assert(out(0).getTimestamp(2) === ts(gap + gap))
    assert(out(1).getTimestamp(2) === ts(2 * gap + 1 + gap))
  }

  // ------------------------------------------------------------- merge

  test("mergeUpsert: updates win on collision, inserts append, " +
      "untouched rows pass through unchanged") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "tag", "v")
    val updates = Seq((2L, "B", 99.0), (9L, "new", 1.0)).toDF("k", "tag", "v")
    val out = Relational.mergeUpsert(base, updates, Seq("k"))
      .orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 9L))
    val byKey = out.map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    assert(byKey(2L) == ("B", 99.0), "update must replace the base row")
    assert(byKey(9L) == ("new", 1.0), "unmatched update must insert")
    assert(byKey(1L) == ("a", 10.0) && byKey(3L) == ("c", 30.0))
  }

  test("sessionOverlapWindows: exactly the top-5 windows surface; " +
      "every window's session count bounds its user count") {
    val out = EventOps.sessionOverlapWindows(spark, d).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2) && r.getLong(2) > 0,
        s"n_sessions >= n_users > 0 violated: $r")
    }
    // windows are distinct and ordered
    val ws = out.map(_.getTimestamp(0))
    assert(ws.distinct.length == 5 && ws.sorted.toSeq == ws.toSeq)
  }

  test("skewProfile: planted hot key is flagged heavy with exact ppm " +
      "share; uniform keys are not") {
    // key 1: 60 rows; keys 2..11: 4 rows each -> total 100, 11 keys.
    // mean ≈ 9.09; heavy iff n·11 > 200 -> only key 1 (660 > 200).
    val df = (Seq.fill(60)(1L) ++ (2L to 11L).flatMap(Seq.fill(4)(_)))
      .toDF("k")
    val rows = Relational.skewProfile(df, "k", topK = 11).collect()
    assert(rows.head.getLong(0) == 1L && rows.head.getLong(1) == 60L)
    assert(rows.head.getLong(2) == 600000L) // 60·1e6 div 100
    assert(rows.head.getBoolean(3), "hot key must be flagged heavy")
    assert(rows.tail.forall(!_.getBoolean(3)), "uniform keys must not")
    assert(rows.tail.forall(_.getLong(2) == 40000L))
  }

  test("incrementalJoin: maintained join ≡ full recompute (delta terms " +
      "cover every pair exactly once)") {
    val l = Seq((1L, "h1"), (2L, "h2"), (3L, "n1"), (3L, "n2"))
      .toDF("k", "lv")
    val r = Seq((1L, "H"), (3L, "H3"), (2L, "N"), (3L, "N3")).toDF("k", "rv")
    val histL = l.filter(!col("lv").startsWith("n"))
    val newL = l.filter(col("lv").startsWith("n"))
    val histR = r.filter(!col("rv").startsWith("N"))
    val newR = r.filter(col("rv").startsWith("N"))
    val maintained = Relational.incrementalJoin(
      histL.join(histR, Seq("k")), histL, histR, newL, newR, Seq("k"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getString(2)))
    val full = l.join(r, Seq("k")).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2)))
    assert(maintained.sorted.toSeq === full.sorted.toSeq,
      "maintained join must equal the full recompute, duplicates included")
  }

  test("tableDiff: all four classes, null-safe column compare " +
      "(null == null is 'same', null vs value is 'update')") {
    val base = Seq(
      (1L, Option("a")), (2L, Option("b")), (3L, None),
      (4L, Option("d")), (5L, None),
    ).toDF("k", "v")
    val revised = Seq(
      (1L, Option("a")),  // same
      (2L, Option("B")),  // update
      (3L, None),         // same (null <=> null)
      (5L, Option("e")),  // update (null -> value)
      (9L, Option("z")),  // insert; 4 deleted
    ).toDF("k", "v")
    val diff = Relational.tableDiff(base, revised, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(diff === Map(1L -> "same", 2L -> "update", 3L -> "same",
      4L -> "delete", 5L -> "update", 9L -> "insert"))
  }

  test("orderDiff: classes reconcile against the merge fixture — " +
      "deletes are the %7 slice, inserts the shifted keys") {
    val out = Relational.orderDiff(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet === Set("insert", "delete", "update", "same"))
    val base = Tables.orders(spark, d).count()
    // every base key is same/update/delete; inserts are extra
    assert(out("same") + out("update") + out("delete") == base)
    val deleted = Tables.orders(spark, d)
      .filter(col("o_orderkey") % 7 === 3).count()
    assert(out("delete") == deleted)
  }

  test("mergeOrders: row count = base + inserts; merged keys unique") {
    val base = Tables.orders(spark, d).count()
    val inserts = Tables.orders(spark, d)
      .filter(col("o_orderkey") % 1000 === 1).count()
    val merged = Relational.mergeOrders(spark, d)
    assert(merged.count() == base + inserts)
    assert(merged.select("o_orderkey").distinct().count() == base + inserts,
      "merge on key must never produce duplicate keys")
  }

  // -------------------------------------------------------------- int8

  test("quantizeInt8: range bounded to [-127,127], max element hits ±127, " +
      "zero vector quantizes to zeros") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)), // max |x| = 1.0 -> scale 1/127
      (2L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("id", "v").select(col("id"),
      SimilarityOps.quantizeInt8(col("v")).as("q"))
    val rows = df.orderBy("id").collect()
      .map(_.getSeq[Long](1).toSeq)
    assert(rows(0) == Seq(64L, -127L, 32L),
      s"expected floor(x*127/max + 0.5), got ${rows(0)}")
    assert(rows(1) == Seq(0L, 0L, 0L))
  }

  test("compiled QuantizeInt8 equals the HOF spec twin, including NULL " +
      "elements, zero, empty, and NULL vectors") {
    val rnd = new scala.util.Random(7)
    val rows: Seq[(Long, Array[java.lang.Float])] =
      (0L until 200L).map { i =>
        val n = rnd.nextInt(9) // 0..8, exercises empty
        val arr = Array.fill[java.lang.Float](n) {
          if (rnd.nextInt(20) == 0) null
          else java.lang.Float.valueOf((rnd.nextFloat() - 0.5f) * 10f)
        }
        (i, arr)
      } :+ ((200L, null: Array[java.lang.Float])) :+
        ((201L, Array[java.lang.Float](0f, 0f, 0f)))
    val df = rows.toDF("id", "v")
    val both = df.select(col("id"),
      graft.functions.QuantizeInt8.quantizeInt8Compiled(col("v"))
        .as("compiled"),
      transform(SimilarityOps.quantizeInt8(col("v")),
        x => x.cast("double")).as("hof"))
    val mismatches = both
      .filter(!(col("compiled") <=> col("hof"))).count()
    assert(mismatches == 0,
      "compiled quantizer must be value-identical to the HOF twin")
  }

  // ------------------------------------------------------------- pq

  test("PQ top-k: recall vs brute force is meaningful, approx scores " +
      "bounded, and the code space is actually small") {
    val brute = SimilarityOps.bruteForceTopK(spark, d)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = SimilarityOps.pqTopKSeeded(spark, d)
    val rows = pq.collect()
    assert(rows.length == 50, "10 queries × k=5")
    // ADC over a 16-codeword-per-subspace codebook loses precision, but a
    // planted-cluster corpus must keep a solid fraction of true neighbors
    val hits = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute intersect hits).size.toDouble / brute.size
    assert(recall >= 0.8, s"PQ recall vs brute (ADC shortlist + exact re-rank): $recall")
    assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.000001),
      "reconstructed cosine must stay a valid cosine")
  }

  test("setOpsAll: bag semantics reconcile — intersectAll + exceptAll " +
      "multiplicities rebuild the left multiset exactly") {
    val out = Relational.setOpsAll(spark, d)
    val rebuilt = out.groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions.sum("multiplicity").as("m"))
    val left = Tables.orders(spark, d)
      .filter(org.apache.spark.sql.functions.col("o_orderstatus") === "O")
      .groupBy("o_custkey").count()
    val joined = rebuilt.join(left, "o_custkey")
    assert(joined.count() == left.count())
    assert(joined.filter(
      org.apache.spark.sql.functions.col("m") =!=
        org.apache.spark.sql.functions.col("count")).count() == 0)
  }

  test("variantExtract: typed path reads agree with the JSON-path twin; " +
      "missing paths are NULL for every row") {
    val v = EventOps.variantExtract(spark, d)
    val j = EventOps.jsonExtract(spark, d)
    assert(v.select("event_id", "k").exceptAll(j).count() == 0)
    assert(v.filter(org.apache.spark.sql.functions.col("missing").isNotNull)
      .count() == 0)
  }

  test("IVF-PQ top-k: coarse pruning composed with ADC keeps recall, " +
      "shape intact, and results ⊆ the probed-cell universe") {
    val brute = SimilarityOps.bruteForceTopK(spark, d)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = SimilarityOps.ivfPqTopK(spark, d).collect()
    assert(rows.length == 50, "10 queries × k=5")
    val hits = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    // two lossy stages compose: cell misses (IVF) + code collisions (PQ);
    // the planted-cluster corpus must still retain most true neighbors
    val recall = (brute intersect hits).size.toDouble / brute.size
    assert(recall >= 0.7, s"IVF-PQ recall vs brute: $recall")
    // exact re-rank means surfaced similarities are true cosines: every
    // (query, neighbor) pair's score must equal the brute-force score
    val bruteScores = SimilarityOps.bruteForceTopK(spark, d, k = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
      .toMap
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      bruteScores.get(key).foreach(exp =>
        assert(r.getDouble(3) == exp, s"re-ranked score drifted for $key"))
    }
  }

  test("NearestCentroids l2 metric picks the closest-by-distance " +
      "centroid, not the closest-by-angle one") {
    // v = (3,3): cosine prefers the far-but-aligned (100,100);
    // L2 prefers the near-but-misaligned (4,2)
    val cents = Array(Array(100.0, 100.0), Array(4.0, 2.0))
    val df = Seq(Tuple1(Array(3.0f, 3.0f))).toDF("v")
    def pick(metric: String): Int = df.select(
      element_at(graft.functions.NearestCentroids.nearestCentroids(
        col("v"), cents, 1, metric), 1)).collect().head.getInt(0)
    assert(pick("cosine") == 0)
    assert(pick("l2") == 1)
    intercept[IllegalArgumentException](pick("manhattan"))
  }

  // ----------------------------------------------------- incremental dedup

  test("incremental dedup equals the full recompute restricted to " +
      "new-batch-sided pairs") {
    val full = graft.ops.DedupOps.ngramJaccardPairs(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val incr = graft.ops.DedupOps.incrementalJaccardPairs(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = full.filter(p => p._1 % 10 == 0 || p._2 % 10 == 0)
    assert(incr == expected,
      s"incremental must add exactly the new-sided pairs: " +
        s"missing=${expected -- incr} extra=${incr -- expected}")
    assert((full -- expected).nonEmpty || full.isEmpty,
      "fixture sanity: some pairs should be index-only (not recomputed)")
  }

  test("int8 top-k recall vs float brute force is high (quantization " +
      "error only)") {
    val float = SimilarityOps.bruteForceTopK(spark, d)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val int8 = SimilarityOps.bruteForceTopKInt8(spark, d)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(float.size == 50 && int8.size == 50)
    val recall = (float intersect int8).size.toDouble / float.size
    assert(recall >= 0.8, s"int8 recall vs float: $recall")
  }

  // ----------------------------------------------------- quality gate

  test("qualityGate keeps exactly floor(n*pct/100) docs per language") {
    val pct = 60
    val perLang = Tables.documents(spark, d).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = TextOps.qualityGate(spark, d, pct).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      assert(kept.getOrElse(lang, 0L) == n * pct / 100,
        s"$lang: expected ${n * pct / 100} of $n kept")
    }
  }

  test("qualityGate survivors are the top-ranked docs (no survivor ranks " +
      "below a dropped rank within a language)") {
    val out = TextOps.qualityGate(spark, d)
    val maxKept = out.groupBy("lang").agg(max("q_rank").as("mx"),
      count(lit(1)).as("n"))
    // ranks are dense from 1: max kept rank == number kept
    assert(maxKept.filter(col("mx") =!= col("n")).count() == 0)
  }

  // --------------------------------------------------------- mixture

  test("mixtureSample: per-language draws respect the integer threshold " +
      "math and total lands near the budget") {
    val budget = 250L
    val out = TextOps.mixtureSample(spark, d, budget)
    val counts = Tables.documents(spark, d).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = counts.map { case (l, n) =>
      l -> math.floor(math.sqrt(n.toDouble) * 1e6).toLong
    }
    val sumW = w.values.sum
    val kept = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (lang, n) =>
      val thresh = math.min(10000L, 10000L * budget * w(lang) / (sumW * n))
      // md5 buckets are uniform-ish; keep-count concentrates near n·thresh/1e4
      val expected = n * thresh / 10000.0
      val got = kept.getOrElse(lang, 0L).toDouble
      assert(math.abs(got - expected) <= math.max(5.0, expected),
        s"$lang: got $got, expected ~$expected (thresh $thresh of $n)")
    }
    val total = kept.values.sum
    assert(total > 0 && total <= 2 * budget, s"total sampled $total")
  }

  test("mixtureSample is deterministic across reruns") {
    val a = TextOps.mixtureSample(spark, d).collect().toSeq
    val b = TextOps.mixtureSample(spark, d).collect().toSeq
    assert(a == b)
  }

  // ----------------------------------------------- audit / scd2 / stats

  test("constraintAudit: declares every check, clean fixture has zero " +
      "violations (the publish gate would pass)") {
    val out = Relational.constraintAudit(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set("null_key", "null_cust", "nonpositive_price",
      "dup_keys", "fk_orphans"))
    assert(out.values.forall(_ == 0L), s"unexpected violations: $out")
  }

  test("scd2: version chains are gapless, ranges abut (valid_to == next " +
      "valid_from), exactly one current version per key") {
    val out = Relational.scd2(spark, d)
    val keys = out.select("key").distinct().count()
    assert(out.filter(col("is_current")).count() == keys,
      "each key must have exactly one open (current) version")
    // abutting ranges: lead(valid_from) over the version order == valid_to
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy("version")
    val broken = out
      .withColumn("next_from", lead("valid_from", 1).over(w))
      .filter(col("next_from").isNotNull &&
        col("next_from") =!= col("valid_to"))
    assert(broken.count() == 0, "non-abutting validity ranges")
    // versions dense from 1
    val dense = out.groupBy("key")
      .agg(count(lit(1)).as("n"), max("version").as("mx"))
      .filter(col("n") =!= col("mx"))
    assert(dense.count() == 0, "version numbering must be dense from 1")
  }

  test("tableStats matches direct computation per column") {
    val o = Tables.orders(spark, d)
    val nRows = o.count()
    val stats = Relational.tableStats(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(stats.keySet == o.columns.toSet)
    assert(stats.values.forall(_._1 == nRows))
    val ndvKey = o.select("o_orderkey").distinct().count()
    assert(stats("o_orderkey")._3 == ndvKey)
    val nullDate = o.filter(col("o_orderdate").isNull).count()
    assert(stats("o_orderdate")._2 == nullDate)
  }

  // ------------------------------------------------- incremental agg

  test("incrementalHourly (merge of stored+batch partials) equals the " +
      "full recompute, for any cutoff") {
    val full = Tables.events(spark, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"),
        min("value").as("min_value"), max("value").as("max_value"))
      .orderBy("hour", "event_type").collect().toSeq
    // mid-hour cutoff (exercises merging a split hour) and an aligned one
    for (cut <- Seq("2024-01-16 12:30:00", "2024-01-10 00:00:00")) {
      val inc = EventOps.incrementalHourly(spark, d, cut).collect().toSeq
      assert(inc == full, s"cutoff $cut: incremental != full recompute")
    }
  }

  // ------------------------------------------------- recursive reach

  test("recursiveReachIterative (engine path) equals the WITH RECURSIVE " +
      "CTE form row-for-row") {
    val cte = Relational.recursiveReach(spark, d).collect().toSeq
    val it = Relational.recursiveReachIterative(spark, d).collect().toSeq
    assert(it == cte, s"iterative $it != CTE $cte")
    assert(it.nonEmpty)
  }
}
