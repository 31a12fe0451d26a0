package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Analytics, CorpusOps, EventOps, Relational, TextOps}

/** Round-5 second batch: weighted sampling, curriculum ordering, hashed
  * classifier score, corpus datasheet, Bloom semi-join, grain rollup.
  */
class Round5bOpsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def bucketOf(text: String, mod: Long): Long =
    java.lang.Long.parseLong(md5hex(text).substring(0, 8), 16) % mod

  // ------------------------------------------------- weightedSample

  test("weightedSample: priority = (bucket * 1e6) div weight, smallest-k, " +
      "sorted (priority, doc_id), k caps the output") {
    val docs = Seq(
      (1L, "one two three"),
      (2L, "a"),
      (3L, "lots of words in this one right here yes"),
      (4L, ""), // empty text -> weight clamps to 1
      (5L, "five tokens exactly in here")).toDF("doc_id", "text")
    val out = TextOps.weightedSampleFrom(docs, k = 3).collect()
    assert(out.length === 3)
    val texts = Map(1L -> "one two three", 2L -> "a",
      3L -> "lots of words in this one right here yes", 4L -> "",
      5L -> "five tokens exactly in here")
    val expected = texts.toSeq.map { case (id, t) =>
      val w = math.max(t.trim.split("\\s+").count(_.nonEmpty), 1).toLong
      (bucketOf(t, 10000L) * 1000000L / w, id, w)
    }.sortBy(p => (p._1, p._2)).take(3)
    assert(out.map(r => (r.getLong(2), r.getLong(0), r.getLong(1))).toSeq
      === expected)
  }

  test("weightedSample: equal buckets -> heavier doc wins (priority " +
      "inversely proportional to weight)") {
    // same text content twice would dedup buckets identically; instead
    // verify the monotonicity contract directly on the formula
    val docs = Seq((1L, "x y z"), (2L, "x y z w v u t s r q")).toDF(
      "doc_id", "text")
    val rows = TextOps.weightedSampleFrom(docs, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b1 = bucketOf("x y z", 10000L)
    val b2 = bucketOf("x y z w v u t s r q", 10000L)
    assert(rows(1L) === b1 * 1000000L / 3)
    assert(rows(2L) === b2 * 1000000L / 10)
  }

  // ----------------------------------------------------- curriculum

  test("curriculum: every doc appears once, phases split on the exact " +
      "quartile cutoffs, ord is dense within (phase, shard)") {
    val out = TextOps.curriculum(spark, TestSpark.sf001).collect()
    val docs = Tables.documents(spark, TestSpark.sf001)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    assert(out.length === docs.size)
    assert(out.map(_.getLong(0)).distinct.length === docs.size)

    // recompute the cutoffs with the (p*n + 99) div 100 rank rule
    val sorted = docs.values.toSeq.sorted
    def cut(p: Int): Double =
      sorted(math.max(1, (p * sorted.size + 99) / 100).toInt - 1).toDouble
    val (c25, c50, c75) = (cut(25), cut(50), cut(75))
    out.foreach { r =>
      val n = docs(r.getLong(0)).toDouble
      val phase = 1 + (if (n > c25) 1 else 0) + (if (n > c50) 1 else 0) +
        (if (n > c75) 1 else 0)
      assert(r.getInt(1) === phase, s"doc ${r.getLong(0)} n_chars $n")
    }
    // ord dense (1..count) per (phase, shard)
    out.groupBy(r => (r.getInt(1), r.getInt(2))).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(3)).sorted.toSeq === (1 to rows.length))
    }
  }

  // ------------------------------------------------ classifierScore

  test("classifierScore: empty text scores 0/keep=false; token weights " +
      "are the 16-bit md5 pseudo-weights and sum linearly") {
    val tmp = java.nio.file.Files.createTempDirectory("clf").toString
    Seq((1L, "", "en", "s", 0L), (2L, "hello", "en", "s", 5L),
      (3L, "hello hello", "en", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextOps.classifierScore(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    val wHello =
      java.lang.Long.parseLong(md5hex("hello").substring(0, 4), 16) %
        201L - 100L
    assert(out(1L).getLong(1) === 0L && out(1L).getLong(2) === 0L)
    assert(out(1L).getDouble(3) === 0.0 && !out(1L).getBoolean(4))
    assert(out(2L).getLong(2) === wHello)
    assert(out(3L).getLong(2) === 2 * wHello)
    assert(out(3L).getDouble(3) === (2 * wHello).toDouble / 2)
    assert(out(2L).getBoolean(4) === (wHello > 0))
  }

  // ------------------------------------------------ corpusDatasheet

  test("corpusDatasheet: per-source counts/dup-rate agree with direct " +
      "aggregation on testdata") {
    val out = CorpusOps.corpusDatasheet(spark, TestSpark.sf001).collect()
    val docs = Tables.documents(spark, TestSpark.sf001).cache()
    try {
      val direct = docs.groupBy("source").agg(
        count(lit(1)).as("n"),
        countDistinct(md5(col("text"))).as("nd"),
        countDistinct(col("lang")).as("nl")).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
          r.getLong(3))).toMap
      assert(out.nonEmpty)
      out.foreach { r =>
        val (n, nd, nl) = direct(r.getString(0))
        assert(r.getLong(1) === n)
        assert(r.getLong(3) === nd)
        assert(r.getLong(4) === nl)
        assert(r.getDouble(5) === 1.0 - nd.toDouble / n)
        assert(r.getDouble(5) >= 0.0 && r.getDouble(5) < 1.0)
      }
    } finally docs.unpersist()
  }

  // -------------------------------------------------- bloomSemiJoin

  test("bloomSemiJoin: identical result to the plain exact semi-join " +
      "(no false negatives; false positives removed)") {
    val out = Relational.bloomSemiJoin(spark, TestSpark.sf0001).collect()
    val dim = Tables.orders(spark, TestSpark.sf0001)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val plain = Tables.lineitem(spark, TestSpark.sf0001)
      .join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus").collect()
    assert(out.map(_.toSeq).toSeq === plain.map(_.toSeq).toSeq)
    assert(out.nonEmpty)
  }

  // ---------------------------------------------------- grainRollup

  test("grainRollup: each grain conserves total events and total value " +
      "(partials re-aggregate exactly)") {
    val out = EventOps.grainRollup(spark, TestSpark.sf0001).collect()
    val total = Tables.events(spark, TestSpark.sf0001).count()
    val grains = out.groupBy(_.getString(0))
    assert(grains.keySet === Set("minute", "hour", "day"))
    grains.foreach { case (g, rows) =>
      assert(rows.map(_.getLong(2)).sum === total, s"grain $g loses events")
    }
    // each bucket's sum_value is an exact decimal(·,2) cast to double;
    // recover the exact decimal before summing so grains compare equal
    val sums = grains.map { case (g, rows) =>
      g -> rows.map(r => BigDecimal(r.getDouble(3))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
    }
    assert(sums("minute") === sums("hour") && sums("hour") === sums("day"))
    // coarser grain -> fewer-or-equal buckets
    assert(grains("day").length <= grains("hour").length)
    assert(grains("hour").length <= grains("minute").length)
  }

  // ---------------------------------------------------- rfmSegments

  test("rfmSegments: scores recomputed from collected metrics via the " +
      "(p*n + 99) div 100 rank rule match exactly; all scores in 1..5") {
    val out = Analytics.rfmSegments(spark, TestSpark.sf0001).collect()
    assert(out.nonEmpty)
    def cuts(vs: Seq[Double]): Seq[Double] = {
      val s = vs.sorted
      Seq(20, 40, 60, 80).map(p =>
        s(math.max(1, (p * s.size + 99) / 100) - 1))
    }
    def score(v: Double, qs: Seq[Double]): Int =
      1 + qs.count(v > _)
    val rq = cuts(out.map(r => -r.getLong(1).toDouble).toSeq)
    val fq = cuts(out.map(_.getLong(2).toDouble).toSeq)
    val mq = cuts(out.map(_.getDouble(3)).toSeq)
    out.foreach { r =>
      assert(r.getInt(4) === score(-r.getLong(1).toDouble, rq))
      assert(r.getInt(5) === score(r.getLong(2).toDouble, fq))
      assert(r.getInt(6) === score(r.getDouble(3), mq))
      Seq(r.getInt(4), r.getInt(5), r.getInt(6)).foreach(sc =>
        assert(sc >= 1 && sc <= 5))
    }
    // quintile cuts must spread: top and bottom scores both inhabited
    assert(out.exists(_.getInt(6) === 5) && out.exists(_.getInt(6) === 1))
  }

  // ----------------------------------------------------- yoyRevenue

  test("yoyRevenue: delta/growth reconcile against the previous year's " +
      "revenue; first year per priority is NULL") {
    val out = Analytics.yoyRevenue(spark, TestSpark.sf0001).collect()
    val byPriority = out.groupBy(_.getString(1))
    byPriority.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(0))
      assert(sorted.head.isNullAt(3) && sorted.head.isNullAt(5))
      sorted.sliding(2).foreach {
        case Array(prev, cur) =>
          assert(cur.getDouble(3) === prev.getDouble(2))
          assert(math.abs(
            cur.getDouble(4) - (cur.getDouble(2) - prev.getDouble(2)))
            < 1e-6)
          assert(math.abs(cur.getDouble(5) -
            (cur.getDouble(2) / prev.getDouble(2) - 1.0)) < 1e-12)
        case _ =>
      }
    }
  }

  // ----------------------------------------------------- corpusDiff

  test("corpusDiff: added/removed/changed partition exactly along the " +
      "derived-snapshot rules; untouched docs emit nothing") {
    val out = CorpusOps.corpusDiff(spark, TestSpark.sf001).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val ids = Tables.documents(spark, TestSpark.sf001)
      .select("doc_id").as[Long].collect().toSeq
    val expRemoved = ids.filter(_ % 13 == 0).toSet
    val expChanged = ids.filter(i => i % 13 != 0 && i % 7 == 0).toSet
    // added docs are re-keyed into the negative namespace (-id - 1):
    // collision-free against any real non-negative doc_id (round-6 fix
    // of the fixed-offset scheme that collided past one million ids)
    val expAdded = ids.filter(_ % 11 == 0).map(i => -i - 1L).toSet
    assert(out.collect { case (id, "removed") => id }.toSet === expRemoved)
    assert(out.collect { case (id, "changed") => id }.toSet === expChanged)
    assert(out.collect { case (id, "added") => id }.toSet === expAdded)
    assert(out.length === expRemoved.size + expChanged.size + expAdded.size)
  }

  // ------------------------------------------------------ edge cases

  test("weightedSample on an empty frame returns zero rows (no NPE on " +
      "the top-k of nothing)") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextOps.weightedSampleFrom(empty, k = 10).collect().isEmpty)
  }

  test("grainRollup on an empty events table returns zero rows at every " +
      "grain") {
    val tmp = java.nio.file.Files.createTempDirectory("gr_empty").toString
    Seq.empty[(java.sql.Timestamp, Double)].toDF("ts", "value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    assert(EventOps.grainRollup(spark, tmp).collect().isEmpty)
  }

  // ----------------------------------------------------- anomalyMad

  test("anomalyMad: med/MAD/anomaly counts reconcile against an exact " +
      "recompute with the lower-median rank rule") {
    val out = EventOps.anomalyMad(spark, TestSpark.sf0001).collect()
    assert(out.nonEmpty)
    val byType = Tables.events(spark, TestSpark.sf0001)
      .select("event_type", "value").as[(String, Double)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    def lowerMedian(vs: Seq[Double]): Double = {
      val s = vs.sorted
      s(math.max(1, (50 * s.size + 99) / 100) - 1)
    }
    out.foreach { r =>
      val vs = byType(r.getString(0))
      val med = lowerMedian(vs)
      val devs = vs.map(v => math.abs(v - med))
      val mad = lowerMedian(devs)
      assert(r.getLong(1) === vs.size.toLong)
      assert(r.getDouble(2) === med)
      assert(r.getDouble(3) === mad)
      assert(r.getLong(4) === devs.count(_ > 4.4478 * mad).toLong)
    }
  }

  // ----------------------------------------------- cusumChangepoint

  test("cusumChangepoint: the argmax row matches an exact sequential " +
      "recompute (same mean, same order, same tiebreak)") {
    val out = EventOps.cusumChangepoint(spark, TestSpark.sf0001).collect()
    assert(out.nonEmpty)
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select("event_type", "event_id", "ts", "value")
      .as[(String, Long, java.sql.Timestamp, Double)].collect()
      .filter(r => r._4 == r._4) // keep all; value non-null in fixture
      .groupBy(_._1)
    out.foreach { r =>
      val rows = ev(r.getString(0))
        .sortBy(e => (e._3.getTime, e._2))
      val mean = rows.map(e => BigDecimal(e._4)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble /
        rows.length
      var acc = BigDecimal(0)
      var best = (BigDecimal(0), rows.head._3, rows.head._2)
      var bestSet = false
      rows.foreach { e =>
        // DECIMAL(24,9)-rounded deviation, as the operator accumulates
        acc += BigDecimal(e._4 - mean)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        val a = acc.abs
        if (!bestSet || a > best._1) { best = (a, e._3, e._2); bestSet = true }
      }
      assert(r.getLong(1) === rows.length.toLong)
      assert(r.getTimestamp(2) === best._2, s"type ${r.getString(0)}")
      assert(r.getDouble(3) === best._1.toDouble, s"type ${r.getString(0)}")
    }
  }

  // -------------------------------------------------- hashEmbedding

  test("hashEmbedding: sparse signed bag-of-words with exact unit norm; " +
      "identical texts embed identically; empty docs emit nothing") {
    val tmp = java.nio.file.Files.createTempDirectory("hemb").toString
    Seq((1L, "alpha beta gamma alpha", "en", "s", 22L),
      (2L, "alpha beta gamma alpha", "en", "s", 22L),
      (3L, "", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextOps.hashEmbedding(spark, tmp).collect()
    assert(!out.exists(_.getLong(0) === 3L), "empty doc must emit no rows")
    val v1 = out.filter(_.getLong(0) === 1L)
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    val v2 = out.filter(_.getLong(0) === 2L)
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    assert(v1.nonEmpty && v1.toSeq === v2.toSeq,
      "identical text must hash to the identical sparse vector")
    val norm = v1.map(_._3).map(x => x * x).sum
    assert(math.abs(norm - 1.0) < 1e-9, s"unit norm violated: $norm")
    // recompute the expected sparse vector from md5 directly
    val expected = Seq("alpha", "beta", "gamma", "alpha")
      .map { t =>
        val h = md5hex(t)
        val dim = java.lang.Long.parseLong(h.substring(0, 4), 16) % 64L
        val sgn =
          if (java.lang.Long.parseLong(h.substring(4, 5), 16) % 2 == 0) 1L
          else -1L
        dim -> sgn
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .filter(_._2 != 0L).sortBy(_._1)
    val ss = expected.map(p => p._2 * p._2).sum.toDouble
    assert(v1.toSeq === expected.map { case (dim, v) =>
      (dim, v, v.toDouble / math.sqrt(ss))
    })
  }
}
