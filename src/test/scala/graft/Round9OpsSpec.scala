package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, EventOps, GraphOps, TextOps}

/** Round-9 operators: cohort LTV, per-type user-value Gini, n-gram
  * first-occurrence novelty, and the MinHash estimate-bound audit —
  * each checked against an independent driver-side recompute (or a
  * structural invariant the operator must preserve) on sf0.001.
  */
class Round9OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("ltvCohort: cumulative revenue equals a driver-side 2-dp replay " +
      "per (cohort, week), is non-decreasing within each cohort, and " +
      "cohort sizes equal cohortRetention's week-0 active counts") {
    val d = TestSpark.sf0001
    val got = EventOps.ltvCohort(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), BigDecimal(r.getDouble(3)), r.getDouble(4))))
    // driver replay: quantize each purchase to 2 dp HALF_UP (the
    // decimal(18,2) cast), accumulate per (cohortWeek, weeksSince)
    val ev = Tables.events(spark, d)
      .select(col("user_id"),
        floor(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")) / 7).as("wk"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val firstWk = ev.groupBy(_._1).map { case (u, rs) =>
      u -> rs.map(_._2).min
    }
    val weekly = scala.collection.mutable
      .Map.empty[(Long, Long), BigDecimal].withDefaultValue(BigDecimal(0))
    ev.foreach { case (u, wk, typ, v) =>
      val rev = if (typ == "purchase")
        BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      else BigDecimal(0)
      val key = (firstWk(u), wk - firstWk(u))
      weekly(key) = weekly(key) + rev
    }
    val cohorts = firstWk.values.groupBy(identity).map { case (w, us) =>
      w -> us.size.toLong
    }
    val expected = weekly.keys.toSeq.sorted.map { case (cw, ws) =>
      val cum = weekly.toSeq
        .filter { case ((c, w), _) => c == cw && w <= ws }
        .map(_._2).sum
      ((cw, ws), (cohorts(cw), cum))
    }.toMap
    assert(got.map(_._1).toSet === expected.keySet)
    got.foreach { case (key, (nUsers, cum, perUser)) =>
      val (expN, expCum) = expected(key)
      assert(nUsers === expN, s"cohort size at $key")
      assert(cum === expCum, s"cumulative revenue at $key")
      assert(perUser === (expCum / expN).toDouble ||
        math.abs(perUser - expCum.toDouble / expN) < 1e-12,
        s"per-user LTV at $key")
    }
    // monotone within cohort
    got.groupBy(_._1._1).foreach { case (_, rows) =>
      val byWeek = rows.sortBy(_._1._2).map(_._2._2)
      assert(byWeek.zip(byWeek.tail).forall { case (a, b) => b >= a })
    }
    // week 0 of every cohort is every cohort user's first week, so
    // retention's week-0 active count IS the cohort size
    val ret0 = EventOps.cohortRetention(spark, d).collect()
      .filter(_.getLong(1) == 0L)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    got.filter(_._1._2 == 0L).foreach { case ((cw, _), (nUsers, _, _)) =>
      assert(ret0(cw) === nUsers)
    }
  }

  test("giniUserValue: per-type Gini equals an exact BigInt driver-side " +
      "recompute over integer micros, and is in [0, 1)") {
    val d = TestSpark.sf0001
    val got = EventOps.giniUserValue(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val per = Tables.events(spark, d)
      .select(col("event_type"), col("user_id"), col("value"))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        math.floor(r.getDouble(2) * 1e6).toLong))
      .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }
    got.foreach { case (typ, nUsers, totalMicros, gini) =>
      val xs = per.toSeq.collect { case ((t, u), x) if t == typ => (x, u) }
        .sortBy(identity).map(_._1)
      assert(nUsers === xs.size.toLong)
      assert(totalMicros === xs.sum)
      val n = BigInt(xs.size)
      val tot = xs.map(BigInt(_)).sum
      val swx = xs.zipWithIndex
        .map { case (x, i) => BigInt(i + 1) * x }.sum
      val expected = (BigInt(2) * swx - (n + 1) * tot).toDouble /
        (n * tot).toDouble
      assert(gini === expected, typ)
      assert(gini >= 0.0 && gini < 1.0, typ)
    }
  }

  test("ngramNovelty: the smallest doc_id with shingles scores exactly " +
      "1.0, novel counts sum to the corpus's distinct shingle count, " +
      "novelty is in [0,1], and short docs surface 0 shingles + NULL") {
    val d = TestSpark.sf0001
    val got = DedupOps.ngramNovelty(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val withSh = got.filter(_._2 > 0)
    assert(withSh.nonEmpty)
    // the earliest shingled doc can only contain first occurrences
    val first = withSh.minBy(_._1)
    assert(first._4 === Some(1.0))
    // each distinct shingle is novel in exactly one doc (its min-doc)
    val distinctShingles = DedupOps.shingleIndex(spark, d, 3)
      .select("h").distinct().count()
    assert(withSh.map(_._3).sum === distinctShingles)
    withSh.foreach { case (id, n, novel, nov) =>
      assert(novel <= n, id)
      assert(nov.exists(v => v >= 0.0 && v <= 1.0), id)
      assert(nov === Some(novel.toDouble / n), id)
    }
    got.filter(_._2 == 0).foreach { case (id, _, novel, nov) =>
      assert(novel === 0L && nov.isEmpty, id)
    }
    // every document surfaces exactly once
    assert(got.map(_._1).distinct.length === got.length)
    assert(got.length ===
      Tables.documents(spark, d).count().toInt)
  }

  test("ktruss: K4 survives whole (every edge in 2 triangles); a " +
      "pendant edge peels; a triangle-free cycle empties; 3-truss " +
      "contains 4-truss; fixture fixpoint edges all carry support >= 2") {
    import spark.implicits._
    def edges(es: (Long, Long)*) = es.toDF("a", "b")
    def run(und: org.apache.spark.sql.DataFrame, k: Int) =
      GraphOps.ktrussFromEdges(und, k, maxRounds = 8).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // K4: all 6 edges, each in exactly 2 triangles
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val k4Out = run(k4, 4)
    assert(k4Out.map(e => (e._1, e._2)).sorted ===
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(k4Out.forall(_._3 == 2L))
    // K4 + pendant: the pendant edge has zero support and peels round 1
    val pend = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L))
    assert(run(pend, 4).map(e => (e._1, e._2)).sorted ===
      k4Out.map(e => (e._1, e._2)).sorted)
    // C5: wedges but no triangles — 4-truss is empty
    val c5 = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 5L))
    assert(run(c5, 4).isEmpty)
    // nesting on the fixture graph: 4-truss ⊆ 3-truss
    val d = TestSpark.sf0001
    val t4 = GraphOps.ktruss(spark, d, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val t3 = GraphOps.ktruss(spark, d, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // sf0.001's co-purchase graph is triangle-rich (max support 16) —
    // both trusses are NON-vacuous here, so nesting is a real check
    assert(t3.nonEmpty && t4.nonEmpty)
    assert(t4.map(e => (e._1, e._2)).forall(t3.contains))
    assert(t4.size <= t3.size)
    // converged fixture fixpoint: every surviving edge meets the bar
    assert(t4.forall(_._3 >= 2L))
  }

  test("langIdConfusion: cells reconcile with languageId doc by doc, " +
      "cover the whole corpus exactly once, and row shares sum to 1 " +
      "per language") {
    val d = TestSpark.sf0001
    val got = TextOps.langIdConfusion(spark, d).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3))))
    val truth = Tables.documents(spark, d).select("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pred = TextOps.languageId(spark, d).select("doc_id",
        "predicted_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = truth.toSeq
      .map { case (id, lang) => (lang, pred.getOrElse(id, "und")) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got.map(c => c._1 -> c._2._1).toMap === expected)
    assert(got.map(_._2._1).sum === truth.size.toLong)
    got.groupBy(_._1._1).foreach { case (lang, cells) =>
      assert(math.abs(cells.map(_._2._2).sum - 1.0) < 1e-12, lang)
    }
  }

  test("forecastBacktest: every row's prediction equals a driver-side " +
      "OLS fit on strictly-prior days (identical double chain), " +
      "residual = actual - predicted, and n_prior counts prior days") {
    val d = TestSpark.sf0001
    val got = EventOps.forecastBacktest(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val daily = Tables.events(spark, d)
      .filter(col("event_type") === "purchase")
      .select((expr("unix_micros(ts) div 86400000000")).as("day"),
        floor(col("value") * 1e6).cast("long").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq
      .map { case (day, vs) => (day, vs.map(_._2).sum) }
      .sortBy(_._1)
    assert(got.length === daily.size - 2) // first two days lack n>=2
    got.foreach { case (day, nPrior, actual, predicted, residual) =>
      val prior = daily.filter(_._1 < day)
      assert(nPrior === prior.size.toLong)
      val n = prior.size.toLong
      val sx = prior.map(_._1).sum
      val sy = prior.map(_._2).sum
      val sxy = prior.map(p => p._1 * p._2).sum
      val sxx = prior.map(p => p._1 * p._1).sum
      val beta = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx)
      val alpha = (sy.toDouble - beta * sx.toDouble) / n.toDouble
      val pred = (alpha + beta * day.toDouble) / 1e6
      val y = daily.find(_._1 == day).get._2
      assert(actual === y.toDouble / 1e6, day)
      assert(predicted === pred, day)
      assert(residual === y.toDouble / 1e6 - pred, day)
    }
  }

  test("richClub: a hub star has phi(k)=0 rows only (no two high-degree " +
      "nodes adjacent... the center stands alone), K4 is a perfect club " +
      "below its degree, and the fixture curve replays driver-side") {
    import spark.implicits._
    def run(es: Seq[(Long, Long)]) =
      GraphOps.richClubFromEdges(es.toDF("a", "b")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    // K4: degrees all 3 — grid is {3}, nobody has deg > 3
    val k4 = run(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)))
    assert(k4.toSeq === Seq((3L, 0L, 0L, None)))
    // star + one spoke-spoke edge: center deg 4, linked spokes deg 2,
    // leaf spokes deg 1; the k=1 club {center, both linked spokes} is
    // a triangle — a PERFECT club (phi = 1), while k=2 leaves the
    // center alone (n=1, phi undefined)
    val star = run(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (2L, 3L)))
    val k1 = star.find(_._1 == 1L).get
    assert(k1._2 === 3L && k1._3 === 3L && k1._4 === Some(1.0))
    val k2 = star.find(_._1 == 2L).get
    assert(k2._2 === 1L && k2._3 === 0L && k2._4.isEmpty)
    // fixture replay
    val d = TestSpark.sf0001
    val got = GraphOps.richClub(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val edges = graft.ops.GraphOps
      .coPurchaseEdges(spark, d, 2).select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val degs = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    got.foreach { case (k, nN, nE, phi) =>
      val club = degs.filter(_._2 > k).keySet
      val ce = edges.count(e => club(e._1) && club(e._2)).toLong
      assert(nN === club.size.toLong, s"k=$k")
      assert(nE === ce, s"k=$k")
      if (club.size >= 2)
        assert(phi === Some(2.0 * ce / (club.size.toLong
          * (club.size - 1)).toDouble), s"k=$k")
      else assert(phi.isEmpty, s"k=$k")
    }
    assert(got.map(_._1).toSet === degs.values.toSet)
  }

  test("hapaxRatio: per-language vocab/hapax equal a driver-side " +
      "recount, hapax <= vocab, ratio is the exact quotient") {
    val d = TestSpark.sf0001
    val got = TextOps.hapaxRatio(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val tf = Tables.documents(spark, d)
      .select(col("lang"), explode(TextOps.tokens(lower(col("text"))))
        .as("term"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).map { case (k, v) => k -> v.size }
    // .toSeq before .map: mapping a Set of keys through tf would
    // DEDUPE equal counts (the groupBy-replay trap)
    val byLang = tf.keys.toSeq.groupBy(_._1).map { case (lang, keys) =>
      val counts = keys.map(tf)
      lang -> (counts.size.toLong, counts.count(_ == 1).toLong)
    }
    assert(got.map(_._1).toSet === byLang.keySet)
    got.foreach { case (lang, vocab, hapax, ratio) =>
      val (v, h) = byLang(lang)
      assert(vocab === v, lang)
      assert(hapax === h, lang)
      assert(hapax <= vocab)
      assert(ratio === h.toDouble / v, lang)
    }
  }

  test("equiwidthHist: exactly 10 contiguous equal-width cent bins " +
      "covering [min, max], counts reconcile with a driver-side " +
      "recount (empty bins included), totals preserved") {
    val d = TestSpark.sf0001
    val got = graft.ops.Relational.equiwidthHist(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.map(_._1).toSeq === (0L until 10L))
    val cents = Tables.orders(spark, d)
      .select((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).collect().map(_.getLong(0))
    val lo = cents.min
    val w = (cents.max - lo + 10) / 10
    val expected = cents.groupBy(c => (c - lo) / w)
      .map { case (b, cs) => b -> cs.size.toLong }
    got.foreach { case (b, n, binLo, binHi) =>
      assert(n === expected.getOrElse(b, 0L), s"bucket $b")
      assert(binLo === (lo + b * w).toDouble / 100)
      assert(binHi === (lo + (b + 1) * w - 1).toDouble / 100)
    }
    assert(got.map(_._2).sum === cents.length.toLong)
    // bins tile the domain: each bin starts where the previous ended
    got.sliding(2).foreach { case Array(p, n) =>
      assert(math.abs(n._3 - (p._4 + 0.01)) < 1e-9)
    }
  }

  test("dauWauMau: every day's three exact distinct counts replay " +
      "driver-side, dau <= wau <= mau, stickiness = dau/mau") {
    val d = TestSpark.sf0001
    val got = EventOps.dauWauMau(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val ud = Tables.events(spark, d)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = ud.map(_._2).distinct.sorted
    assert(got.map(_._1).toSeq === days.toSeq)
    got.foreach { case (day, dau, wau, mau, stick) =>
      def active(win: Int) =
        ud.filter(p => day - p._2 >= 0 && day - p._2 < win)
          .map(_._1).distinct.length.toLong
      assert(dau === active(1), s"dau day=$day")
      assert(wau === active(7), s"wau day=$day")
      assert(mau === active(30), s"mau day=$day")
      assert(dau <= wau && wau <= mau)
      assert(stick === dau.toDouble / mau)
    }
  }

  test("paretoCover: fixture rows replay a driver-side desc-sort " +
      "cumsum exactly; an all-equal hand frame needs exactly " +
      "ceil(p*n) units (tie-order independence)") {
    val d = TestSpark.sf0001
    val got = EventOps.paretoCover(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    val per = Tables.events(spark, d)
      .groupBy("user_id")
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      .collect().map(_.getLong(1)).sortBy(-_)
    val tm = per.sum
    val tu = per.length.toLong
    got.foreach { case (pct, nUsers, userShare, massShare) =>
      val target = (pct * tm + 99) / 100
      var cum = 0L
      var n = 0
      while (cum < target) { cum += per(n); n += 1 }
      assert(nUsers === n.toLong, s"pct=$pct")
      assert(userShare === n.toDouble / tu)
      assert(massShare === cum.toDouble / tm)
      assert(massShare >= pct.toDouble / 100)
    }
    assert(got.map(_._1).toSeq === Seq(50L, 80L, 90L))
    // ties: 10 equal units — covering p needs exactly ceil(10p) units
    import spark.implicits._
    val eq = Seq.fill(10)(7L).toDF("x")
      .agg(graft.functions.ParetoCover
        .paretoCover(col("x"), Seq(50, 80, 90), 100).as("pc"))
      .select(explode(col("pc")).as("p"))
      .select(col("p.n_units")).collect().map(_.getLong(0)).toSeq
    assert(eq === Seq(5L, 8L, 9L))
  }

  test("timeToConvert: rate and every latency quantile replay a " +
      "driver-side recount (integer rank rule over converted users), " +
      "and the big-ticket threshold genuinely censors") {
    val d = TestSpark.sf0001
    val row = EventOps.timeToConvert(spark, d).collect().head
    val per = Tables.events(spark, d)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))
      .groupBy(_._1).toSeq.map { case (u, rows) =>
        val first = rows.map(_._2).min
        val conv = rows.filter(r => r._3 == "purchase" && r._4 > 180.0)
          .map(_._2).minOption
        (u, conv.map(_ - first))
      }
    val nUsers = per.size.toLong
    val lats = per.flatMap(_._2).sorted
    val nConv = lats.size.toLong
    assert(row.getLong(0) === nUsers)
    assert(row.getLong(1) === nConv)
    // censoring is real on the fixture: some but not all users convert
    assert(nConv > 0 && nConv < nUsers)
    assert(row.getDouble(2) === nConv.toDouble / nUsers)
    Seq(25, 50, 75, 90).zipWithIndex.foreach { case (p, i) =>
      val rank = math.max(1L, (p * nConv + 99) / 100)
      val expected = lats(rank.toInt - 1).toDouble / 1e6
      assert(row.getDouble(3 + i) === expected, s"p$p")
    }
  }

  test("minhashEstAudit: the audited pair set IS ngramJaccardPairs' " +
      "pair set, every exact Jaccard is >= the 0.6 generator threshold, " +
      "and every deterministic 64-seed estimate sits within the bound") {
    val d = TestSpark.sf0001
    val got = DedupOps.minhashEstAudit(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2),
        r.getBoolean(3)))
    val pairs = DedupOps.ngramJaccardPairs(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.map(_._1).toSet === pairs)
    assert(got.nonEmpty)
    got.foreach { case (p, j, within) =>
      assert(j >= 0.6 && j <= 1.0, p)
      // deterministic seeds => the bound is a hard engine invariant,
      // not a probabilistic one (same text, same signature, same dev)
      assert(within, s"$p est deviated beyond 0.25 from J=$j")
    }
  }
}
