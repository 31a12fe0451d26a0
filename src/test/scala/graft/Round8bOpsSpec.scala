package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventOps

/** Round-8 second-half event operators: last-touch attribution, the
  * Markov transition matrix, and the hourly-count ACF — each checked
  * against an independent driver-side recompute on sf0.001.
  */
class Round8bOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private def rawEvents: Array[(Long, Double, Long, String, Double)] =
    Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), col("ts").cast("double").as("sec"),
        col("event_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))

  test("attributionLastTouch: channel counts and 2-dp revenue match a " +
      "sequential driver-side replay of every user's stream, and " +
      "conversion totals equal the purchase count") {
    val ev = rawEvents
    val credit = scala.collection.mutable.Map.empty[String, (Long, BigDecimal)]
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val ord = rows.sortBy(r => (r._2, r._3))
      ord.indices.foreach { i =>
        val (_, sec, _, t, v) = ord(i)
        if (t == "purchase") {
          val touch = (i - 1 to 0 by -1).iterator.map(ord)
            .find(_._4 != "purchase")
          val ch = touch match {
            case Some((_, ts2, _, t2, _)) if sec - ts2 <= 86400d => t2
            case _ => "direct"
          }
          val (n0, s0) = credit.getOrElse(ch, (0L, BigDecimal(0)))
          credit(ch) = (n0 + 1,
            s0 + BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        }
      }
    }
    val got = EventOps.attributionLastTouch(spark, TestSpark.sf0001)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq === got.map(_._1).toSeq.sorted)
    assert(got.toMap ===
      credit.toMap.map { case (k, (n, s)) => k -> (n, s.toDouble) })
    assert(got.map(_._2._1).sum === ev.count(_._4 == "purchase").toLong)
  }

  test("markovTransitions: bigram counts match a driver-side replay, " +
      "probabilities are the exact n/rowSum division, and each " +
      "prev-type's row sums to 1 within one ulp per term") {
    val ev = rawEvents
    val want = scala.collection.mutable.Map.empty[(String, String), Long]
    ev.groupBy(_._1).foreach { case (_, rows) =>
      rows.sortBy(r => (r._2, r._3)).map(_._4).toSeq.sliding(2).foreach {
        case Seq(a, b) => want((a, b)) = want.getOrElse((a, b), 0L) + 1
        case _ =>
      }
    }
    val got = EventOps.markovTransitions(spark, TestSpark.sf0001)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2),
        r.getDouble(3)))
    assert(got.map(_._1).toSet === want.keySet)
    assert(got.map(g => g._1 -> g._2).toMap === want.toMap)
    val rowTotals = want.toSeq.groupBy(_._1._1)
      .map { case (p, kv) => p -> kv.map(_._2).sum }
    got.foreach { case ((p, _), n, prob) =>
      assert(prob === n.toDouble / rowTotals(p))
    }
    got.groupBy(_._1._1).values.foreach { rows =>
      assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-12)
    }
  }

  test("acfHourly: every lag's r equals an exact-integer-moment Pearson " +
      "recompute, and the pair count at lag k equals the matched " +
      "(h, h+k) hour pairs") {
    val hourly = rawEvents
      .groupBy(r => math.floor(r._2 / 3600).toLong)
      .map { case (h, rows) => h -> rows.length.toLong }
    val want = (1L to 24L).map { k =>
      val pairs = hourly.toSeq.flatMap { case (h, x) =>
        hourly.get(h + k).map(y => (x, y))
      }
      val n = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
      val r = if (vx > 0 && vy > 0)
        Some((n * sxy - sx * sy).toDouble /
          (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble)))
      else None
      (k, n, r)
    }
    val got = EventOps.acfHourly(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.toSeq === want)
    // all 24 lags present in order, each with a full pair census
    assert(got.map(_._1).toSeq === (1L to 24L))
    assert(got.forall(_._2 > 0))
  }

  private def tokenCounts: Array[(Long, String, Long)] =
    Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("lang"),
        size(ops.TextOps.tokens(col("text"))).cast("long").as("x"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  test("giniTokens: every language's G matches the integer rank-identity " +
      "recompute, sits in [0, 1), and a constant series gives exactly 0") {
    val want = tokenCounts.groupBy(_._2).map { case (lang, rows) =>
      val xs = rows.sortBy(r => (r._3, r._1)).map(_._3)
      val n = xs.length.toLong
      val tot = xs.sum
      val swx = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      lang -> (n, tot,
        if (tot > 0) Some((2 * swx - (n + 1) * tot).toDouble
          / (n * tot).toDouble)
        else None)
    }
    val got = ops.TextOps.giniTokens(spark, TestSpark.sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.toMap === want)
    assert(got.flatMap(_._2._3).forall(g => g >= 0 && g < 1))
    // rank identity sanity: constant x ⇒ G = 0 exactly
    val const = Seq.fill(7)(42L)
    val cn = const.length.toLong; val ct = const.sum
    val cs = const.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    assert((2 * cs - (cn + 1) * ct).toDouble / (cn * ct) === 0.0)
  }

  test("ksSplitDrift: the statistic equals the max ECDF gap over a " +
      "driver-side two-sample replay, and the reported value attains it") {
    val rows = Tables.documents(spark, TestSpark.sf0001)
      .select(size(ops.TextOps.tokens(col("text"))).cast("long").as("v"),
        (conv(substring(md5(col("text")), 1, 8), 16, 10)
          .cast("long") % 100 < 10).as("isTest"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val train = rows.filter(!_._2).map(_._1).sorted
    val test = rows.filter(_._2).map(_._1).sorted
    val na = train.length.toLong; val nb = test.length.toLong
    val values = (train ++ test).distinct.sorted
    val gaps = values.map { v =>
      val ca = train.count(_ <= v).toLong
      val cb = test.count(_ <= v).toLong
      v -> math.abs(ca.toDouble / na - cb.toDouble / nb)
    }
    val best = gaps.maxBy { case (v, g) => (g, -v) }
    val Array(r) = ops.TextOps.ksSplitDrift(spark, TestSpark.sf0001)
      .collect()
    assert(r.getLong(0) === na && r.getLong(1) === nb)
    assert(r.getDouble(2) === best._2)
    assert(gaps.toMap.apply(r.getLong(3)) === r.getDouble(2))
  }

  test("psiValueDrift: bins cover all events in each window, shares " +
      "carry the 1e-4 floor, the psi column is the same associative " +
      "decimal total on every row, and contributions match a driver-side " +
      "recompute") {
    val d = TestSpark.sf0001
    val got = EventOps.psiValueDrift(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got.map(_._1).toSeq === (0L to 9L))
    // driver-side replay
    val ev = Tables.events(spark, d)
      .select(col("ts").cast("double"), col("value"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val lo = ev.map(_._1).min; val hi = ev.map(_._1).max
    val base = ev.filter(_._1 < lo + 604800d).map(_._2)
    val cur = ev.filter(_._1 >= hi - 604800d).map(_._2)
    assert(got.map(_._2).sum === base.length.toLong)
    assert(got.map(_._3).sum === cur.length.toLong)
    val sortedB = base.sorted
    val bps = (1 to 9).map(p =>
      sortedB(math.max(1, (10 * p * sortedB.length + 99) / 100) - 1))
    def bin(v: Double): Int = bps.indexWhere(v <= _) match {
      case -1 => 9; case i => i
    }
    val nb = base.length.toDouble; val nc = cur.length.toDouble
    val wantContrib = (0 to 9).map { b =>
      val p = math.max(base.count(bin(_) == b) / nb, 1e-4)
      val q = math.max(cur.count(bin(_) == b) / nc, 1e-4)
      BigDecimal((p - q) * StrictMath.log(p / q))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    got.zip(wantContrib).foreach { case (g, w) =>
      assert(BigDecimal(g._6) === w, s"bin ${g._1}")
    }
    val psi = wantContrib.sum.toDouble
    assert(got.forall(_._7 === psi))
  }

  test("skylineParts: the sort-identity frontier equals the brute-force " +
      "dominance filter, and every non-frontier part is dominated by " +
      "some frontier part") {
    val parts = Tables.part(spark, TestSpark.sf0001)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    def dominates(a: (Long, Double, Int), b: (Long, Double, Int)) =
      a._2 <= b._2 && a._3 <= b._3 && (a._2 < b._2 || a._3 < b._3)
    val want = parts.filter(p => !parts.exists(q => dominates(q, p)))
      .map(_._1).toSet
    val got = ops.Relational.skylineParts(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getLong(3)))
    assert(got.map(_._1).toSet === want)
    val frontier = got.map(g => (g._1, g._2, g._3.toInt))
    parts.filter(p => !want(p._1)).foreach { p =>
      assert(frontier.exists(f => dominates(f, p)), s"part ${p._1}")
    }
    // presentation order: ascending price, frontier sizes descend
    assert(got.map(_._2).toSeq === got.map(_._2).toSeq.sorted)
  }

  test("chisqLangLength: full R×C grid (zero-observed cells included), " +
      "margins consistent, contributions match a driver-side recompute, " +
      "and chi2 is their associative decimal total on every row") {
    val d = TestSpark.sf0001
    val docs = Tables.documents(spark, d)
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0),
        if (r.getLong(1) < 200) "short"
        else if (r.getLong(1) < 400) "medium" else "long"))
    val langs = docs.map(_._1).distinct.sorted
    val buckets = docs.map(_._2).distinct.sorted
    val n = docs.length.toDouble
    val got = ops.TextOps.chisqLangLength(spark, d).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.map(_._1).toSet ===
      (for (l <- langs; b <- buckets) yield (l, b)).toSet)
    assert(got.map(_._2).sum === docs.length.toLong)
    val contribs = got.map { case ((l, b), o, e, c, _) =>
      val rt = docs.count(_._1 == l).toLong
      val ct = docs.count(_._2 == b).toLong
      assert(o === docs.count(x => x == ((l, b))).toLong)
      assert(e === (rt * ct).toDouble / n)
      val wantC = BigDecimal((o - e) * (o - e) / e)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      assert(BigDecimal(c) === wantC, s"cell ($l,$b)")
      wantC
    }
    val chi2 = contribs.sum.toDouble
    assert(got.forall(_._5 === chi2))
  }

  test("hits: both top-10 sides match an integer driver-side replay of " +
      "the 4 scaled half-rounds, and each side's max-normalized leader " +
      "scores exactly 1.0") {
    val d = TestSpark.sf0001
    val edges = Tables.orders(spark, d).select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(spark, d).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("p"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    var hub = edges.map(_._1).distinct.map(_ -> 1000000L).toMap
    var auth = Map.empty[Long, Long]
    for (_ <- 1 to 4) {
      val ar = edges.groupBy(_._2).map { case (p, es) =>
        p -> es.map(e => hub(e._1)).sum
      }
      val am = ar.values.max
      auth = ar.map { case (p, v) => p -> v * 1000000L / am }
      val hr = edges.groupBy(_._1).map { case (c, es) =>
        c -> es.map(e => auth(e._2)).sum
      }
      val hm = hr.values.max
      hub = hr.map { case (c, v) => c -> v * 1000000L / hm }
    }
    // surfaced node ids use the trade-graph shared space:
    // customer k → 2k (hubs), supplier k → 2k+1 (authorities)
    def top10(m: Map[Long, Long], toNode: Long => Long)
        : Seq[(Long, Long, Double)] =
      m.toSeq.sortBy { case (id, v) => (-v, id) }.take(10).zipWithIndex
        .map { case ((id, v), i) => (i + 1L, toNode(id), v.toDouble / 1e6) }
    val got = ops.GraphOps.hits(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val gotAuth = got.filter(_._1 == "authority").map(g => (g._2, g._3, g._4))
    val gotHub = got.filter(_._1 == "hub").map(g => (g._2, g._3, g._4))
    assert(gotAuth.toSeq === top10(auth, p => p * 2 + 1))
    assert(gotHub.toSeq === top10(hub, c => c * 2))
    assert(gotAuth.head._3 === 1.0 && gotHub.head._3 === 1.0)
  }

  test("kcenterCoreset: the 8 picks replay a driver-side farthest-first " +
      "traversal exactly (ids AND pick similarities), picks are " +
      "distinct, and pick_sim certifies a non-decreasing cover") {
    val d = TestSpark.sf0001
    val embs = Tables.embeddings(spark, d).select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      val c = dot / (math.sqrt(na) * math.sqrt(nb))
      if (c.isNaN) -1.0
      else BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    val byId = embs.toMap
    val first = embs.map(_._1).min
    var picks = Vector((1L, first, Option.empty[Double]))
    var state = embs.filter(_._1 != first)
      .map { case (id, e) => id -> cos(e, byId(first)) }
    for (i <- 2 to 8) {
      val (id, ms) = state.minBy { case (v, m) => (m, v) }
      picks :+= ((i.toLong, id, Some(ms)))
      state = state.filter(_._1 != id)
        .map { case (v, m) => v -> math.max(m, cos(byId(v), byId(id))) }
    }
    val got = ops.SimilarityOps.kcenterCoreset(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.toVector === picks)
    assert(got.map(_._2).distinct.length === 8)
    // farthest-first: each later pick is at least as covered (its
    // nearest-center similarity never decreases round over round)
    val sims = got.flatMap(_._3)
    assert(sims.toSeq === sims.sorted.toSeq)
  }

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(cur + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  test("editVerifiedPairs: every pair is an LSH pair, edit_dist equals " +
      "a driver-side Levenshtein of the 200-char prefixes, edit_sim is " +
      "the normalized form, and maxDist=0 keeps only identical prefixes") {
    import graft.ops.DedupOps
    val d = TestSpark.sf0001
    val lshPairs = DedupOps.minhashLshPairs(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pre = Tables.documents(spark, d)
      .select(col("doc_id"), substring(col("text"), 1, 200)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = DedupOps.editVerifiedPairs(spark, d).collect()
      .map(r => ((r.getLong(1), r.getLong(0)), r.getLong(2),
        r.getDouble(3)))
    assert(got.nonEmpty)
    got.foreach { case ((b, a), dist, sim) =>
      assert(lshPairs((a, b)))
      val wd = lev(pre(a), pre(b))
      assert(dist === wd.toLong && wd <= 16)
      assert(sim === 1.0 - dist.toDouble /
        math.max(pre(a).length, pre(b).length))
    }
    val strict = DedupOps.editVerifiedPairs(spark, d, maxDist = 0)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getLong(2)))
    assert(strict.forall(_._3 === 0L))
    assert(strict.forall { case (b, a, _) => pre(a) == pre(b) })
    assert(strict.length ===
      got.count { case ((b, a), _, _) => pre(a) == pre(b) })
  }

  test("simhashAudit: the single audit row recomputes exactly from the " +
      "two registered detectors' collected pair sets, with consistent " +
      "margins") {
    import graft.ops.DedupOps
    val d = TestSpark.sf0001
    val sp = DedupOps.simhashPairs(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ep = DedupOps.ngramJaccardPairs(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val Array(r) = DedupOps.simhashAudit(spark, d).collect()
    val (tp, fp, fn) = ((sp & ep).size.toLong, (sp -- ep).size.toLong,
      (ep -- sp).size.toLong)
    assert(r.getLong(0) === sp.size.toLong)
    assert(r.getLong(1) === ep.size.toLong)
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((tp, fp, fn)))
    assert(r.getLong(0) === r.getLong(2) + r.getLong(3))
    assert(r.getLong(1) === r.getLong(2) + r.getLong(4))
    if (tp + fp > 0) assert(r.getDouble(5) === tp.toDouble / (tp + fp))
    if (tp + fn > 0) assert(r.getDouble(6) === tp.toDouble / (tp + fn))
  }

  test("pitJoin: the union-sort pick equals a direct driver-side " +
      "[valid_from, valid_to) range lookup for every probe, rolled up") {
    val d = TestSpark.sf0001
    val orders = Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderdate").cast("timestamp").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))
    val versions = orders.groupBy(_._2).map { case (c, os) =>
      val sorted = os.sortBy(o => (o._4, o._1))
      // [valid_from, valid_to) ranges; zero-width rows can never match
      c -> sorted.zipWithIndex.map { case (o, i) =>
        val to = if (i + 1 < sorted.length) Some(sorted(i + 1)._4)
        else None
        (o._4, to, o._3)
      }
    }
    val probes = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_shipdate").cast("timestamp").cast("double"),
        col("l_quantity")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val custOf = orders.map(o => o._1 -> o._2).toMap
    val agg = scala.collection.mutable.Map
      .empty[Option[String], (Long, BigDecimal)]
    probes.foreach { case (ok, ts, qty) =>
      val vs = versions(custOf(ok))
      val hit = vs.filter(v => v._1 <= ts && v._2.forall(ts < _))
      assert(hit.length <= 1, s"probe $ok matched ${hit.length} versions")
      // a probe before the first version has no as-of row: NULL status
      val st = hit.headOption.map(_._3)
      val (n0, s0) = agg.getOrElse(st, (0L, BigDecimal(0)))
      agg(st) = (n0 + 1,
        s0 + BigDecimal(qty).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    }
    assert(agg.contains(None), "fixture must exercise the NULL branch")
    val got = ops.Relational.pitJoin(spark, d).collect()
      .map(r => Option(r.getString(0)) -> (r.getLong(1), r.getDouble(2)))
    assert(got.toMap ===
      agg.toMap.map { case (k, (n, s)) => k -> (n, s.toDouble) })
    // NULL group first, then ascending status — both engines' contract
    assert(got.map(_._1).toSeq ===
      got.map(_._1).toSeq.sortBy(o => (o.isDefined, o.getOrElse(""))))
  }

  test("ssspFromEdges: multi-hop relaxation beats the direct edge, the " +
      "round cap freezes the k-round state exactly, unreached nodes " +
      "stay absent, and the fixture entry returns the seed band") {
    import spark.implicits._
    import graft.ops.GraphOps
    def edges(ts: (Long, Long, Long)*) = ts.toDF("src", "dst", "w")
    def seeds(ns: Long*) = ns.toDF("node")
    // A=2 (customer parity), B=4, C=3 (supplier parity), D=5.
    // Direct A->B costs 1000, but A->C->D->B costs 300: rounds 2 and 3
    // must IMPROVE B below the round-1 estimate.
    val g = edges((2L, 4L, 1000L), (2L, 3L, 100L), (3L, 5L, 100L),
      (5L, 4L, 100L))
    val full = GraphOps.ssspFromEdges(g, seeds(2L), maxRounds = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // bands of 50: A cost 0 -> band 0; C 100 -> 2; D 200 -> 4; B 300 -> 6
    assert(full === Map(
      0L -> (1L, 0L, 0L, 0L),   // A alone: customer
      2L -> (0L, 1L, 100L, 100L), // C: supplier parity
      4L -> (0L, 1L, 200L, 200L), // D: supplier parity
      6L -> (1L, 0L, 300L, 300L))) // B improved to 300 via 3 hops
    // cap at 1 round: B keeps the direct 1000 (band 20), D unreached
    val one = GraphOps.ssspFromEdges(g, seeds(2L), maxRounds = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4)))
      .toMap
    assert(one === Map(0L -> (0L, 0L), 2L -> (100L, 100L),
      20L -> (1000L, 1000L)))
    // disconnected node 7 never appears even at the full cap
    val disc = GraphOps.ssspFromEdges(
      edges((2L, 4L, 10L), (7L, 9L, 10L)), seeds(2L), maxRounds = 8)
      .agg(sum($"n_customers" + $"n_suppliers")).head.getLong(0)
    assert(disc === 2L)
    // fixture entry: seed band present, bands ascend
    val fix = GraphOps.sssp(spark, TestSpark.sf0001).collect()
    assert(fix.nonEmpty && fix.head.getLong(0) === 0L)
    assert(fix.map(_.getLong(0)).toSeq ===
      fix.map(_.getLong(0)).toSeq.sorted)
  }

  test("abTestZ: per-type arm counts, quantized means, and the Welch z " +
      "replay a driver-side recompute exactly, and the significance " +
      "flag is |z| > 1.96") {
    val got = EventOps.abTestZ(spark, TestSpark.sf0001).collect()
    assert(got.nonEmpty)
    val ev = rawEvents
    got.foreach { r =>
      val t = r.getString(0)
      def arm(a: Int) = ev.filter(e => e._4 == t && e._1 % 2 == a)
        .map(e => BigDecimal(e._5)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP))
      val (va, vb) = (arm(0), arm(1))
      assert(r.getLong(1) === va.length.toLong)
      assert(r.getLong(3) === vb.length.toLong)
      def mean(v: Seq[BigDecimal]) = v.sum.toDouble / v.length
      assert(r.getDouble(2) === mean(va))
      assert(r.getDouble(4) === mean(vb))
      def vr(v: Seq[BigDecimal]) =
        (v.map(x => x * x).sum.toDouble
          - v.sum.toDouble * v.sum.toDouble / v.length) / (v.length - 1)
      val z = (mean(va) - mean(vb)) /
        math.sqrt(vr(va) / va.length + vr(vb) / vb.length)
      assert(r.getDouble(5) === z)
      assert(r.getBoolean(6) === (math.abs(z) > 1.96))
    }
    // the fixture must exercise both arms non-trivially
    assert(got.forall(r => r.getLong(1) > 30 && r.getLong(3) > 30))
  }

  test("abPowerMde: pooled variance and the 5%/80% minimum detectable " +
      "effect replay a driver-side recompute exactly, and MDE shrinks " +
      "with more traffic") {
    val ev = rawEvents
    val got = EventOps.abPowerMde(spark, TestSpark.sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val t = r.getString(0)
      def arm(a: Int) = ev.filter(e => e._4 == t && e._1 % 2 == a)
        .map(e => BigDecimal(e._5)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP))
      val (va, vb) = (arm(0), arm(1))
      assert(r.getLong(1) === va.length.toLong)
      assert(r.getLong(2) === vb.length.toLong)
      def ss(v: Seq[BigDecimal]) =
        v.map(x => x * x).sum.toDouble -
          v.sum.toDouble * v.sum.toDouble / v.length
      val pooled = (ss(va) + ss(vb)) / (va.length + vb.length - 2).toDouble
      assert(r.getDouble(3) === pooled)
      val mde = 2.8016 *
        math.sqrt(pooled * (1.0 / va.length + 1.0 / vb.length))
      assert(r.getDouble(4) === mde)
      val grand = (va.sum + vb.sum).toDouble / (va.length + vb.length)
      assert(r.getDouble(5) === mde / grand)
      assert(mde > 0)
      // sensitivity improves with n: doubling both arms shrinks MDE /sqrt2
      val mde2 = 2.8016 *
        math.sqrt(pooled * (0.5 / va.length + 0.5 / vb.length))
      assert(mde2 < mde)
    }
  }

  test("abSrmCheck: per-type distinct-user arm counts match a driver-side " +
      "set replay, the chi-square is the exact (d*d)/n double, and the " +
      "flag fires iff chi_sq > 3.841") {
    val ev = rawEvents
    val got = EventOps.abSrmCheck(spark, TestSpark.sf0001).collect()
    assert(got.nonEmpty)
    assert(got.map(_.getString(0)).toSeq ===
      got.map(_.getString(0)).toSeq.sorted)
    got.foreach { r =>
      val t = r.getString(0)
      val users = ev.filter(_._4 == t).map(_._1).distinct
      val na = users.count(_ % 2 == 0).toLong
      val nb = users.count(_ % 2 == 1).toLong
      assert(r.getLong(1) === na)
      assert(r.getLong(2) === nb)
      val chi = (na - nb).toDouble * (na - nb).toDouble / (na + nb).toDouble
      assert(r.getDouble(3) === chi)
      assert(r.getBoolean(4) === (chi > 3.841))
    }
  }

  test("abCuped: theta, raw means, and CUPED-adjusted means replay a " +
      "driver-side recompute exactly, and the adjustment preserves the " +
      "pooled mean (sum of adjustments ~ 0)") {
    val evUs = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val mid = (evUs.map(_._2).min + evUs.map(_._2).max) / 2
    def q2(v: Double) =
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val perUser = evUs.groupBy(_._1).map { case (u, rows) =>
      (u, rows.filter(_._2 < mid).map(r => q2(r._3)).sum,
        rows.filter(_._2 >= mid).map(r => q2(r._3)).sum)
    }.toSeq
    val n = perUser.length.toDouble
    val sx = perUser.map(_._2).sum.toDouble
    val sy = perUser.map(_._3).sum.toDouble
    val sxy = perUser.map(r => r._2 * r._3).sum.toDouble
    val sxx = perUser.map(r => r._2 * r._2).sum.toDouble
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val meanX = sx / n
    val adj = perUser.map { case (u, x, y) =>
      (u % 2, y, BigDecimal(y.toDouble - theta * (x.toDouble - meanX))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP))
    }
    val got = EventOps.abCuped(spark, TestSpark.sf0001).collect()
    assert(got.length === 2)
    got.foreach { r =>
      val arm = r.getLong(0)
      val rows = adj.filter(_._1 == arm)
      assert(r.getLong(1) === rows.length.toLong)
      assert(r.getDouble(2) === rows.map(_._2).sum.toDouble / rows.length)
      assert(r.getDouble(3) === rows.map(_._3).sum.toDouble / rows.length)
      assert(r.getDouble(4) === theta)
    }
    // CUPED must not move the pooled mean: total adjustment is
    // -theta * sum(x - mean_x), which is 0 up to quantization
    val drift = adj.map(_._3).sum.toDouble - perUser.map(_._3.toDouble).sum
    assert(math.abs(drift) < 1e-4 * perUser.length)
    // and the fixture must give a non-degenerate covariate
    assert(!theta.isNaN && theta != 0.0)
  }

  test("survivalHazard: per-day event counts, at-risk sets, hazards, and " +
      "the running cumulative hazard replay a driver-side Nelson-Aalen " +
      "recompute with censoring at the observation end") {
    val evUs = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        when(col("event_type") === "purchase" && col("value") > 180,
          lit(true)).otherwise(lit(false)).as("conv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val tend = evUs.map(_._2).max
    val durs = evUs.groupBy(_._1).toSeq.map { case (_, rows) =>
      val t0 = rows.map(_._2).min
      val tp = rows.filter(_._3).map(_._2).minOption
      tp match {
        case Some(t) => ((t - t0) / 86400000000L, true)
        case None    => ((tend - t0) / 86400000000L, false)
      }
    }
    val got = EventOps.survivalHazard(spark, TestSpark.sf0001).collect()
    assert(got.nonEmpty)
    assert(got.map(_.getLong(0)).toSeq === got.map(_.getLong(0)).toSeq.sorted)
    var cum = BigDecimal(0)
    got.foreach { r =>
      val day = r.getLong(0)
      val nRisk = durs.count(_._1 >= day).toLong
      val dEv = durs.count(x => x._1 == day && x._2).toLong
      assert(r.getLong(1) === nRisk)
      assert(r.getLong(2) === dEv)
      assert(dEv > 0)
      val hz = dEv.toDouble / nRisk.toDouble
      assert(r.getDouble(3) === hz)
      cum += BigDecimal(hz).setScale(10, BigDecimal.RoundingMode.HALF_UP)
      assert(r.getDouble(4) === cum.toDouble)
    }
    // every event day present: output days == distinct observed-event days
    assert(got.map(_.getLong(0)).toSet ===
      durs.filter(_._2).map(_._1).toSet)
    // censoring must actually occur in the fixture (some user never buys)
    assert(durs.exists(!_._2))
  }

  test("benfordAudit: digit counts replay a driver-side first-digit " +
      "census, chi terms match the exact recompute, all 9 digits are " +
      "present, and the total equals the quantized term sum on every row") {
    val amounts = Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_extendedprice")).collect().map(_.getDouble(0))
    val want = amounts
      .map(v => BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .toString.dropWhile(c => !(c >= '1' && c <= '9')).head.asDigit.toLong)
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val benford = Map(1 -> 0.3010299957, 2 -> 0.1760912591,
      3 -> 0.1249387366, 4 -> 0.0969100130, 5 -> 0.0791812460,
      6 -> 0.0669467896, 7 -> 0.0579919470, 8 -> 0.0511525224,
      9 -> 0.0457574906)
    val n = amounts.length.toDouble
    val got = ops.Relational.benfordAudit(spark, TestSpark.sf0001).collect()
    assert(got.map(_.getLong(0)).toSeq === (1L to 9L))
    var tot = BigDecimal(0)
    got.foreach { r =>
      val dg = r.getLong(0)
      val obs = want.getOrElse(dg, 0L)
      assert(r.getLong(1) === obs)
      val p = benford(dg.toInt)
      assert(r.getDouble(2) === p)
      val en = p * n
      assert(r.getDouble(3) === en)
      val chi = (obs.toDouble - en) * (obs.toDouble - en) / en
      tot += BigDecimal(chi).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    got.foreach(r => assert(r.getDouble(5) === tot.toDouble))
    assert(want.values.sum === amounts.length.toLong)
  }

  test("jaccardFromEdges: hand graphs score exactly (diamond diagonal " +
      "J=1, path-star candidates J=1/3 tie-broken on (u,v)), adjacent " +
      "pairs never appear, and the fixture run replays a driver-side " +
      "census") {
    import spark.implicits._
    import graft.ops.GraphOps
    def und(pairs: (Long, Long)*) = pairs.toDF("a", "b")
    // diamond 1-2-4-3-1 plus chord 2-3: the only non-adjacent pair is
    // (1,4), sharing both of its endpoints' entire neighborhoods
    val diamond = GraphOps.jaccardFromEdges(
      und((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)), 10).collect()
    assert(diamond.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq ===
      Seq((1L, 4L, 2L, 2L, 2L, 1.0)))
    // triangle 1-2-3 with pendant path 1-4-5: three candidates all at
    // J = 1/3, surfaced in (u, v) tie order
    val path = GraphOps.jaccardFromEdges(
      und((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (4L, 5L)), 10).collect()
    assert(path.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 5L), (2L, 4L), (3L, 4L)))
    path.foreach(r => assert(r.getDouble(5) === 1.0 / 3.0))
    // fixture: full driver-side replay of the top-30
    val d = TestSpark.sf0001
    val edges = GraphOps.coPurchaseEdges(spark, d)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nbr = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val edgeSet = edges.toSet
    val cand = nbr.keys.toSeq.combinations(2).map(_.sorted)
      .map { case Seq(u, v) => (u, v) }
      .filter { case (u, v) => !edgeSet((u, v)) }
      .map { case (u, v) =>
        val c = (nbr(u) & nbr(v)).size.toLong
        (u, v, c, nbr(u).size.toLong, nbr(v).size.toLong,
          c.toDouble / (nbr(u).size + nbr(v).size - c).toDouble)
      }
      .filter(_._3 > 0).toSeq
      .sortBy { case (u, v, _, _, _, j) => (-j, u, v) }
      .take(30)
    val got = GraphOps.jaccardNeighbors(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq === cand)
    assert(got.nonEmpty)
  }

  test("ewmaDaily: every (type, day) smoothed value replays the exact " +
      "power-of-two weighted sum, and tracks the sequential recurrence " +
      "S_t = x_t/2 + S_{t-1}/2 to quantization error") {
    val evd = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_type"), expr("unix_micros(ts)").as("us"),
        col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def q2(v: Double) =
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val daily = evd.groupBy(r => (r._1, r._2 / 86400000000L)).toSeq
      .map { case ((t, dref), rows) => (t, dref, rows.map(r => q2(r._3)).sum) }
    val d0 = daily.map(_._2).min
    val byDay = daily.map { case (t, dref, x) => ((t, dref - d0), x) }.toMap
    val want = byDay.map { case ((t, day), xq) =>
      val terms = (0L to math.min(day, 39L)).flatMap { back =>
        byDay.get((t, day - back)).map { xb =>
          xb * BigDecimal(1L << (39 - back))
        }
      }
      ((t, day), (xq.toDouble, terms.sum.toDouble / 1099511627776.0))
    }
    val got = EventOps.ewmaDaily(spark, TestSpark.sf0001).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3))))
    assert(got.toMap === want)
    assert(got.map(_._1).toSeq === got.map(_._1).toSeq.sorted)
    // the closed form must track the textbook recurrence: on
    // contiguous days, S_t - (x_t/2 + S_{t-1}/2) is only the dropped
    // >60-day tail plus per-term quantization — far below 1e-6
    val gm = got.toMap
    var checked = 0
    gm.foreach { case ((t, day), (x, s)) =>
      gm.get((t, day - 1)).foreach { case (_, sPrev) =>
        assert(math.abs(s - (x / 2 + sPrev / 2)) < 1e-6)
        checked += 1
      }
    }
    assert(checked > 10)
  }

  test("theilSenTrend: slope and intercept equal the driver-side lower " +
      "medians of pairwise slopes and residuals, and one corrupted day " +
      "cannot move the estimator (breakdown sanity)") {
    val evd = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_type"), expr("unix_micros(ts)").as("us"),
        col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def q2(v: Double) =
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val daily = evd.groupBy(r => (r._1, r._2 / 86400000000L)).toSeq
      .map { case ((t, dref), rows) =>
        (t, dref, rows.map(r => q2(r._3)).sum.toDouble)
      }
    val d0 = daily.map(_._2).min
    val want = daily.groupBy(_._1).map { case (t, rows) =>
      val pts = rows.map(r => (r._2 - d0, r._3)).sortBy(_._1)
      val slopes = (for {
        (di, yi) <- pts; (dj, yj) <- pts if di < dj
      } yield (((yj - yi) / (dj - di).toDouble), di, dj)).sortBy(x => (x._1, x._2, x._3))
      val slope = slopes((slopes.length + 1) / 2 - 1)._1
      val resid = pts.map { case (dd2, y) => (y - slope * dd2.toDouble, dd2) }
        .sortBy(identity)
      val intercept = resid((resid.length + 1) / 2 - 1)._1
      t -> (pts.length.toLong, slopes.length.toLong, slope, intercept)
    }
    val got = EventOps.theilSenTrend(spark, TestSpark.sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toMap === want)
    assert(got.map(_._1).toSeq === got.map(_._1).toSeq.sorted)
    // breakdown sanity on a synthetic series: y = 2d + 1 with one wild
    // outlier — the pairwise-slope lower median stays 2
    val pts = (0L to 10L).map(dd2 => (dd2, 2.0 * dd2 + 1)) :+ (11L, 1e6)
    val sl = (for { (di, yi) <- pts; (dj, yj) <- pts if di < dj }
      yield (yj - yi) / (dj - di).toDouble).sorted
    assert(sl((sl.length + 1) / 2 - 1) === 2.0)
  }

  test("sceneDetect: per-frame lumas, deltas, and cut flags replay a " +
      "driver-side stride-1 recompute over the video payloads, first " +
      "frames always open a scene, and the fixture yields both cuts " +
      "and non-cuts") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.filter(_._1 % 3 == 2).flatMap { case (id, text) =>
      val b = text.getBytes("UTF-8")
      val n = math.max(1, b.length / 256)
      val lumas = (0 until n).map { f =>
        val from = f * 256
        val until = math.min(b.length, from + 256)
        val sum = (from until until).map(i => (b(i) & 0xFF).toLong).sum
        sum.toDouble / (until - from).toDouble
      }
      lumas.zipWithIndex.map { case (l, f) =>
        val delta = if (f == 0) None else Some(math.abs(l - lumas(f - 1)))
        ((id, f.toLong), (l, delta, delta.forall(_ > 1.0)))
      }
    }.toMap
    val got = ops.Multimodal.sceneDetect(spark, TestSpark.sf0001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          r.getBoolean(4))))
    assert(got.toMap === want)
    assert(got.map(_._1).toSeq === got.map(_._1).toSeq.sorted)
    // first frame of every video is a scene start with NULL delta
    got.filter(_._1._2 == 0L).foreach { case (_, (_, dl, cut)) =>
      assert(dl.isEmpty && cut)
    }
    // detector must be exercised in both directions on the fixture
    val later = got.filter(_._1._2 > 0L)
    assert(later.exists(_._2._3) && later.exists(!_._2._3))
  }

  test("centroidDrift: per-label split sizes and the centroid cosine " +
      "replay a driver-side recompute through the same decimal " +
      "quantizations, every label appears, and cosines are valid") {
    val vecs = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).toArray))
    def q10(v: Double) =
      BigDecimal(v).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    def q12(v: Double) =
      BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val want = vecs.groupBy(_._2).map { case (label, rows) =>
      def centroid(side: Long): (Long, Array[Double]) = {
        val vs = rows.filter(_._1 % 2 == side).map(_._3)
        val dims = vs.head.length
        (vs.length.toLong, Array.tabulate(dims) { p =>
          vs.map(v => q10(v(p).toDouble)).sum.toDouble / vs.length
        })
      }
      val (na, ca) = centroid(0)
      val (nb, cb) = centroid(1)
      val dot = ca.zip(cb).map { case (x, y) => q12(x * y) }.sum.toDouble
      val naa = ca.map(x => q12(x * x)).sum.toDouble
      val nbb = cb.map(y => q12(y * y)).sum.toDouble
      label -> (na, nb, dot / (math.sqrt(naa) * math.sqrt(nbb)))
    }
    val got = ops.SimilarityOps.centroidDrift(spark, TestSpark.sf0001)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toMap === want)
    assert(got.map(_._1).toSeq === got.map(_._1).toSeq.sorted)
    assert(got.map(_._1).toSet === vecs.map(_._2).toSet)
    got.foreach { case (_, (na, nb, cos)) =>
      assert(na > 0 && nb > 0)
      assert(cos >= -1.0 - 1e-9 && cos <= 1.0 + 1e-9)
    }
  }
}
