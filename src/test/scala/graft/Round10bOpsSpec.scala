package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{EventOps, GraphOps, Multimodal, SimilarityOps, TextOps}

/** Round-10 wave-2 operators: session paths, Lorenz deciles, Markov
  * stationary mix, Burrows' Delta, dimension covariance, landmark
  * harmonic centrality, media size quantiles.
  */
class Round10bOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("pathTopK ≡ driver-side replay (per-user (ts, event_id) order, " +
      "second-truncated 30-min gaps, trigram census) on sf0.001") {
    val d = TestSpark.sf0001
    val got = EventOps.pathTopK(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val ev = Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_timestamp(ts)").as("sec"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val tri = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val s = rows.sortBy(r => (r._4, r._2)).toList // (floored sec, id)
      // NOTE: sec is the floor of ts; ordering by (sec, event_id) can
      // differ from (ts, event_id) only when two events of one user
      // share a second with out-of-id-order sub-second parts — absent
      // in the fixture; the engine orders by full ts.
      s.sliding(3).filter(_.size == 3).collect {
        case List(a, b, c)
            if b._4 - a._4 < 1800 && c._4 - b._4 < 1800 =>
          (s"${a._3}>${b._3}>${c._3}", c._1)
      }
    }
    val want = tri.groupBy(_._1).map { case (p, xs) =>
      (p, xs.size.toLong, xs.map(_._2).distinct.size.toLong)
    }.toSeq.sortBy(t => (-t._2, t._1)).take(25)
    assert(got.toSeq === want)
  }

  test("pathTopK replay caveat does not bite: no user has two events " +
      "inside one second in the fixture (makes the replay's sec-order " +
      "equal the engine's ts-order)") {
    val dups = Tables.events(spark, TestSpark.sf0001)
      .groupBy(col("user_id"), expr("unix_timestamp(ts)").as("sec"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    assert(dups === 0)
  }

  test("lorenzDeciles: NTILE replay matches exactly; cum_share is " +
      "monotone and ends at exactly 1.0; user counts cover every " +
      "purchaser") {
    val d = TestSpark.sf0001
    val got = EventOps.lorenzDeciles(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    val revs = Tables.events(spark, d)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(sum(col("value").cast("decimal(18,2)")).as("rev"))
      .collect()
      .map(r => (r.getDecimal(1), r.getLong(0)))
      .sortBy(t => (BigDecimal(t._1), t._2))
    val n = revs.size
    val q = n / 10
    val r10 = n % 10
    // SQL NTILE: first n mod k buckets get one extra row
    val bucketOf = (rank: Int) => {
      val cut = r10 * (q + 1)
      if (rank <= cut) (rank + q) / (q + 1) else r10 + (rank - cut + q - 1) / q
    }
    val byDec = revs.zipWithIndex
      .groupBy { case (_, i) => bucketOf(i + 1) }
    val total = revs.map(t => BigDecimal(t._1)).sum
    var cum = BigDecimal(0)
    (1 to 10).foreach { dec =>
      val rows = byDec(dec)
      val drev = rows.map(t => BigDecimal(t._1._1)).sum
      cum += drev
      val g = got(dec - 1)
      assert(g._2 === rows.size.toLong, s"decile $dec user count")
      assert(g._3 === drev.toDouble, s"decile $dec revenue")
      assert(g._4 === (cum.bigDecimal.doubleValue
        / total.bigDecimal.doubleValue), s"decile $dec cum share")
    }
    assert(got.map(_._2).sum === n.toLong)
    assert(got.map(_._4).sliding(2).forall(p => p(0) <= p(1)))
    assert(got.last._4 === 1.0)
  }

  test("markovStationary ≡ driver-side replay (kept/renormalized " +
      "matrix, 20 power steps, HALF_UP 1e-12 quantization per term) " +
      "and the mix sums to ~1") {
    val d = TestSpark.sf0001
    val got = EventOps.markovStationary(spark, d).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // replay
    val m = Tables.events(spark, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))))
      .filter(col("prev").isNotNull)
      .groupBy("prev", "event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val states = m.map(_._1._1).distinct.sorted
    val kept = m.filter(t => states.contains(t._1._2))
    val ni = kept.groupBy(_._1._1).map { case (k, v) => k -> v.map(_._2).sum }
    val p = kept.map { case ((a, b), n) => ((a, b), n.toDouble / ni(a)) }
      .toMap
    def quant(x: Double): BigDecimal =
      BigDecimal.decimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    var v: Map[String, BigDecimal] =
      states.map(_ -> quant(1.0 / states.size)).toMap
    (1 to 20).foreach { _ =>
      v = states.map { j =>
        j -> states.flatMap(i => p.get((i, j))
          .map(pij => quant(v(i).toDouble * pij))).sum
      }.toMap
    }
    states.foreach { st =>
      assert(got(st)._1 === v(st).toDouble, s"stationary($st)")
    }
    val sum = got.values.map(_._1).sum
    assert(math.abs(sum - 1.0) < 1e-9, s"mix sums to $sum")
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-12)
  }

  test("burrowsDelta: full pair matrix over the sources, constant " +
      "term panel ≤ 30, non-negative distances") {
    val d = TestSpark.sf0001
    val rows = TextOps.burrowsDelta(spark, d).collect()
    val nSrc = Tables.documents(spark, d).select("source").distinct()
      .count().toInt
    assert(rows.length === nSrc * (nSrc - 1) / 2)
    val panels = rows.map(_.getLong(2)).distinct
    assert(panels.length === 1 && panels.head <= 30L)
    rows.foreach(r => assert(r.getDouble(3) >= 0.0))
  }

  test("dimCovariance: d(d+1)/2 rows, constant n, unit diagonal corr, " +
      "|corr| ≤ 1, and the (0,1) entry replays exactly driver-side") {
    val d = TestSpark.sf0001
    val rows = SimilarityOps.dimCovariance(spark, d).collect()
    assert(rows.length === 64 * 65 / 2)
    assert(rows.map(_.getLong(2)).distinct.length === 1)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(4)) <= 1.0 + 1e-9,
        s"corr out of range at (${r.getLong(0)}, ${r.getLong(1)})")
      if (r.getLong(0) == r.getLong(1))
        assert(math.abs(r.getDouble(4) - 1.0) < 1e-9)
    }
    val embs = Tables.embeddings(spark, d).select("embedding").collect()
      .map(_.getSeq[Float](0))
    val n = embs.length
    def s(f: Seq[Float] => Long): Long = embs.map(f).sum
    val spq = s(e => math.floor(e(0).toDouble * e(1).toDouble * 1e9).toLong)
    val sxi = s(e => math.floor(e(0).toDouble * 1e9).toLong)
    val sxj = s(e => math.floor(e(1).toDouble * 1e9).toLong)
    val cov = spq.toDouble / 1e9 / n -
      (sxi.toDouble / 1e9 / n) * (sxj.toDouble / 1e9 / n)
    val got01 = rows.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L).get
    assert(got01.getDouble(3) === cov)
  }

  test("harmonicFromEdges on a hand path 2-4-6-8-10: single landmark " +
      "distances, two-landmark sums, and the maxHops cap") {
    import spark.implicits._
    val nodes = Seq(2L, 4L, 6L, 8L, 10L)
    val und = nodes.sliding(2).flatMap { case Seq(a, b) =>
      Seq((a, b), (b, a)) }.toSeq
    val edges = und.toDF("src", "dst")
    val one = GraphOps.harmonicFromEdges(edges, Seq(2L).toDF("seed"),
      maxHops = 8, topK = 20).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(one(4L) === 1.0)
    assert(one(6L) === 0.5)
    assert(math.abs(one(8L) - 1.0 / 3) < 1e-11)
    assert(one(10L) === 0.25)
    assert(!one.contains(2L), "a landmark's self-distance is excluded")
    val two = GraphOps.harmonicFromEdges(edges,
      Seq(2L, 10L).toDF("seed"), maxHops = 8, topK = 20).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(two(6L)._1 === 2L)
    assert(two(6L)._2 === 1.0) // 1/2 + 1/2 from both ends
    val capped = GraphOps.harmonicFromEdges(edges, Seq(2L).toDF("seed"),
      maxHops = 2, topK = 20).collect().map(_.getLong(0)).toSet
    assert(capped === Set(4L, 6L), "nodes beyond the cap are unreached")
  }

  test("pcaPower: unit loading norm, λ ≥ max diagonal variance (top-" +
      "eigenvalue lower bound), explained ∈ (0, 1], and the 50-step " +
      "iterate IS an eigenvector (small relative residual ‖Cv − λv‖)") {
    val d = TestSpark.sf0001
    val rows = SimilarityOps.pcaPower(spark, d).collect()
      .sortBy(_.getLong(0))
    val v = rows.map(_.getDouble(1))
    val lambda = rows.head.getDouble(2)
    val explained = rows.head.getDouble(3)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
    assert(explained > 0 && explained <= 1 + 1e-12)
    // replay the quantized covariance matrix driver-side
    val embs = Tables.embeddings(spark, d).select("embedding").collect()
      .map(_.getSeq[Float](0))
    val n = embs.length
    val dim = 64
    val c = Array.ofDim[Double](dim, dim)
    for (i <- 0 until dim; j <- i until dim) {
      var spq = 0L; var sxi = 0L; var sxj = 0L
      embs.foreach { e =>
        spq += math.floor(e(i).toDouble * e(j).toDouble * 1e9).toLong
        sxi += math.floor(e(i).toDouble * 1e9).toLong
        sxj += math.floor(e(j).toDouble * 1e9).toLong
      }
      val cov = spq.toDouble / 1e9 / n -
        (sxi.toDouble / 1e9 / n) * (sxj.toDouble / 1e9 / n)
      c(i)(j) = cov; c(j)(i) = cov
    }
    assert(lambda >= (0 until dim).map(i => c(i)(i)).max - 1e-12,
      "Rayleigh quotient must dominate every diagonal variance")
    val cv = (0 until dim).map(i =>
      (0 until dim).map(j => c(i)(j) * v(j)).sum)
    val resid = math.sqrt((0 until dim)
      .map(i => math.pow(cv(i) - lambda * v(i), 2)).sum)
    assert(resid / lambda < 0.01,
      s"50-step iterate is not an eigenvector: relative residual " +
        s"${resid / lambda}")
  }

  test("silhouette: every label covered, counts reconcile with the " +
      "corpus, s ∈ [-1, 1], and a driver-side replay of one vector's " +
      "(a, b) matches") {
    val d = TestSpark.sf0001
    val rows = SimilarityOps.silhouette(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3)))
    val emb = Tables.embeddings(spark, d)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    assert(rows.map(_._1).toSeq === emb.map(_._3.toLong).distinct.sorted)
    assert(rows.map(_._2).sum === emb.length.toLong)
    rows.foreach { r =>
      assert(r._3 >= -1.0 - 1e-9 && r._3 <= 1.0 + 1e-9)
      assert(r._4 <= r._2)
    }
    // replay vector 0: quantized centroid distances, a vs min-other b
    val dim = 64
    val cents = emb.groupBy(_._3).map { case (l, vs) =>
      l -> (0 until dim).map { i =>
        vs.map(v => math.floor(v._2(i).toDouble * 1e9).toLong).sum
          .toDouble / 1e9 / vs.length.toDouble
      }.toArray
    }
    val v0 = emb.find(_._1 == 0L).get
    def d2(c: Array[Double]): Double = (0 until dim).map { i =>
      math.floor((v0._2(i).toDouble - c(i)) * (v0._2(i).toDouble - c(i))
        * 1e9).toLong
    }.sum.toDouble / 1e9
    val a = math.sqrt(d2(cents(v0._3)))
    val b = math.sqrt(
      cents.filter(_._1 != v0._3).values.map(d2).min)
    val s0 = if (math.max(a, b) > 0) (b - a) / math.max(a, b) else 0.0
    // the vector's s contributes to its label's decimal mean; recompute
    // the label mean driver-side over ALL its vectors to pin the path
    val lbl = v0._3
    val sAll = emb.filter(_._3 == lbl).map { v =>
      def dd(c: Array[Double]): Double = (0 until dim).map { i =>
        math.floor((v._2(i).toDouble - c(i)) * (v._2(i).toDouble - c(i))
          * 1e9).toLong
      }.sum.toDouble / 1e9
      val av = math.sqrt(dd(cents(lbl)))
      val bv = math.sqrt(cents.filter(_._1 != lbl).values.map(dd).min)
      if (math.max(av, bv) > 0) (bv - av) / math.max(av, bv) else 0.0
    }
    assert(sAll.contains(s0))
    val mean = sAll.map(x => BigDecimal.decimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble /
      sAll.length.toDouble
    val got = rows.find(_._1 == lbl.toLong).get
    assert(got._3 === mean, s"label $lbl mean silhouette")
  }

  test("retentionFit: a real fit (≥ 3 points, non-constant shares — " +
      "the vacuity gate that forced day grain), finite slope, and the " +
      "point set replays driver-side") {
    val d = TestSpark.sf0001
    val r = EventOps.retentionFit(spark, d).collect()(0)
    val (n, slope, icept) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(n >= 3, "fixture must span enough days for a fit")
    assert(!slope.isNaN && !icept.isNaN)
    // replay the (k, retained, eligible) points at the day grain
    val uw = Tables.events(spark, d)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000")
        .as("dy")).distinct().collect()
      .map(r2 => (r2.getLong(0), r2.getLong(1)))
    val w0 = uw.groupBy(_._1).map { case (u, xs) =>
      u -> xs.map(_._2).min }
    val dmax = uw.map(_._2).max
    val retained = uw.map(t => (t._2 - w0(t._1), t._1))
      .filter(_._1 >= 1).groupBy(_._1).map { case (k, xs) =>
        k -> xs.map(_._2).distinct.size.toLong }
    val eligible = (1L to (dmax - w0.values.min)).map { k =>
      k -> w0.values.count(w => dmax - w >= k).toLong
    }.toMap
    val pts = retained.toSeq.filter(_._2 > 0)
    assert(pts.size.toLong === n, "point count")
    val shares = pts.sortBy(_._1)
      .map { case (k, ret) => ret.toDouble / eligible(k) }
    assert(shares.min < shares.max,
      "retention shares must vary — a constant-share grain makes the " +
        "fit vacuous (the weekly-saturation trap)")
  }

  test("funnelWindowed: monotone stage attrition, every stage within " +
      "the unwindowed funnel's counts, and the median gaps sit inside " +
      "the window") {
    val d = TestSpark.sf0001
    val win = EventOps.funnelWindowed(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val plain = EventOps.funnel(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(win("1_view")._1 >= win("2_click")._1)
    assert(win("2_click")._1 >= win("3_purchase")._1)
    Seq("1_view", "2_click", "3_purchase").foreach { st =>
      assert(win(st)._1 <= plain(st),
        s"windowed $st cannot out-convert the unwindowed funnel")
    }
    assert(win("1_view")._2.isEmpty)
    Seq("2_click", "3_purchase").foreach { st =>
      val p50 = win(st)._2.get
      assert(p50 > 0 && p50 <= 86400.0, s"$st median outside the window")
    }
    assert(win("2_click")._1 > 0, "fixture must convert within 24h")
  }

  test("fdAudit: key determinants hold exactly; the events candidate " +
      "replays driver-side (g3 = N − Σ_x max_a count)") {
    val d = TestSpark.sf0001
    val rows = graft.ops.Relational.fdAudit(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5), r.getDouble(6)))
    assert(rows.length === 6)
    rows.filter(t => t._2 == "c_custkey" || t._2 == "n_nationkey")
      .foreach(t => assert(t._5 === 0L && t._6,
        s"key-determined FD ${t._2} → ${t._3} must hold"))
    val ev = Tables.events(spark, d)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val g3 = ev.groupBy(_._1).map { case (_, xs) =>
      xs.size - xs.groupBy(_._2).values.map(_.size).max
    }.sum
    val got = rows.find(t => t._1 == "events").get
    assert(got._4 === ev.length.toLong)
    assert(got._5 === g3.toLong)
    assert(got._7 === g3.toDouble / ev.length.toDouble)
  }

  test("movingCorr: |corr| ≤ 1, n_days ≤ 7 and monotone to the ramp, " +
      "and one full-window day replays driver-side") {
    val d = TestSpark.sf0001
    val rows = EventOps.movingCorr(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, c) =>
      assert(n >= 1 && n <= 7)
      c.foreach(v => assert(math.abs(v) <= 1.0 + 1e-12))
    }
    // replay the last day's window from the daily frame
    val daily = Tables.events(spark, d)
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("x"),
        coalesce(sum(when(col("event_type") === "purchase",
          col("value").cast("decimal(18,2)"))),
          lit(0).cast("decimal(18,2)")).as("y"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), BigDecimal(r.getDecimal(2))))
      .sortBy(_._1)
    val last = daily.last._1
    val winRows = daily.filter(t => t._1 > last - 7 && t._1 <= last)
    val n = winRows.size.toLong
    val sx = winRows.map(t => BigDecimal(t._2)).sum.toDouble
    val sy = winRows.map(_._3).sum.toDouble
    val sxy = winRows.map(t => BigDecimal(t._2) * t._3).sum.toDouble
    val sxx = winRows.map(t => BigDecimal(t._2) * BigDecimal(t._2))
      .sum.toDouble
    val syy = winRows.map(t => t._3 * t._3).sum.toDouble
    val expected = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    val got = rows.find(_._1 == last).get
    assert(got._2 === n)
    assert(got._3.get === expected, "last-day Pearson replay")
  }

  test("rakeKeywords ≡ driver-side replay (stopword islands, " +
      "deg/freq scores, quantized phrase sums) on sf0.001") {
    val d = TestSpark.sf0001
    val got = TextOps.rakeKeywords(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val docs = Tables.documents(spark, d).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), Option(r.getString(1))
        .getOrElse("")))
    val stops = TextOps.rakeStops.toSet
    val phrases = docs.flatMap { case (_, text) =>
      val t = text.trim
      val ws = if (t.isEmpty) Array.empty[String]
        else t.toLowerCase.split("\\s+")
      // islands of consecutive non-stopwords
      val out = scala.collection.mutable.ArrayBuffer[List[String]]()
      var cur = List.empty[String]
      ws.foreach { w =>
        if (stops(w)) { if (cur.nonEmpty) out += cur.reverse; cur = Nil }
        else cur = w :: cur
      }
      if (cur.nonEmpty) out += cur.reverse
      out.filter(_.size <= 4)
    }
    val deg = scala.collection.mutable.Map[String, Long]()
    val freq = scala.collection.mutable.Map[String, Long]()
    phrases.foreach { p =>
      p.foreach { w =>
        deg(w) = deg.getOrElse(w, 0L) + p.size
        freq(w) = freq.getOrElse(w, 0L) + 1L
      }
    }
    def q(x: Double) = BigDecimal.decimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val wsc = deg.keys.map(w =>
      w -> q(deg(w).toDouble / freq(w).toDouble)).toMap
    val want = phrases.groupBy(p => p.mkString(" "))
      .map { case (ph, occs) =>
        (ph, occs.size.toLong, occs.head.map(wsc).sum.toDouble)
      }.toSeq.sortBy(t => (-t._3, t._1)).take(25)
    assert(got.toSeq === want)
  }

  test("labelConfusion: per-label shares sum to 1, row sums equal the " +
      "label counts, and vector 0's argmin replays driver-side") {
    val d = TestSpark.sf0001
    val rows = SimilarityOps.labelConfusion(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val emb = Tables.embeddings(spark, d)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    val byLabel = emb.groupBy(_._3.toLong).view.mapValues(_.length).toMap
    rows.groupBy(_._1).foreach { case (l, rs) =>
      assert(rs.map(_._3).sum === byLabel(l).toLong, s"label $l row sum")
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-9, s"label $l shares")
    }
    // replay vector 0's nearest-centroid assignment
    val dim = 64
    val cents = emb.groupBy(_._3).map { case (l, vs) =>
      l -> (0 until dim).map { i =>
        vs.map(v => math.floor(v._2(i).toDouble * 1e9).toLong).sum
          .toDouble / 1e9 / vs.length.toDouble
      }.toArray
    }
    val v0 = emb.find(_._1 == 0L).get
    val pred0 = cents.map { case (l, c) =>
      ((0 until dim).map { i =>
        math.floor((v0._2(i).toDouble - c(i)) * (v0._2(i).toDouble - c(i))
          * 1e9).toLong
      }.sum, l)
    }.min._2
    assert(rows.exists(t => t._1 == v0._3.toLong
      && t._2 == pred0.toLong && t._3 > 0),
      s"vector 0's (label ${v0._3}, pred $pred0) cell must be populated")
  }

  test("degreeGiniFromEdges on a hand star S4: G = 0.3 exactly " +
      "(degrees [1,1,1,1,4], Σ rank·deg = 30), and the fixture graph " +
      "lands in (0, 1)") {
    import spark.implicits._
    val star = (1 to 4).flatMap(i =>
      Seq((0L, i.toLong), (i.toLong, 0L))).toDF("src", "dst")
    val r = GraphOps.degreeGiniFromEdges(star).collect()(0)
    assert(r.getLong(0) === 5L)
    assert(r.getLong(1) === 8L)
    assert(r.getDouble(2) === 2.0 * 30 / (5.0 * 8) - 6.0 / 5)
    val f = GraphOps.degreeGini(spark, TestSpark.sf0001).collect()(0)
    assert(f.getDouble(2) > 0 && f.getDouble(2) < 1)
  }

  test("sizeQuantiles ≡ driver-side ceil-rank replay per kind") {
    val d = TestSpark.sf0001
    val got = Multimodal.sizeQuantiles(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val lens = Tables.documents(spark, d)
      .select(col("doc_id"), length(col("text")).cast("long").as("nb"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // ASCII fixture text ⇒ octet_length == char length; assert that
    // premise so a future non-ASCII fixture fails loudly here
    val bytes = Tables.documents(spark, d)
      .select(octet_length(encode(col("text"), "UTF-8")).cast("long"))
      .collect().map(_.getLong(0)).sorted
    assert(bytes.toSeq === lens.map(_._2).sorted.toSeq)
    val kinds = Array("image", "audio", "video")
    lens.groupBy(t => kinds((t._1 % 3).toInt)).foreach { case (k, xs) =>
      val s = xs.map(_._2).sorted
      def qq(p: Int) = s(math.max(1, (p * s.length + 99) / 100) - 1)
      assert(got(k) === ((s.length.toLong, qq(25), qq(50), qq(75), qq(95))),
        s"kind $k")
    }
  }
}
