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
}
