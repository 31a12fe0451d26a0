package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, EventOps}

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
