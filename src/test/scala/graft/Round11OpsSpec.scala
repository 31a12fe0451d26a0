package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{EventOps, GraphOps}

/** Round-11 hardening: the degree-domain suffix-cumsum identity that
  * de-cartesianed graph_powerlaw_fit/graph_rich_club, the de-vacuated
  * user-entropy histogram, and the markovStationary driver-math port.
  */
class Round11OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("degreeSuffixCounts ≡ the naive threshold-grid join it replaced " +
      "(random histograms × weight shapes, incl. zero weights and a " +
      "1-row domain)") {
    val rnd = new scala.util.Random(7)
    val cases = Seq(1, 2, 5, 40).map { domain =>
      // strictly increasing (UNIQUE) degrees with random gaps — a
      // histogram keyed by deg, as groupBy("deg") produces; weights
      // include occasional zeros
      var d = 0L
      (0 until domain).map { _ =>
        d += 1 + rnd.nextInt(3)
        (d, 1L + rnd.nextInt(9).toLong, rnd.nextInt(5).toLong)
      }
    }
    cases.foreach { hist =>
      val df = hist.toDF("deg", "n", "ne")
      val got = GraphOps.degreeSuffixCounts(df, strict = Seq("n", "ne"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
      hist.foreach { case (k, _, _) =>
        val nGt = hist.filter(_._1 > k).map(_._2).sum
        val neGt = hist.filter(_._1 > k).map(_._3).sum
        assert(got(k) === ((nGt, neGt)),
          s"suffix sums at deg=$k, domain=${hist.size}")
      }
    }
  }

  test("richClubFromEdges on a hand 4-clique + pendant: exact N_k/E_k " +
      "suffix counts and phi, no cartesian anywhere in the plan") {
    // nodes 1..4 form a clique (deg 3,3,3,4? no — plain K4: deg 3 each);
    // node 5 hangs off node 1 (deg(1)=4, deg(5)=1)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L)).toDF("a", "b")
    val got = GraphOps.richClubFromEdges(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    // degrees: 1→4, 2/3/4→3, 5→1; histogram {1:1, 3:3, 4:1}
    // edgeMin m=min(da,db): (1,2)(1,3)(1,4)→3, clique pairs→3, (1,5)→1
    //   → {1:1, 3:6}
    // k=1: N=4 (deg>1), E=6 (m>1), phi=12/12=1
    // k=3: N=1 (deg>3), E=0, phi=null (N<2)
    // k=4: N=0, E=0, phi=null
    assert(got.toSeq === Seq(
      (1L, 4L, 6L, Some(1.0)),
      (3L, 1L, 0L, None),
      (4L, 0L, 0L, None)))
    val plan = GraphOps.richClubFromEdges(edges)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "rich-club suffix counts must be the O(D) cumsum, not a grid join")
  }

  test("userEntropyFrom pins the 1/64-nat bucket arithmetic on hand " +
      "mixes (single-type H=0, uniform-2 H=ln2, 1:3 skewed)") {
    def q(x: Double): BigDecimal =
      BigDecimal.decimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val ev = (Seq.fill(4)((1L, "a"))
      ++ Seq.fill(2)((2L, "a")) ++ Seq.fill(2)((2L, "b"))
      ++ Seq((3L, "a")) ++ Seq.fill(3)((3L, "b")))
      .toDF("user_id", "event_type")
    val got = EventOps.userEntropyFrom(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val h1 = q(-1.0 * math.log(1.0)) // 0
    val h2 = q(-0.5 * math.log(0.5)) * 2
    val h3 = q(-0.25 * math.log(0.25)) + q(-0.75 * math.log(0.75))
    def bucket(h: BigDecimal): Long = math.floor(h.toDouble * 64).toLong
    val want = Seq(h1, h2, h3).groupBy(bucket)
      .map { case (b, hs) =>
        (b, hs.size.toLong, hs.sum.toDouble / hs.size) }
      .toSeq.sortBy(_._1)
    assert(got.toSeq === want)
    // the three hand mixes land in three DISTINCT buckets — the grain
    // actually separates behavioral profiles
    assert(got.length === 3)
  }

  test("ev_user_entropy is non-vacuous at the spec fixture: ≥ 3 buckets " +
      "(the 0.25-nat grain collapsed the sf0.01 gate row to ONE bucket " +
      "— the round-10 semi-vacuity flag)") {
    val n = EventOps.userEntropy(spark, TestSpark.sf0001).count()
    assert(n >= 3, s"entropy histogram has $n buckets — grain too coarse")
  }

  test("anfDiameterFromEdges on the hand path P5 (all nodes audited): " +
      "exact 13/19/23 pair curve, the integer 10·p ≥ 9·P rule names " +
      "r=3, and the sketch names the same radius") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val got = GraphOps.anfDiameterFromEdges(edges, maxR = 3, auditMod = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3), r.getBoolean(4)))
    // P5 ordered (src, node) pairs with dist ≤ r, self included:
    // r=1 → 13, r=2 → 19, r=3 → 23 (the graph_anf fixture counts);
    // 10·13 < 9·23 and 10·19 < 9·23, 10·23 ≥ 9·23 → eff. diameter 3
    assert(got.toSeq === Seq(
      (1L, 13L, 13.0 / 23.0, false, true),
      (2L, 19L, 19.0 / 23.0, false, true),
      (3L, 23L, 1.0, true, true)))
  }

  test("markovStationary driver-math port: output rows sum to ~1, " +
      "positive everywhere, gap = stationary - empirical") {
    val rows = EventOps.markovStationary(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-9)
    rows.foreach { case (st, v, e, g) =>
      assert(v > 0, s"stationary($st)")
      assert(math.abs(g - (v - e)) < 1e-15, s"gap($st)")
    }
  }
}
