package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's host-calibrated regression arithmetic (BenchMath) —
  * the round-5 postmortem fix: a degraded VM ran identical code ~3×
  * slower and the raw seconds-vs-history comparison minted 14 phantom
  * regressions. These tests replay exactly that scenario.
  */
class BenchSanitySpec extends AnyFunSuite {

  // prev history: query "a" measured median 1.0 s, on a host whose
  // calibration probe scored 0.5 s
  private val prev = Map("a" -> 1.0)

  test("3x-degraded host cannot mint a phantom regression: unchanged " +
      "code measuring 2.8s (raw >2x prev) passes once the probe shows " +
      "the host itself is 3x slower") {
    // probe 1.5 vs 0.5 → host 3x slower → allowed = 2 * 1.0 * 3 = 6 s
    assert(BenchMath.regressed(
      Seq(("a", 2.9, 2.8)), prev, probeNow = 1.5, probePrev = 0.5).isEmpty)
  }

  test("same host: a genuine 2x+ slowdown still flags") {
    assert(BenchMath.regressed(
      Seq(("a", 2.9, 2.8)), prev, probeNow = 0.5, probePrev = 0.5)
      === Seq("a"))
  }

  test("faster host clamps to the raw threshold (ratio never < 1): a " +
      "query at 2.8s flags even though the host got 3x faster") {
    assert(BenchMath.hostRatio(0.17, 0.5) === 1.0)
    assert(BenchMath.regressed(
      Seq(("a", 2.9, 2.8)), prev, probeNow = 0.17, probePrev = 0.5)
      === Seq("a"))
  }

  test("pre-calibration history (no probe) falls back to the raw " +
      "comparison; boundary is strict (min == 2x prev does not flag)") {
    assert(BenchMath.hostRatio(1.5, 0.0) === 1.0)
    assert(BenchMath.regressed(
      Seq(("a", 2.9, 2.8)), prev, 1.5, 0.0) === Seq("a"))
    assert(BenchMath.regressed(
      Seq(("a", 2.1, 2.0)), prev, 0.5, 0.5).isEmpty)
  }

  test("absolute excess floor: a sub-second query past 2x its history " +
      "but under half a second of real damage never flags (the VM's " +
      "demonstrated noise band on tiny queries), while an order-of-" +
      "magnitude slip on the same query still does") {
    val tiny = Map("t" -> 0.13)
    // 0.13 -> 0.30 s: 2.3x but only +0.17 s — the observed noise band
    assert(BenchMath.regressed(
      Seq(("t", 0.31, 0.30)), tiny, 0.5, 0.5).isEmpty)
    // 0.13 -> 1.0 s: clears both the ratio and the 0.5 s floor
    assert(BenchMath.regressed(
      Seq(("t", 1.1, 1.0)), tiny, 0.5, 0.5) === Seq("t"))
    // confirm pass applies the same floor: a 0.3 s confirm rep refutes
    assert(BenchMath.confirmedRegressions(Seq("t"),
      Map("t" -> 0.30), tiny, 0.5, 0.5).isEmpty)
    assert(BenchMath.confirmedRegressions(Seq("t"),
      Map("t" -> 1.0), tiny, 0.5, 0.5) === Seq("t"))
  }

  test("failed queries, missing history, and zero prev medians never " +
      "flag") {
    assert(BenchMath.regressed(
      Seq(("a", -1.0, -1.0)), prev, 0.5, 0.5).isEmpty)
    assert(BenchMath.regressed(
      Seq(("b", 9.0, 9.0)), prev, 0.5, 0.5).isEmpty)
    assert(BenchMath.regressed(
      Seq(("a", 9.0, 9.0)), Map("a" -> 0.0), 0.5, 0.5).isEmpty)
  }

  test("lastHistoryEntry replays a recorded bench line: newest matching-" +
      "sf line wins, probe score parsed, malformed and pre-calibration " +
      "lines tolerated") {
    val lines = Seq(
      """not json at all""",
      """{"sf":"/data/sf0.1","queries":{"a":9.9},"probe":{"score":9.9}}""",
      """{"sf":"/data/sf0.01","queries":{"a":0.4,"b":1.25}}""",
      """{"sf":"/data/sf0.01","queries":{"a":0.5,"b":1.5},""" +
        """"mins":{"a":0.45,"b":1.4},""" +
        """"probe":{"before":0.61,"after":0.55,"score":0.55}}""")
    val (meds, mins, probe) =
      BenchMath.lastHistoryEntry(lines, "/data/sf0.01")
    assert(meds === Map("a" -> 0.5, "b" -> 1.5))
    assert(mins === Map("a" -> 0.45, "b" -> 1.4))
    assert(probe === 0.55)
    // pre-calibration line: medians parse, probe reads 0 → ratio 1,
    // mins empty (pre-mins line) → no mover nominations, never a crash
    val (m2, mn2, p2) = BenchMath.lastHistoryEntry(
      lines.take(3), "/data/sf0.01")
    assert(m2 === Map("a" -> 0.4, "b" -> 1.25))
    assert(mn2.isEmpty)
    assert(p2 === 0.0)
    // no matching sf → empty, never a crash
    assert(BenchMath.lastHistoryEntry(lines, "/nope")._1.isEmpty)
  }

  test("shuffleGrowth flags >1.3x byte growth past the 1 MiB floor; " +
      "lastHistoryMap parses the shuffleRead field, tolerating its " +
      "absence on older lines") {
    val prev = Map("a" -> 10e6, "b" -> 10e6, "c" -> 0.1e6, "d" -> -1.0)
    val cur = Map("a" -> 14_000_001L, // 1.4x, +4 MB → flag
      "b" -> 12_000_000L, // 1.2x → no
      "c" -> 900_000L, // 9x but under the 1 MiB absolute floor → no
      "d" -> 5_000_000L, // failed history rep → never
      "e" -> 9_000_000L) // no history → never
    assert(BenchMath.shuffleGrowth(cur, prev) === Seq("a"))
    val lines = Seq(
      """{"sf":"/d","queries":{"a":1.0}}""",
      """{"sf":"/d","queries":{"a":1.0},"shuffleRead":{"a":123.0}}""")
    assert(BenchMath.lastHistoryMap(lines, "/d", "shuffleRead")
      === Map("a" -> 123.0))
    assert(BenchMath.lastHistoryMap(lines.take(1), "/d", "shuffleRead")
      .isEmpty)
  }

  test("contentionMovers nominates median > 2x history MIN (host-scaled) " +
      "for confirmation — the round-10 unconfirmed-mover gap") {
    val prevMins = Map("a" -> 1.0, "b" -> 1.0, "c" -> -1.0)
    // a: median tripled though its min is healthy → nominated;
    // b: median within 2x → not; c: failed history min → never;
    // d: no history → never; e: failed this run → never
    val cur = Seq(("a", 3.0, 1.1), ("b", 1.9, 1.0), ("c", 9.0, 9.0),
      ("d", 9.0, 9.0), ("e", -1.0, -1.0))
    assert(BenchMath.contentionMovers(cur, prevMins, 0.5, 0.5)
      === Seq("a"))
    // 3x-slower host scales the threshold: a's 3.0 median vs 2*1.0*3
    assert(BenchMath.contentionMovers(cur, prevMins, 1.5, 0.5).isEmpty)
  }

  test("hostFingerprint is valid JSON even under a comma-decimal default " +
      "locale (a locale-formatted heap figure would corrupt the bench " +
      "line and silently disable regression gating)") {
    val old = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val s = BenchMath.hostFingerprint()
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)
      assert(node.path("maxHeapGb").isNumber, s)
      assert(node.path("cpus").asInt() > 0, s)
    } finally java.util.Locale.setDefault(old)
  }

  test("round-6 burst replay: the driver BENCH_r06 rep arrays — every " +
      "rep of adjacent queries inflated by a transient mid-run burst " +
      "while both probes read healthy — flag as candidates but are " +
      "refuted by healthy confirmation reps") {
    // the actual r6 driver line: probes 0.408/0.474 (no drift warning),
    // prev medians from the r5 healthy line, reps fully covered by the
    // burst; judge's same-commit rerun measured the confirm-rep values
    val prevR5 = Map("r_outer_counts" -> 0.45, "r_pricing_summary" -> 0.55,
      "r_promo_revenue" -> 0.42, "r_range_join" -> 0.72)
    val burst = Seq(
      ("r_outer_counts", 2.24, 1.00),
      ("r_pricing_summary", 4.95, 4.93),
      ("r_promo_revenue", 3.26, 3.10),
      ("r_range_join", 3.59, 3.54))
    val candidates = BenchMath.regressed(burst, prevR5, 0.408, 0.40)
    assert(candidates.toSet === Set("r_outer_counts", "r_pricing_summary",
      "r_promo_revenue", "r_range_join"),
      "sanity: min-of-reps + probe calibration alone still flags all four")
    val confirm = Map("r_outer_counts" -> 0.41, "r_pricing_summary" -> 0.53,
      "r_promo_revenue" -> 0.40, "r_range_join" -> 0.70)
    assert(BenchMath.confirmedRegressions(
      candidates, confirm, prevR5, 0.408, 0.40).isEmpty,
      "post-burst confirmation reps must refute every phantom")
  }

  test("confirmation rep semantics: a still-slow confirm keeps the flag; " +
      "a failed (negative) or missing confirm keeps it too (cannot " +
      "refute != refuted); host ratio applies to the confirm threshold") {
    val prevM = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0)
    val cands = Seq("a", "b", "c")
    // a: confirm 2.5 > 2*1.0 → stays; b: failed → stays; c: missing → stays
    assert(BenchMath.confirmedRegressions(cands,
      Map("a" -> 2.5, "b" -> -1.0), prevM, 0.5, 0.5) === Seq("a", "b", "c"))
    // 3x-degraded host: confirm 2.5 < 2*1.0*3 → refuted
    assert(BenchMath.confirmedRegressions(Seq("a"),
      Map("a" -> 2.5), prevM, 1.5, 0.5).isEmpty)
    // healthy confirm refutes
    assert(BenchMath.confirmedRegressions(Seq("a"),
      Map("a" -> 0.9), prevM, 0.5, 0.5).isEmpty)
  }

  test("armed byte gate: confirmed growth on unchanged input FAILS; a " +
      "confirm rep measuring healthy bytes refutes (round-11 listener-" +
      "bleed class); missing confirm keeps the flag; a moved input " +
      "signature downgrades everything (driver testdata regen)") {
    val prev = Map("a" -> 10e6, "b" -> 10e6, "c" -> 10e6)
    val grew = Seq("a", "b", "c")
    val confirm = Map(
      "a" -> 14_000_001L, // still 1.4x on re-measure → real plan change
      "b" -> 10_500_000L) // re-measure healthy → measurement artifact
    // c: no confirm → cannot refute → stays flagged
    assert(BenchMath.shuffleRegressions(grew, confirm, prev,
      inputSigNow = "s1", inputSigPrev = "s1") === Seq("a", "c"))
    // regenerated testdata: bytes legitimately move — never a failure
    assert(BenchMath.shuffleRegressions(grew, confirm, prev,
      inputSigNow = "s2", inputSigPrev = "s1").isEmpty)
    // no recorded signature yet (older history): gate stays armed
    assert(BenchMath.shuffleRegressions(grew, confirm, prev,
      inputSigNow = "s1", inputSigPrev = "") === Seq("a", "c"))
    // failed confirm profile (negative) cannot refute
    assert(BenchMath.shuffleRegressions(Seq("a"), Map("a" -> -1L), prev,
      "s1", "s1") === Seq("a"))
  }

  test("the byte gate catches a deliberately injected broadcast-threshold " +
      "flip end-to-end: profiled shuffle-read bytes of a broadcast join " +
      "vs the same query forced to shuffle both sides") {
    val spark = TestSpark.session
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def runQuery(): Long = {
      val fact = spark.range(300000L)
        .select(col("id"), (col("id") % 1000).as("k"))
      val dim = (0L until 1000L).map(k => (k, s"g${k % 7}")).toDF("k", "grp")
      val (_, prof) = Metrics.profile(spark) {
        fact.join(dim, Seq("k")).groupBy("grp")
          .agg(sum("id").as("s"))
          .write.format("noop").mode("overwrite").save()
      }
      prof.shuffleReadBytes
    }
    val healthy = TestSpark.withConfs(
      "spark.sql.adaptive.enabled" -> "false") { runQuery() }
    val flipped = TestSpark.withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") { runQuery() }
    assert(flipped > healthy,
      s"sanity: the forced SMJ must shuffle more ($healthy -> $flipped)")
    // the flip reads megabytes where the broadcast plan read ~nothing:
    // growth clears both the 1.3x factor and the 1 MiB floor → flagged
    val grew = BenchMath.shuffleGrowth(
      Map("q" -> flipped), Map("q" -> healthy.toDouble))
    assert(grew === Seq("q"),
      s"byte gate must flag the flip: $healthy -> $flipped bytes")
    // and the deterministic confirm re-measure reproduces it → FAILURE
    assert(BenchMath.shuffleRegressions(grew, Map("q" -> flipped),
      Map("q" -> healthy.toDouble), "sig", "sig") === Seq("q"))
  }

  test("contendedRun fires only on many movers with flat shuffle bytes " +
      "(the r10/r11 official-line signature), never on few movers, a " +
      "small suite share, or when bytes moved (a real plan change)") {
    assert(BenchMath.contendedRun(59, 270, shuffleFlat = true))
    assert(!BenchMath.contendedRun(7, 270, shuffleFlat = true))
    assert(!BenchMath.contendedRun(8, 270, shuffleFlat = false))
    assert(BenchMath.contendedRun(8, 266, shuffleFlat = true))
    assert(!BenchMath.contendedRun(8, 300, shuffleFlat = true))
  }

  test("round-12 17:54 replay: a +36% flat-bytes run with only 4 movers " +
      "but over-budget sub-floor excess now trips the contended marker " +
      "(the hole the >=8-mover rule left); under-budget spread and " +
      "moved bytes still do not") {
    // the r12 evening run's shape: 4 movers on a 273-query suite, broad
    // damage spread below the per-query floor (excess well past 5.0 s),
    // shuffle bytes flat — a busy VM, not a code change
    assert(BenchMath.contendedRun(4, 273, shuffleFlat = true,
      subFloorExcessSec = 5.25))
    // under the budget: band noise, not contention
    assert(!BenchMath.contendedRun(4, 273, shuffleFlat = true,
      subFloorExcessSec = 4.9))
    // bytes moved: a real plan/data change owns the damage — never stamp
    assert(!BenchMath.contendedRun(4, 273, shuffleFlat = false,
      subFloorExcessSec = 99.0))
    // the mover rule still works independently of the sub-floor clause
    assert(BenchMath.contendedRun(59, 270, shuffleFlat = true,
      subFloorExcessSec = 0.0))
  }

  test("subFloorContributors returns exactly the material sub-floor " +
      "names the re-measure pass should target: above the 0.1 s " +
      "materiality cut, below the per-query floor, host-scaled") {
    val prev = Map("a" -> 0.2, "b" -> 0.2, "c" -> 0.2, "d" -> 1.0)
    val cur = Seq(
      ("a", 0.5, 0.45), // +0.25 s sub-floor → re-measure
      ("b", 0.25, 0.24), // +0.04 s: under the materiality cut → skip
      ("c", 1.2, 1.1), // excess 0.9 s > floor → the per-query rule owns it
      ("d", 1.3, 1.25), // +0.25 s sub-floor → re-measure
      ("e", 9.0, 9.0)) // no history → never
    assert(BenchMath.subFloorContributors(cur, prev, 0.5, 0.5)
      === Seq("a", "d"))
    // a 3x-degraded host absorbs the small excesses entirely
    assert(BenchMath.subFloorContributors(cur, prev, 1.5, 0.5)
      .forall(_ == "c"))
  }

  test("heap-class filter: history readers skip lines recorded under a " +
      "different GC regime (8 GB vs 89 GB heaps), unknown heaps match " +
      "everything (old lines, callers that don't care)") {
    assert(BenchMath.sameHeapClass(8.0, 8.9))
    assert(!BenchMath.sameHeapClass(8.0, 89.0))
    assert(BenchMath.sameHeapClass(0.0, 89.0))
    assert(BenchMath.sameHeapClass(8.0, 0.0))
    val lines = Seq(
      """{"sf":"/d","queries":{"a":1.0},"probe":{"score":0.5},""" +
        """"inputSig":"big","shuffleRead":{"a":999.0},""" +
        """"host":{"cpus":32,"maxHeapGb":89.0,"arch":"amd64"}}""",
      """{"sf":"/d","queries":{"a":2.0},"probe":{"score":0.6},""" +
        """"inputSig":"small","shuffleRead":{"a":123.0},""" +
        """"host":{"cpus":32,"maxHeapGb":8.0,"arch":"amd64"}}""")
    // an 8 GB run reads the 8 GB line even though the 89 GB one is newer
    // in the other order, and vice versa
    val (meds8, _, _) = BenchMath.lastHistoryEntry(lines.reverse, "/d", 8.5)
    assert(meds8 === Map("a" -> 2.0))
    val (meds89, _, _) = BenchMath.lastHistoryEntry(lines, "/d", 89.0)
    assert(meds89 === Map("a" -> 1.0))
    assert(BenchMath.lastHistoryMap(lines, "/d", "shuffleRead", 8.0)
      === Map("a" -> 123.0))
    assert(BenchMath.lastHistoryString(lines, "/d", "inputSig", 89.0)
      === "big")
    // heap 0 (unfiltered callers / legacy behavior): newest line wins
    val (medsAny, _, _) = BenchMath.lastHistoryEntry(lines, "/d")
    assert(medsAny === Map("a" -> 2.0))
    // all history in the other class: empty maps, gating skipped — never
    // a crash, and the new line re-seeds this class's history
    assert(BenchMath.lastHistoryEntry(lines.take(1), "/d", 8.0)._1.isEmpty)
  }

  test("subFloorExcess sums only the positive sub-floor excesses the " +
      "per-query rule silences — flaggable or negative excesses stay " +
      "out, and the host ratio scales the comparison") {
    val prev = Map("a" -> 0.2, "b" -> 0.2, "c" -> 0.2, "d" -> 1.0)
    val cur = Seq(
      ("a", 0.5, 0.45), // +0.25 s sub-floor excess → counted
      ("b", 0.2, 0.18), // faster than history → not counted
      ("c", 1.2, 1.1), // excess 0.9 s > floor → the per-query rule owns it
      ("d", 1.3, 1.25), // +0.25 s sub-floor excess → counted
      ("e", 9.0, 9.0)) // no history → ignored
    val x = BenchMath.subFloorExcess(cur, prev, 0.5, 0.5)
    assert(math.abs(x - 0.5) < 1e-9, s"expected 0.25+0.25, got $x")
    // a 3x-degraded host absorbs a's and d's small excesses entirely,
    // and shrinks c's 0.9 s excess to exactly the floor — c slides from
    // the per-query rule's jurisdiction into this aggregate (the two
    // rules partition the positive-excess space at every ratio)
    val y = BenchMath.subFloorExcess(cur, prev, 1.5, 0.5)
    assert(math.abs(y - 0.5) < 1e-9, s"expected c's floored excess, got $y")
  }

  test("inputSignature is order-insensitive, size-sensitive, and " +
      "name-sensitive; lastHistoryString reads the newest matching-sf " +
      "line's string field and tolerates its absence") {
    val a = BenchMath.inputSignature(Seq("x.parquet" -> 10L, "y.parquet" -> 20L))
    val b = BenchMath.inputSignature(Seq("y.parquet" -> 20L, "x.parquet" -> 10L))
    assert(a === b)
    assert(a !== BenchMath.inputSignature(
      Seq("x.parquet" -> 11L, "y.parquet" -> 20L)))
    assert(a !== BenchMath.inputSignature(
      Seq("z.parquet" -> 10L, "y.parquet" -> 20L)))
    val lines = Seq(
      """{"sf":"/d","queries":{"a":1.0}}""",
      """{"sf":"/d","queries":{"a":1.0},"inputSig":"abc123"}""")
    assert(BenchMath.lastHistoryString(lines, "/d", "inputSig") === "abc123")
    assert(BenchMath.lastHistoryString(lines.take(1), "/d", "inputSig") === "")
    assert(BenchMath.lastHistoryString(lines, "/nope", "inputSig") === "")
  }

  test("end-to-end round-5 phantom replay: the driver's degraded-host " +
      "line vs the builder's healthy baseline — calibrated comparison " +
      "clears the uniform-slowdown phantoms raw comparison minted") {
    // healthy baseline (builder's 14:57 run shape): r_scalar_subquery
    // 0.2s, probe 0.5; degraded driver host: same code measured 1.2s
    // with the probe itself at 3.1s (6x host) — raw comparison flags,
    // calibrated does not
    val baseline = Map("r_scalar_subquery" -> 0.2)
    val current = Seq(("r_scalar_subquery", 1.2, 1.1))
    assert(BenchMath.regressed(current, baseline, 0.5, 0.5).nonEmpty,
      "sanity: raw comparison would flag")
    assert(BenchMath.regressed(current, baseline, 3.1, 0.5).isEmpty,
      "calibrated comparison must absorb the uniform host slowdown")
  }
}
