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
        """"probe":{"before":0.61,"after":0.55,"score":0.55}}""")
    val (meds, probe) = BenchMath.lastHistoryEntry(lines, "/data/sf0.01")
    assert(meds === Map("a" -> 0.5, "b" -> 1.5))
    assert(probe === 0.55)
    // pre-calibration line: medians parse, probe reads 0 → ratio 1
    val (m2, p2) = BenchMath.lastHistoryEntry(lines.take(3), "/data/sf0.01")
    assert(m2 === Map("a" -> 0.4, "b" -> 1.25))
    assert(p2 === 0.0)
    // no matching sf → empty, never a crash
    assert(BenchMath.lastHistoryEntry(lines, "/nope")._1.isEmpty)
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
