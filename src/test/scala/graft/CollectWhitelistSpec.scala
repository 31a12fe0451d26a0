package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Pins SCALE.md's "no collect-and-loop" claim: every `.collect()` in
  * `src/main` must be one of the whitelisted bounded-driver-state sites
  * (k-means centroids / PQ codebooks / sketch query sets — driver state
  * whose size is a constant of the algorithm, not of the data). A new
  * collect anywhere else fails the build until it is either removed or
  * consciously added here WITH a justification of why its size is
  * data-independent.
  */
class CollectWhitelistSpec extends AnyFunSuite {

  // file (relative to src/main/scala/graft) -> max allowed .collect() sites
  private val whitelist = Map(
    "ops/SimilarityOps.scala" -> 7, // k-means centroids, PQ codebooks,
    // the shared medoidCentroids matrix (cells × dim doubles),
    // silhouette's per-label centroid sums (|labels| × dim pairs —
    // a constant of the label alphabet, not the corpus), and
    // pcaPower's covariance matrix (d(d+1)/2 doubles — the power
    // iteration is driver math; the Gram pass stays distributed)
    "ops/EventOps.scala" -> 2, // markovStationary's |types| state list
    // and |types|² transition matrix — constants of the event-type
    // alphabet, not the data; the 20 power steps are driver math
    // (the pcaPower precedent), the fact pass stays distributed
    "ops/Ranks.scala" -> 1, // globalRank's per-partition row counts —
    // numPartitions longs (bounded by CLUSTER size, not data): the
    // RDD.zipWithIndex discipline, prefix-summed on the driver and
    // shipped back as a literal pid→offset map
    "ops/TextOps.scala" -> 5 // CMS top-terms sketch query set (k strings)
    // + the BPE merge loop's per-round top-1 pair (ONE row per round;
    // total driver state = the k-row merge list — a constant of the
    // algorithm, like centroids)
    // + the CMS rollup's merged sketch (ONE O(depth·width) counter
    // table) and its k-pair query set — both constants of the sketch
    // parameters, not the data
  )

  private def countSites(needles: Seq[String]): Map[String, Int] = {
    val root = Paths.get("src/main/scala/graft")
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .map { p =>
        val src = new String(Files.readAllBytes(p))
        val n = needles.map(needle =>
          src.sliding(needle.length).count(_ == needle)).sum
        root.relativize(p).toString -> n
      }
      .filter(_._2 > 0)
      .toMap
  }

  test("every .collect() in src/main is a whitelisted bounded-state site") {
    val offenders = countSites(Seq(".collect()")).filter { case (f, n) =>
      n > whitelist.getOrElse(f, 0)
    }
    assert(offenders.isEmpty,
      s"non-whitelisted .collect() sites (file -> count): $offenders — " +
        "either make the operator distributed or, if the collected state " +
        "is provably bounded (centroids/codebooks/sketch queries), add it " +
        "to the whitelist with a justification")
  }

  test("no .toLocalIterator / .first() / .head() sneaks a driver-side " +
      "loop past the collect whitelist") {
    // same contract, adjacent escape hatches: an iterator pull or a
    // first-row probe in a hot path is the same anti-pattern wearing a
    // different method name. Currently ZERO sites are allowed.
    val offenders =
      countSites(Seq(".toLocalIterator", ".first()", ".head()"))
    assert(offenders.isEmpty,
      s"driver-side row pulls outside the whitelist: $offenders")
  }
}
