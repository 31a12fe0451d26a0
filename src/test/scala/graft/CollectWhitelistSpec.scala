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
    "ops/SimilarityOps.scala" -> 5, // k-means centroids, PQ codebooks,
    // the shared medoidCentroids matrix (cells × dim doubles)
    "ops/TextOps.scala" -> 2 // CMS top-terms sketch query set (k strings)
  )

  test("every .collect() in src/main is a whitelisted bounded-state site") {
    val root = Paths.get("src/main/scala/graft")
    val counts = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .map { p =>
        val n = new String(Files.readAllBytes(p))
          .sliding(".collect()".length).count(_ == ".collect()")
        root.relativize(p).toString -> n
      }
      .filter(_._2 > 0)
      .toMap
    val offenders = counts.filter { case (f, n) =>
      n > whitelist.getOrElse(f, 0)
    }
    assert(offenders.isEmpty,
      s"non-whitelisted .collect() sites (file -> count): $offenders — " +
        "either make the operator distributed or, if the collected state " +
        "is provably bounded (centroids/codebooks/sketch queries), add it " +
        "to the whitelist with a justification")
  }
}
