package graft

import org.scalatest.funsuite.AnyFunSuite

/** Engine-wide distribution-insensitivity gate: every registered query
  * must produce IDENTICAL rows when the shuffle partition count changes
  * — the property that makes a result reproducible across cluster
  * sizes, AQE decisions, and re-runs at 100 TB. Any op that leaks
  * partitioning into its result (order-sensitive double accumulation,
  * partition-local ids, non-deterministic tiebreaks) fails here on the
  * exact query that leaked.
  *
  * Engine caches are released between runs so memoized state built
  * under one partitioning cannot stand in for the other (the bench's
  * cold-rep discipline). `corpus_pipeline_stages` is excluded for
  * runtime only (it rewrites its staged parquet twice; its determinism
  * is covered by CorpusPipelineSpec + the driver hash gate).
  */
class DeterminismSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("every registered query returns identical rows under 4 vs 7 " +
      "shuffle partitions at sf0.001") {
    val skip = Set("corpus_pipeline_stages")
    val names = SparkEntry.queries.keys.filterNot(skip).toSeq.sorted
    def runAll(parts: String): Map[String, Seq[Seq[Any]]] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try names.map { n =>
        Caches.releaseAll()
        n -> SparkEntry.queries(n)(spark, TestSpark.sf0001)
          .collect().toSeq.map(_.toSeq)
      }.toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    val at4 = runAll("4")
    val at7 = runAll("7")
    val diffs = names.filter(n => at4(n) != at7(n))
    assert(diffs.isEmpty,
      s"partitioning leaked into results of: ${diffs.mkString(", ")}")
  }
}
