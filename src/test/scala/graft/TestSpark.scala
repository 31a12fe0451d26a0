package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites (SparkSessions are
  * heavyweight; suites must not create their own).
  */
object TestSpark {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // the engine's standard planner confs — specs must plan in the same
    // environment the mains do (see EngineConf's round-12 docstring)
    EngineConf(s)
    s
  }

  /** Set session confs, run, restore — unsetting keys that had no prior
    * value. The one conf-juggling implementation every spec shares.
    */
  def withConfs[T](confs: (String, String)*)(f: => T): T = {
    val olds = confs.map { case (k, _) => k -> session.conf.getOption(k) }
    confs.foreach { case (k, v) => session.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => session.conf.set(k, v)
      case (k, None) => session.conf.unset(k)
    }
  }

  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
  /** Bench-sized tier. documents/embeddings are constant-sized below this
    * (500 rows at both sf0.001 and sf0.01) — scaling comparisons on those
    * tables must use sf001 → sf01.
    */
  val sf01 = "/root/testdata/sf0.1"
}
