package graft

import org.apache.spark.sql.SparkSession

/** Measurement harness behind [[ScalingClasses]]: for every registry
  * query, profile the shuffle-read footprint at a small and a 10×
  * (4× for embeddings) scale factor and print one TSV row
  * `name  inSmall  inBig  shSmall  shBig  inRatio  shRatio`.
  * The written per-query band classes in [[ScalingClasses]] were
  * derived FROM this probe's output (measure, don't guess) and
  * `ScalingSpec` re-asserts them every run; re-run this main after
  * adding an operator to pick its class from evidence:
  *   sbt "runMain graft.ScalingProbe [nameSubstring]"
  *
  * Artifact-backed queries get one unmeasured warm call per SF first,
  * so the measured rep is the steady-state SERVE path (the bench's
  * sacrificial discipline — a build rep would classify the one-time
  * build, which the bench already tracks separately).
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val only = args.headOption
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    EngineConf(spark)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(n.contains) }
      .foreach { case (name, fn) =>
        val (small, big) = ScalingClasses.sfPair(name)
        def measure(d: String): Metrics.Profile = {
          // warm call: artifact builds + codegen out of the measured rep
          try { fn(spark, d).write.format("noop").mode("overwrite").save() }
          catch { case _: Throwable => () }
          Caches.releaseAll(); spark.sqlContext.clearCache()
          val (_, p) = Metrics.profile(spark) {
            fn(spark, d).write.format("noop").mode("overwrite").save()
          }
          Caches.releaseAll(); spark.sqlContext.clearCache()
          p
        }
        try {
          val ps = measure(small)
          val pb = measure(big)
          val inR = pb.inputRecords.toDouble / math.max(ps.inputRecords, 1L)
          val shR = pb.shuffleReadBytes.toDouble /
            math.max(ps.shuffleReadBytes, 1L)
          println(f"$name\t${ps.inputRecords}\t${pb.inputRecords}\t" +
            f"${ps.shuffleReadBytes}\t${pb.shuffleReadBytes}\t" +
            f"$inR%.2f\t$shR%.2f")
        } catch {
          case e: Throwable => println(s"$name\tERR\t${e.getMessage}")
        }
      }
    spark.stop()
  }
}
