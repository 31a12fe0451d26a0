package graft

import org.apache.spark.sql.SparkSession

/** Task-metrics profile for any registered query:
  *   runMain graft.ProfileQuery <sfDir> [queryName...]
  * Prints one JSON line per query: jobs/stages/tasks, task time, shuffle
  * read+write bytes, input records, spill bytes. The measure-don't-guess
  * companion to `Explain` — plans say what SHOULD happen, this says what
  * DID (a "narrow" op with nonzero shuffle bytes is a design bug; spill
  * means partitions outgrew memory and the partition knobs need work).
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    EngineConf(spark)
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val t0 = System.nanoTime()
      val (_, p) = Metrics.profile(spark) {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      val wallMs = (System.nanoTime() - t0) / 1000000
      Caches.releaseAll()
      println(s"""{"query":"$name","wall_ms":$wallMs,""" +
        s""""jobs":${p.jobs},"stages":${p.stages},""" +
        s""""tasks":${p.tasks},"task_time_ms":${p.taskTimeMs},""" +
        s""""shuffle_read_b":${p.shuffleReadBytes},""" +
        s""""shuffle_write_b":${p.shuffleWriteBytes},""" +
        s""""input_records":${p.inputRecords},"spill_b":${p.spillBytes}}""")
    }
    spark.stop()
  }
}
