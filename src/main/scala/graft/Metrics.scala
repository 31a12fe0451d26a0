package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Task-metrics profiler: run any Spark action under a temporary listener
  * and get the aggregate execution profile back — the measure-don't-guess
  * hook for pipeline tuning. Shuffle bytes tell you whether a "narrow"
  * op actually shuffled; spill bytes tell you partitions outgrew
  * executor memory (resize `spark.sql.shuffle.partitions` /
  * `files.maxPartitionBytes`); task time vs wall time exposes scheduling
  * overhead vs real work.
  *
  * Captures metrics for ALL jobs that complete while the action runs —
  * profile one action at a time (the library's mains and specs are
  * sequential; concurrent streaming queries would be attributed too).
  */
object Metrics {

  case class Profile(
      jobs: Int,
      stages: Int,
      tasks: Int,
      taskTimeMs: Long,
      shuffleReadBytes: Long,
      shuffleWriteBytes: Long,
      inputRecords: Long,
      spillBytes: Long)

  def profile[T](spark: SparkSession)(action: => T): (T, Profile) = {
    // flush still-queued events from PRIOR actions before attaching:
    // the async bus snapshots its listener list at DELIVERY time, so on
    // a lagging bus a freshly-attached listener receives the previous
    // action's tail stage events (observed round 11: the bench's rep-1
    // shuffle-read for a broadcast-join query jumped 948 B → 1.7 MB on
    // a contended host — the prior query's stages bled in and tripped
    // the deterministic-bytes gate with a phantom)
    org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
    var jobs, stages, tasks = 0
    var taskTime, shRead, shWrite, inRecs, spill = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        synchronized {
          val m = sc.stageInfo.taskMetrics
          stages += 1
          tasks += sc.stageInfo.numTasks
          taskTime += m.executorRunTime
          shRead += m.shuffleReadMetrics.totalBytesRead
          shWrite += m.shuffleWriteMetrics.bytesWritten
          inRecs += m.inputMetrics.recordsRead
          spill += m.diskBytesSpilled
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val result = action
      // stage-completed events are posted asynchronously; drain the bus
      org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
      (result, Profile(jobs, stages, tasks, taskTime, shRead, shWrite,
        inRecs, spill))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
