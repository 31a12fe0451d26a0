package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Cleaners
import graft.sources.v2.GraftStore
import graft.streaming.StreamPipeline

/** The reference's full streaming path hosted end-to-end on the DSv2
  * seams: offset-tracked GraftWireSource (Kinesis sequence-number analog)
  * → deserialize → cleaners → stateful dedup → GraftStoreSink (two-phase
  * commit, per-(query, epoch) idempotent). Covers the three wire streams
  * running CONCURRENTLY with per-batch observed quality counters, and
  * exactly-once totals across a kill/restart.
  */
class GraftWirePipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val wireFmt = "graft.sources.v2.GraftWireSource"
  private val storeFmt = "graft.sources.v2.GraftStoreSink"

  /** Batch read of the same deterministic wire records — the expected
    * post-clean state (batch cleaner = stream cleaner + same dedup keys).
    */
  private def wireBatch(stream: String, rows: Long): DataFrame =
    StreamPipeline.deserialize(
      spark.read.format(wireFmt)
        .option("stream", stream).option("rows", rows.toString).load(),
      stream match {
        case "pin" => graft.schemas.Schemas.pinRaw
        case "geo" => graft.schemas.Schemas.geoRaw
        case _ => graft.schemas.Schemas.userRaw
      })

  private def storeTable(table: String): DataFrame =
    spark.read.format(storeFmt).option("table", table).load()

  test("three wire streams run concurrently through DSv2 source -> " +
      "cleaners -> DSv2 store; totals match the batch cleaners and " +
      "quality counters ride every micro-batch") {
    val rows = 60L
    Seq("w_pin", "w_geo", "w_user").foreach(GraftStore.drop)
    val ck = Files.createTempDirectory("wire3_ck").toString

    val qPin = StreamPipeline.startStoreSink(
      StreamPipeline.pinStreamObserved(
        StreamPipeline.wireStream(spark, "pin", rows, rowsPerBatch = 20)),
      "w_pin", s"$ck/pin")
    val qGeo = StreamPipeline.startStoreSink(
      StreamPipeline.geoStreamObserved(
        StreamPipeline.wireStream(spark, "geo", rows, rowsPerBatch = 20)),
      "w_geo", s"$ck/geo")
    val qUser = StreamPipeline.startStoreSink(
      StreamPipeline.userStreamObserved(
        StreamPipeline.wireStream(spark, "user", rows, rowsPerBatch = 20)),
      "w_user", s"$ck/user")
    val queries = Seq(qPin, qGeo, qUser)
    try queries.foreach(_.processAllAvailable())
    finally queries.foreach(_.stop())

    // totals: stream dedup keeps first-seen, batch dropDuplicates keeps
    // an arbitrary survivor — row COUNTS and key SETS must agree
    val expPin = Cleaners.pinClean(wireBatch("pin", rows))
    assert(storeTable("w_pin").count() === expPin.count())
    assert(storeTable("w_pin").select("description").collect().map(_.getString(0)).sorted
      === expPin.select("description").collect().map(_.getString(0)).sorted)

    val expGeo = Cleaners.geoClean(wireBatch("geo", rows))
    assert(storeTable("w_geo").count() === expGeo.count())
    assert(storeTable("w_geo").select("ind").collect().map(_.getInt(0)).sorted
      === expGeo.select("ind").collect().map(_.getInt(0)).sorted)
    // the geo store rows carry array<float> coordinates through the
    // sink's deep copy: every row's coordinates must be its own (finite,
    // in-range), not the last row's buffer
    val coords = storeTable("w_geo")
      .select(col("ind"), col("coordinates").getItem(0).as("lat"))
      .collect().map(r => r.getInt(0) -> r.getFloat(1)).toMap
    assert(coords.values.toSet.size > 1,
      "all coordinate rows identical — task-boundary aliasing")

    val expUser = Cleaners.userClean(wireBatch("user", rows))
    assert(storeTable("w_user").count() === expUser.count())
    assert(storeTable("w_user").select("ind").collect().map(_.getInt(0)).sorted
      === expUser.select("ind").collect().map(_.getInt(0)).sorted)

    // per-batch observed counters: present on every data-carrying batch,
    // and their totals reconcile with the final table state
    def metricTotals(q: org.apache.spark.sql.streaming.StreamingQuery,
        name: String, fields: Seq[String]): (Int, Map[String, Long]) = {
      val withMetric = q.recentProgress.toSeq
        .filter(p => p.observedMetrics.containsKey(name))
        .map(p => p.observedMetrics.get(name))
      val sums = fields.map(f =>
        f -> withMetric.map(_.getAs[Long](f)).sum).toMap
      (withMetric.size, sums)
    }
    val (pinBatches, pinSums) = metricTotals(qPin, "pin_quality",
      Seq("n_rows", "n_null_follower", "n_null_category"))
    assert(pinBatches >= 2, s"expected multiple observed batches, got $pinBatches")
    assert(pinSums("n_rows") === expPin.count())
    assert(pinSums("n_null_follower")
      === expPin.filter(col("follower_count").isNull).count())
    assert(pinSums("n_null_category")
      === expPin.filter(col("category").isNull).count())

    val (geoBatches, geoSums) = metricTotals(qGeo, "geo_quality",
      Seq("n_rows", "n_null_timestamp", "n_null_coord"))
    assert(geoBatches >= 2)
    assert(geoSums("n_rows") === expGeo.count())
    assert(geoSums("n_null_timestamp")
      === expGeo.filter(col("timestamp").isNull).count())

    val (userBatches, userSums) = metricTotals(qUser, "user_quality",
      Seq("n_rows", "n_null_date", "n_null_name"))
    assert(userBatches >= 2)
    assert(userSums("n_rows") === expUser.count())
  }

  test("kill/restart exactly-once: a pin query stopped mid-stream and " +
      "resumed from its checkpoint converges to the batch-clean totals " +
      "with no duplicated epochs") {
    val rows = 120L
    GraftStore.drop("w_pin_eo")
    val ck = Files.createTempDirectory("wire_eo_ck").toString

    def startQuery() = StreamPipeline.startStoreSink(
      StreamPipeline.pinStream(
        StreamPipeline.wireStream(spark, "pin", rows, rowsPerBatch = 10)),
      "w_pin_eo", ck)

    // phase 1: run until at least one epoch commits, then kill
    val q1 = startQuery()
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (GraftStore.rows("w_pin_eo").isEmpty &&
        System.nanoTime() < deadline) Thread.sleep(20)
    q1.stop()
    val partial = GraftStore.rows("w_pin_eo").size
    assert(partial > 0, "no epoch committed before the kill")

    // phase 2: resume from the same checkpoint; the replayed epoch (if
    // any) must be a no-op in the store, and the drain must complete
    val q2 = startQuery()
    try q2.processAllAvailable()
    finally q2.stop()

    val expPin = Cleaners.pinClean(wireBatch("pin", rows))
    val got = storeTable("w_pin_eo")
    assert(got.count() === expPin.count(),
      s"restart changed totals: got ${got.count()}, want ${expPin.count()}" +
        s" (partial before kill: $partial)")
    // no description admitted twice (the dedup key is unique by contract)
    val dups = got.groupBy("description").count().filter(col("count") > 1)
    assert(dups.isEmpty, s"duplicated rows after restart: " +
      dups.collect().take(5).mkString(", "))
  }

  test("load at 2e5 rows: every micro-batch bounded by rowsPerBatch " +
      "admission, batch count = rows/rowsPerBatch, and exactly-once " +
      "totals — the backpressure story at 10^3x the functional tests") {
    import org.apache.spark.sql.streaming.Trigger
    val rows = 200000L
    val perBatch = 20000L
    val ckpt = Files.createTempDirectory("wire_load_ck").toString
    val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val distinctTotal = new java.util.concurrent.atomic.AtomicLong
    val q = StreamPipeline.wireStream(spark, "pin", rows,
        rowsPerBatch = perBatch, partitions = 8)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        // both counts in ONE action: a second action would rescan the
        // micro-batch and double the engine's numInputRows accounting,
        // which the progress assertion below reads
        val row = df.agg(count(lit(1)), count_distinct(col("data")))
          .collect()(0)
        val n = row.getLong(0)
        if (n > 0) sizes.add(n)
        // per-batch distinct: summed across disjoint offset ranges this
        // equals `rows` iff every record was delivered exactly once
        distinctTotal.addAndGet(row.getLong(1))
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000), "load drain did not finish in 5 min")

    import scala.jdk.CollectionConverters._
    val batchSizes = sizes.asScala.toSeq
    assert(batchSizes.forall(_ <= perBatch),
      s"admission exceeded: ${batchSizes.filter(_ > perBatch)}")
    assert(batchSizes.size === (rows / perBatch),
      s"expected ${rows / perBatch} paced batches, got ${batchSizes.size}: $batchSizes")
    assert(batchSizes.sum === rows,
      s"drained ${batchSizes.sum} of $rows rows")
    assert(distinctTotal.get === rows,
      s"duplicate or missing records: distinct sum ${distinctTotal.get} != $rows")
    // the engine's own per-trigger accounting agrees with the sink's
    val progressRows = q.recentProgress.toSeq.map(_.numInputRows)
    assert(progressRows.forall(_ <= perBatch),
      s"progress reports a batch above the admission cap: $progressRows")
  }

  test("Trigger.AvailableNow drains the WHOLE wire stream, paced in " +
      "rowsPerBatch micro-batches — SupportsTriggerAvailableNow pins the " +
      "target offset and the default read limit paces the drain to it") {
    import org.apache.spark.sql.streaming.Trigger
    graft.sources.v2.GraftStore.drop("w_avail")
    val ckpt = java.nio.file.Files
      .createTempDirectory("wire_avail_ckpt").toString
    var epochs = 0
    val q = StreamPipeline.wireStream(spark, "pin", rows = 100,
        rowsPerBatch = 25)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        epochs += 1
        df.write.format(storeFmt).option("table", "w_avail")
          .mode("append").save()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // two regressions this pins against: stopping "complete" after ONE
    // paced batch (25 of 100 — silent truncation), and the
    // no-SupportsTriggerAvailableNow fallback (all 100 in ONE unpaced
    // batch — admission silently ignored)
    assert(graft.sources.v2.GraftStore.rows("w_avail").size === 100,
      s"AvailableNow drained ${graft.sources.v2.GraftStore.rows("w_avail").size} of 100 rows")
    assert(epochs === 4,
      s"expected 100 rows drained in 4 paced batches of 25, got $epochs epochs")
  }
}
