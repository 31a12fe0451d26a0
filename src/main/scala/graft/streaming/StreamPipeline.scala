package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.ops.Cleaners
import graft.schemas.Schemas

/** The reference's streaming entry point (`(Clone) Kinesis Data Stream.py`)
  * re-expressed as Structured Streaming: an unbounded source of JSON bytes
  * → `CAST(data AS STRING)` → `from_json(schema)` → struct flatten → the
  * same cleaning transforms as batch → append sink with checkpoint.
  *
  * The Kinesis connector is not on the offline classpath (SURVEY.md §7.4):
  * any source producing a `data: string` column preserves the semantics —
  * tests use MemoryStream[String]; production would swap in a connector
  * without touching the pipeline (`deserialize` onward is source-agnostic).
  *
  * Scale notes:
  *  - All three cleaners are narrow (per-row) except the trailing stateful
  *    dedup. Faithful mode (`bounded = false`) reproduces the reference's
  *    unbounded `dropDuplicates` state (`KINESIS:131,145,156`) — a known
  *    leak at 100 TB/day. `bounded = true` switches to
  *    `dropDuplicatesWithinWatermark`, which evicts state past the
  *    watermark: the production configuration (flagged deviation, §7.4).
  *  - Sinks are parquet append with per-query checkpoints — the same
  *    exactly-once contract as the reference's Delta sinks (`KINESIS:174-192`).
  */
object StreamPipeline {

  /** `CAST(data AS STRING)` → `from_json` → flatten (`KINESIS:49-51`). */
  def deserialize(raw: DataFrame, schema: StructType): DataFrame =
    raw.selectExpr("CAST(data AS STRING) AS data")
      .select(from_json(col("data"), schema).as("data"))
      .select(col("data.*"))

  /** Streaming pin path: deserialize + clean. `dropDuplicates` on a stream
    * compiles to StreamingDeduplicate (stateful, exactly the reference's
    * operator); bounded mode adds a watermark and evicts old state.
    */
  def pinStream(raw: DataFrame, bounded: Boolean = false): DataFrame = {
    val des = deserialize(raw, Schemas.pinRaw)
    val cleanedNoDedup = Cleaners.nullifySentinels(des)
      .withColumn("follower_count",
        Cleaners.parseFollowerCount(col("follower_count")))
      .withColumn("save_location",
        regexp_replace(col("save_location"), "Local save in ", ""))
      .withColumnRenamed("index", "ind")
      .drop("downloaded")
      .select("ind", "unique_id", "title", "description", "follower_count",
        "poster_name", "tag_list", "is_image_or_video", "image_src",
        "save_location", "category")
    // no event-time column on pin; bounded mode uses processing-time ingest
    if (bounded)
      cleanedNoDedup
        .withColumn("ingest_ts", current_timestamp())
        .withWatermark("ingest_ts", "1 hour")
        .dropDuplicatesWithinWatermark("description")
        .drop("ingest_ts")
    else cleanedNoDedup.dropDuplicates("description")
  }

  /** Streaming geo path (`KINESIS:138-149`). */
  def geoStream(raw: DataFrame, bounded: Boolean = false): DataFrame = {
    val des = deserialize(raw, Schemas.geoRaw)
      .withColumn("coordinates",
        array(col("latitude"), col("longitude")))
      .drop("latitude", "longitude")
      .withColumn("timestamp", to_timestamp(col("timestamp")))
      .select("ind", "country", "coordinates", "timestamp")
    if (bounded)
      des.withWatermark("timestamp", "1 hour")
        .dropDuplicatesWithinWatermark("ind")
    else des.dropDuplicates("ind")
  }

  /** Streaming user path (`KINESIS:153-163`). */
  def userStream(raw: DataFrame, bounded: Boolean = false): DataFrame = {
    val des = deserialize(raw, Schemas.userRaw)
      .withColumn("user_name",
        concat(col("first_name"), lit(" "), col("last_name")))
      .drop("first_name", "last_name")
      .withColumn("date_joined", to_timestamp(col("date_joined")))
      .select("ind", "user_name", "age", "date_joined")
    if (bounded)
      des.withWatermark("date_joined", "1 hour")
        .dropDuplicatesWithinWatermark("ind")
    else des.dropDuplicates("ind")
  }

  /** Event-time tumbling-window aggregate with watermark — the windowed
    * streaming shape the reference lacks (SURVEY.md §2.11 T4), over any
    * stream with (ts, event_type, value).
    */
  def windowedCounts(events: DataFrame,
      window_ : String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Start a parquet append sink with checkpoint — the engine twin of
    * `writeStream.format("delta").outputMode("append")
    * .option("checkpointLocation", ...).table(...)` (`KINESIS:174-192`).
    */
  def startParquetSink(df: DataFrame, path: String,
      checkpoint: String): StreamingQuery =
    df.writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .start()

  /** File-source variant of the pipeline entry: watch a directory of JSON
    * lines (each line one record, the wire shape of FIXTURES.md §3) and run
    * a cleaner over it. Lets the whole pipeline run end-to-end without any
    * connector.
    */
  def fromJsonDir(s: SparkSession, dir: String, schema: StructType): DataFrame =
    s.readStream.schema(StructType(Seq(
        org.apache.spark.sql.types.StructField("data",
          org.apache.spark.sql.types.StringType))))
      .text(dir).withColumnRenamed("value", "data")
}
