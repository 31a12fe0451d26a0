package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 source for the reference's three wire streams (pin / geo / user):
  * one `data: string` column of JSON records — byte-for-byte the shape a
  * Kinesis consumer delivers (`(Clone) Kinesis Data Stream.py:38-51`,
  * payloads `user_posting_emulation_streaming.py:47-94`) — behind an
  * offset-tracked `MicroBatchStream`. The offset is the next record index:
  * a totally ordered, replayable position (the Kinesis sequence-number
  * analog), so checkpoint recovery replans identical (start, end] ranges
  * and the pipeline downstream is exactly-once end to end.
  *
  * Record content is a pure function of the index (splitmix64-mixed) and
  * deliberately DIRTY, covering every domain FIXTURES.md §1 catalogs:
  * sentinel strings, human-suffixed follower counts (incl. the lossy
  * "2.5k"), duplicate descriptions / inds for the stateful dedup, the
  * `Local save in` prefix. Determinism makes exactly-once assertable:
  * any replay, split layout, or restart yields identical records.
  *
  * Options: `stream` = pin|geo|user, `rows`, `partitions`,
  * `rowsPerBatch` (admission per trigger — the maxOffsetsPerTrigger
  * backpressure shape). BATCH_READ is also supported so specs can state
  * the expected post-clean table with one batch read of the same records.
  */
class GraftWireSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftWireSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // DSv2 options are case-insensitive by contract; the raw properties
    // map is not — wrap it or `.option("Rows", …)` is silently dropped
    val opts = new CaseInsensitiveStringMap(properties)
    new GraftWireTable(
      Option(opts.get("stream")).getOrElse("pin"),
      Option(opts.get("rows")).map(_.toLong).getOrElse(100L),
      Option(opts.get("partitions")).map(_.toInt).getOrElse(2),
      Option(opts.get("rowsPerBatch")).map(_.toLong).getOrElse(25L))
  }
}

object GraftWireSource {
  val schema: StructType = StructType(Seq(
    StructField("data", StringType, nullable = false)))

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def pos(i: Long, salt: Long): Long = mix(i ^ salt) & 0x7fffffffL

  private val categories = Array("art", "travel", "diy-and-crafts")
  private val mediaKinds =
    Array("image", "video", "multi-video(story page format)")
  private val countries = Array("United States", "Germany", "France",
    "Brazil", "India", "Japan", "Kenya", "Norway")

  /** Every 5th pin duplicates the previous record's description (the
    * stream dedup key); follower_count cycles through parseable,
    * suffixed, lossy-suffixed, and sentinel forms.
    */
  def pinJson(i: Long): String = {
    val descOwner = if (i % 5 == 4) i - 1 else i
    val title =
      if (i % 7 == 3) "No Title Data Available" else s"Title $i"
    val poster =
      if (i % 9 == 6) "User Info Error" else s"poster_${pos(i, 11) % 40}"
    val follower = (i % 5) match {
      case 0 => s"${pos(i, 13) % 900 + 100}" // plain int
      case 1 => s"${pos(i, 17) % 90 + 10}k" // -> *1000
      case 2 => s"${pos(i, 19) % 9 + 1}M" // -> *1000000
      case 3 => "2.5k" // lossy: -> "2.5000" -> NULL
      case _ => "User Info Error" // sentinel -> NULL
    }
    val tags =
      if (i % 13 == 8) "N,o, ,T,a,g,s, ,A,v,a,i,l,a,b,l,e"
      else s"tag${i % 4},tag${i % 6}"
    val src =
      if (i % 11 == 5) "Image src error." else s"https://img.example/$i.jpg"
    val cat = categories((i % categories.length).toInt)
    s"""{"index": $i, "unique_id": "${java.lang.Long.toHexString(mix(i))}",""" +
      s""" "title": "$title", "description": "desc $descOwner",""" +
      s""" "poster_name": "$poster", "follower_count": "$follower",""" +
      s""" "tag_list": "$tags",""" +
      s""" "is_image_or_video": "${mediaKinds((i % 3).toInt)}",""" +
      s""" "image_src": "$src", "downloaded": "${i % 2}",""" +
      s""" "save_location": "Local save in /data/$cat",""" +
      s""" "category": "$cat"}"""
  }

  /** Every 6th geo/user record repeats the previous ind (the stream dedup
    * key); timestamps span 2015-2024 so the 2018-2022 year filter selects
    * a strict subset (FIXTURES.md §1).
    */
  def geoJson(i: Long): String = {
    val ind = if (i % 6 == 5) i - 1 else i
    val lat = (pos(i, 23) % 18000) / 100.0 - 90.0
    val lon = (pos(i, 29) % 36000) / 100.0 - 180.0
    val ts = f"${2015 + i % 10}%04d-${i % 12 + 1}%02d-${i % 28 + 1}%02d " +
      f"${i % 24}%02d:00:00"
    s"""{"ind": $ind, "country": "${countries((i % 8).toInt)}",""" +
      s""" "latitude": $lat, "longitude": $lon, "timestamp": "$ts"}"""
  }

  def userJson(i: Long): String = {
    val ind = if (i % 6 == 5) i - 1 else i
    val ts = f"${2015 + i % 6}%04d-${i % 12 + 1}%02d-${i % 28 + 1}%02d " +
      "09:30:00"
    s"""{"ind": $ind, "first_name": "Fn${pos(i, 31) % 40}",""" +
      s""" "last_name": "Ln${pos(i, 37) % 30}", "age": ${16 + i % 55},""" +
      s""" "date_joined": "$ts"}"""
  }

  def jsonFor(stream: String, i: Long): String = stream match {
    case "pin" => pinJson(i)
    case "geo" => geoJson(i)
    case "user" => userJson(i)
    case other => throw new IllegalArgumentException(
      s"unknown wire stream '$other' (expected pin|geo|user)")
  }
}

class GraftWireTable(stream: String, rows: Long, partitions: Int,
    rowsPerBatch: Long) extends Table with SupportsRead {
  override def name(): String = s"graftwire($stream, $rows)"
  override def schema(): StructType = GraftWireSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        new GraftWireScan(stream, rows, partitions, rowsPerBatch)
    }
}

case class GraftWirePartition(stream: String, start: Long, end: Long)
    extends InputPartition

case class GraftWireOffset(next: Long) extends Offset {
  override def json(): String = next.toString
}

class GraftWireScan(stream: String, rows: Long, partitions: Int,
    rowsPerBatch: Long) extends Scan with Batch {
  override def readSchema(): StructType = GraftWireSource.schema
  override def toBatch: Batch = this
  override def description(): String = s"GraftWireScan($stream, $rows)"

  override def planInputPartitions(): Array[InputPartition] =
    GraftWireScan.split(stream, 0L, rows, partitions)

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftWireReaderFactory

  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new GraftWireMicroBatchStream(stream, rows, partitions, rowsPerBatch)
}

object GraftWireScan {
  def split(stream: String, s: Long, e: Long,
      partitions: Int): Array[InputPartition] = {
    val total = math.max(0L, e - s)
    if (total == 0) return Array.empty
    val per = math.max(1L, (total + partitions - 1) / math.max(1, partitions))
    Iterator.iterate(s)(_ + per).takeWhile(_ < e)
      .map(b => GraftWirePartition(stream, b, math.min(e, b + per)))
      .toArray[InputPartition]
  }
}

class GraftWireMicroBatchStream(stream: String, rows: Long, partitions: Int,
    rowsPerBatch: Long) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.ReadLimit

  override def initialOffset(): Offset = GraftWireOffset(0L)
  override def deserializeOffset(json: String): Offset =
    GraftWireOffset(json.toLong)
  override def commit(end: Offset): Unit = ()

  // Admission control via SupportsAdmissionControl, NOT instance state:
  // each trigger receives the last committed position and announces at
  // most `rowsPerBatch` beyond it. A restarted query hands the restored
  // checkpoint offset straight back in — stateless pacing, so recovery
  // resumes exactly where the checkpoint says (a driver-side `var` here
  // starts at 0 on the fresh instance and would stall or re-pace).
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  // SupportsTriggerAvailableNow: without it the engine falls back to ONE
  // Trigger.Once batch that ignores the read limit entirely (observed: a
  // 2e5-row stream delivered as a single 2e5-row batch). With it,
  // AvailableNow pins the target offset at query start and drains to it
  // in default-read-limit-paced micro-batches — the same admission path
  // a continuous trigger uses, which is the backpressure contract the
  // load spec asserts. The synthetic wire's "latest available" is the
  // static row count, so preparing is recording that bound.
  @volatile private var targetOffset: Long = rows
  override def prepareForTriggerAvailableNow(): Unit = { targetOffset = rows }
  override def reportLatestOffset(): Offset = GraftWireOffset(targetOffset)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GraftWireOffset].next
    GraftWireOffset(Admission.admit(s, targetOffset, limit))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "SupportsAdmissionControl sources are driven via latestOffset(start, limit)")

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] =
    GraftWireScan.split(stream,
      start.asInstanceOf[GraftWireOffset].next,
      end.asInstanceOf[GraftWireOffset].next, partitions)

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftWireReaderFactory
  override def stop(): Unit = ()
}

class GraftWireReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[GraftWirePartition]
    new PartitionReader[InternalRow] {
      private var cur = part.start - 1
      override def next(): Boolean = { cur += 1; cur < part.end }
      override def get(): InternalRow = InternalRow(
        UTF8String.fromString(GraftWireSource.jsonFor(part.stream, cur)))
      override def close(): Unit = ()
    }
  }
}
