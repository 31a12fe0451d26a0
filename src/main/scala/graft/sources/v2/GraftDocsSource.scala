package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 TableProvider: a deterministic synthetic `documents`
  * generator (`spark.read.format("graftdocs")`), the engine's from-scratch
  * source extension — the seam the reference fills with managed connectors
  * (Kinesis `KINESIS:38-46`, JDBC `EMU:24-31`), expressed through Spark's
  * public connector API instead of a driver-side loop.
  *
  * Scale behavior this demonstrates (spec-verified):
  *  - **Partitioned generation**: `rows` split across `partitions` input
  *    splits, each generated independently on its executor — no driver
  *    materialization, linear scale-out.
  *  - **Filter pushdown** (`SupportsPushDownFilters`): doc_id range
  *    predicates are consumed by the source, which narrows each split's
  *    generation range — rows outside the range are never produced (the
  *    DSv2 analog of parquet row-group pruning). Non-id filters are
  *    left as residuals for Spark to evaluate.
  *  - **Column pruning** (`SupportsPushDownRequiredColumns`): unprojected
  *    columns are never synthesized (text generation is the expensive
  *    part — the ReadSchema contract).
  *
  * Determinism: row content is a pure function of doc_id (xorshift-mixed),
  * so any split layout, filter, or rerun yields identical rows.
  */
class GraftDocsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (Option(options.get("bucketSize")).exists(_.toLong > 0))
      GraftDocsSource.bucketedSchema
    else GraftDocsSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // DSv2 options are case-insensitive by contract; the raw properties
    // map is not — wrap it or `.option("Rows", …)` is silently dropped
    val opts = new CaseInsensitiveStringMap(properties)
    new GraftDocsTable(
      Option(opts.get("rows")).map(_.toLong).getOrElse(1000L),
      Option(opts.get("partitions")).map(_.toInt).getOrElse(4),
      Option(opts.get("rowsPerBatch")).map(_.toLong).getOrElse(100L),
      Option(opts.get("bucketSize")).map(_.toLong).getOrElse(0L))
  }
}

object GraftDocsSource {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  /** With `bucketSize` set the table additionally exposes `id_bucket` =
    * doc_id / bucketSize — a column that is CONSTANT within each input
    * split (splits are bucket-aligned), which is what lets the scan
    * report `KeyGroupedPartitioning(identity(id_bucket))` and a join of
    * two such scans run storage-partitioned (no Exchange) — the
    * Iceberg-style SPJ seam expressed by this source.
    */
  val bucketedSchema: StructType =
    StructType(schema.fields :+
      StructField("id_bucket", LongType, nullable = false))

  private val words = Array("data", "table", "query", "scan", "join",
    "filter", "sort", "merge", "batch", "stream", "row", "column")
  private val langs = Array("en", "de", "fr", "es")

  /** splitmix64-style mix: deterministic content from doc_id alone. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def textFor(docId: Long): String = {
    val n = 8 + (mix(docId) & 7).toInt
    (0 until n).map(i => words((mix(docId * 31 + i) & 0x7fffffff).toInt
      % words.length)).mkString(" ")
  }

  def langFor(docId: Long): String =
    langs((mix(docId ^ 0x5bf03635L) & 0x7fffffff).toInt % langs.length)
}

class GraftDocsTable(rows: Long, partitions: Int,
    rowsPerBatch: Long = 100L, bucketSize: Long = 0L)
    extends Table with SupportsRead {
  override def name(): String = s"graftdocs($rows)"
  override def schema(): StructType =
    if (bucketSize > 0) GraftDocsSource.bucketedSchema
    else GraftDocsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftDocsScanBuilder(rows, partitions, rowsPerBatch, bucketSize)
}

class GraftDocsScanBuilder(rows: Long, partitions: Int,
    rowsPerBatch: Long = 100L, bucketSize: Long = 0L)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L            // inclusive generation bound
  private var hi = rows          // exclusive generation bound
  private var pushed = Array.empty[Filter]
  private var required: StructType =
    if (bucketSize > 0) GraftDocsSource.bucketedSchema
    else GraftDocsSource.schema

  /** Consume doc_id range filters (narrow [lo, hi)); everything else is
    * a residual Spark evaluates post-scan.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan("doc_id", v: Long) => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v); true
      case LessThan("doc_id", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, v + 1); true
      case _ => false
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GraftDocsScan(lo, hi, partitions, required, rowsPerBatch, bucketSize)
}

/** `bucket` is the split's constant id_bucket value (-1 in unbucketed
  * mode). HasPartitionKey is what turns these splits into the partition
  * VALUES of the reported KeyGroupedPartitioning — Spark groups splits
  * by this key and aligns both join sides' groups for SPJ.
  */
case class GraftDocsPartition(start: Long, end: Long, bucket: Long = -1L)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

class GraftDocsScan(lo: Long, hi: Long, partitions: Int,
    required: StructType, rowsPerBatch: Long = 100L, bucketSize: Long = 0L)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  private def bucketed: Boolean =
    bucketSize > 0 && required.fieldNames.contains("id_bucket")

  /** The bucket values intersecting the (possibly filter-narrowed)
    * generation range — one input split per bucket in bucketed mode, so
    * the split list and the reported partitioning agree by construction.
    */
  private def bucketRange: Seq[Long] =
    if (hi <= lo) Seq.empty
    else (lo / bucketSize) to ((hi - 1) / bucketSize)

  /** Storage-partitioned-join seam (the Iceberg SPJ shape): in bucketed
    * mode the scan reports `KeyGroupedPartitioning(identity(id_bucket))`
    * with one partition per bucket; a join of two such scans on a key
    * set containing id_bucket plans with NO Exchange under
    * `spark.sql.sources.v2.bucketing.enabled` (spec-pinned). If
    * id_bucket was pruned away the report degrades to Unknown — a
    * partitioning over a column the scan does not produce would be
    * unresolvable.
    */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    if (bucketed)
      new org.apache.spark.sql.connector.read.partitioning
        .KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions
            .identity("id_bucket")),
          bucketRange.size)
    else {
      // arithmetic split count — planInputPartitions() would allocate
      // the whole split array just to take its length, and Spark may
      // call outputPartitioning repeatedly during planning
      val total = math.max(0L, hi - lo)
      val per = math.max(1L,
        (total + partitions - 1) / math.max(1, partitions))
      new org.apache.spark.sql.connector.read.partitioning
        .UnknownPartitioning(((total + per - 1) / per).toInt)
    }

  /** Micro-batch stream over the same generated id-space: the offset IS
    * the next doc_id (a totally ordered, replayable position — the
    * Kinesis/Kafka sequence-number analog). Each trigger admits up to
    * `rowsPerBatch` ids; (start, end] offset ranges are re-planned
    * deterministically on recovery, so a checkpointed query resumes
    * exactly-once without source-side state.
    */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftDocsMicroBatchStream(lo, hi, partitions, required,
      rowsPerBatch, bucketSize)

  /** Surfaces the pushed-down state in EXPLAIN (BatchScan prints this):
    * the generation range after filter pushdown and the pruned column
    * set — the DSv2 equivalent of a file scan's PushedFilters/ReadSchema
    * lines, so plan audits can verify pushdown actually reached the
    * source.
    */
  override def description(): String =
    s"GraftDocsScan PushedRange: [$lo, $hi) " +
      s"ReadColumns: ${required.fieldNames.mkString("[", ",", "]")}"

  override def planInputPartitions(): Array[InputPartition] =
    if (bucketed)
      // bucket-aligned splits: id_bucket is constant per split — the
      // precondition for HasPartitionKey
      bucketRange.map { b =>
        GraftDocsPartition(math.max(lo, b * bucketSize),
          math.min(hi, (b + 1) * bucketSize), b)
      }.toArray[InputPartition]
    else {
      val total = math.max(0L, hi - lo)
      val per = math.max(1L, (total + partitions - 1) / math.max(1, partitions))
      Iterator.iterate(lo)(_ + per).takeWhile(_ < hi)
        .map(s => GraftDocsPartition(s, math.min(hi, s + per)))
        .toArray[InputPartition]
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftDocsReaderFactory(required, bucketSize)
}

case class GraftDocsOffset(next: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = next.toString
}

class GraftDocsMicroBatchStream(lo: Long, hi: Long, partitions: Int,
    required: StructType, rowsPerBatch: Long, bucketSize: Long = 0L)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  override def initialOffset(): Offset = GraftDocsOffset(lo)
  override def deserializeOffset(json: String): Offset =
    GraftDocsOffset(json.toLong)
  override def commit(end: Offset): Unit = ()

  /** Admission control: each trigger admits at most `rowsPerBatch` ids
    * past the last committed position — the maxOffsetsPerTrigger
    * backpressure shape, expressed through SupportsAdmissionControl so
    * the pacing is a pure function of the checkpointed offset (no
    * driver-side pacing state; a fresh instance after restart resumes
    * exactly where the checkpoint says).
    */
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GraftDocsOffset].next
    GraftDocsOffset(Admission.admit(s, hi, limit))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "SupportsAdmissionControl sources are driven via latestOffset(start, limit)")

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[GraftDocsOffset].next
    val e = end.asInstanceOf[GraftDocsOffset].next
    val total = math.max(0L, e - s)
    if (total == 0) return Array.empty
    val per = math.max(1L, (total + partitions - 1) / math.max(1, partitions))
    Iterator.iterate(s)(_ + per).takeWhile(_ < e)
      .map(b => GraftDocsPartition(b, math.min(e, b + per)))
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftDocsReaderFactory(required, bucketSize)
  override def stop(): Unit = ()
}

class GraftDocsReaderFactory(required: StructType, bucketSize: Long = 0L)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[GraftDocsPartition]
    new PartitionReader[InternalRow] {
      private var cur = part.start - 1
      override def next(): Boolean = { cur += 1; cur < part.end }
      override def get(): InternalRow = {
        // synthesize ONLY the pruned columns, and the costly text at most
        // ONCE per row even when both text and n_chars are projected
        lazy val text = GraftDocsSource.textFor(cur)
        val values = required.fields.map(_.name).map {
          case "doc_id" => cur
          case "text" => UTF8String.fromString(text)
          case "lang" => UTF8String.fromString(GraftDocsSource.langFor(cur))
          case "n_chars" => text.length.toLong
          case "id_bucket" => cur / math.max(1L, bucketSize)
          case other => throw new IllegalArgumentException(
            s"unknown column $other")
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
