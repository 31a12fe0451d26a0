package graft.sources.v2

import java.util

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 WRITE path — the half of the connector API
  * [[GraftDocsSource]] doesn't exercise: a writable (and readable-back)
  * in-JVM table store behind Spark's two-phase commit protocol. The
  * reference hands this seam to managed sinks (Delta writes,
  * `KINESIS:174-192`); this is the same contract through the public API.
  *
  * What the protocol buys, spec-verified:
  *  - **Task stage → driver install.** Each task's `DataWriter` buffers
  *    its partition and returns the rows as a `WriterCommitMessage`;
  *    NOTHING reaches the table until the driver's `BatchWrite.commit`
  *    installs all messages atomically. A failed/aborted task's buffer is
  *    dropped, and of a speculative duplicate pair only the one message
  *    Spark accepts is committed — no partial or double writes.
  *  - **Truncate-on-overwrite.** `mode("overwrite")` arrives via
  *    `SupportsTruncate`; the swap happens inside the same atomic commit.
  *  - **Idempotent streaming epochs.** `StreamingWrite.commit(epochId,…)`
  *    installs each epoch at most once per QUERY (`(table, queryId,
  *    epoch)` registry — epoch ids are per-query counters, so a second
  *    query with a fresh checkpoint legitimately restarts at epoch 0): a
  *    replayed micro-batch after checkpoint recovery is a no-op — the
  *    foreachBatch-with-txn-table pattern, natively.
  *
  * Values are staged as plain JVM types (UTF8String→String at the task
  * boundary) so commit messages serialize; the store is a process-local
  * `TrieMap` — the durable analog at scale is any object store, the
  * protocol is identical.
  */
class GraftStoreSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val t = GraftStoreSink.tableName(options)
    GraftStore.schemas.getOrElse(t,
      throw new IllegalArgumentException(
        s"graftstore table '$t' does not exist yet — write it first"))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftStoreTable(
      GraftStoreSink.tableName(
        new CaseInsensitiveStringMap(properties)), schema)
}

object GraftStoreSink {
  def tableName(options: CaseInsensitiveStringMap): String =
    Option(options.get("table")).getOrElse(
      throw new IllegalArgumentException("option 'table' is required"))
}

/** The process-local committed state: rows + schema per table, and the
  * streaming epoch registry that makes replayed commits no-ops.
  */
object GraftStore {
  val schemas: TrieMap[String, StructType] = TrieMap.empty
  private val tables: TrieMap[String, Vector[Array[Any]]] = TrieMap.empty
  private val epochs: TrieMap[(String, String, Long), Boolean] = TrieMap.empty
  private val layouts: TrieMap[String, Map[Int, Array[Array[Any]]]] =
    TrieMap.empty

  /** Last BATCH write's physical layout: writer partition id → the rows
    * that writer received, in arrival order. Test observability for
    * `RequiresDistributionAndOrdering` (clustered keys land in exactly
    * one writer; requested sort holds within each writer).
    */
  def lastLayout(table: String): Map[Int, Array[Array[Any]]] =
    layouts.getOrElse(table, Map.empty)

  def recordLayout(table: String,
      layout: Map[Int, Array[Array[Any]]]): Unit =
    layouts.update(table, layout)

  def rows(table: String): Vector[Array[Any]] =
    tables.getOrElse(table, Vector.empty)

  def install(table: String, schema: StructType,
      staged: Seq[Array[Any]], truncate: Boolean): Unit = synchronized {
    schemas.update(table, schema)
    val base = if (truncate) Vector.empty else rows(table)
    tables.update(table, base ++ staged)
  }

  /** Epoch-idempotent install: returns false (and changes nothing) if
    * this (table, QUERY, epoch) already committed — the streaming
    * exactly-once contract under micro-batch replay. The query id is
    * part of the key because epoch ids are per-query counters: a SECOND
    * streaming query (fresh checkpoint) appending to the same table
    * restarts at epoch 0, and keying by (table, epoch) alone would
    * silently drop its first epochs as "replays".
    */
  def installEpoch(table: String, schema: StructType, queryId: String,
      epochId: Long, staged: Seq[Array[Any]]): Boolean = synchronized {
    if (epochs.putIfAbsent((table, queryId, epochId), true).isDefined) false
    else { install(table, schema, staged, truncate = false); true }
  }

  /** Register an empty table (the catalog's CREATE TABLE). */
  def createEmpty(table: String, schema: StructType): Unit = synchronized {
    schemas.update(table, schema)
  }

  def drop(table: String): Unit = synchronized {
    tables.remove(table); schemas.remove(table); layouts.remove(table)
    epochs.keys.filter(_._1 == table).foreach(epochs.remove)
  }
}

class GraftStoreTable(table: String, schema0: StructType)
    extends Table with SupportsWrite with SupportsRead {
  override def name(): String = s"graftstore($table)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftStoreWriteBuilder(table, info.schema(), info.queryId(),
      Option(info.options.get("clusterBy"))
        .map(_.split(",").map(_.trim).filter(_.nonEmpty)).getOrElse(Array.empty),
      Option(info.options.get("orderBy"))
        .map(_.split(",").map(_.trim).filter(_.nonEmpty)).getOrElse(Array.empty),
      Option(info.options.get("numPartitions")).map(_.toInt).getOrElse(0))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new GraftStoreScan(table,
        GraftStore.schemas.getOrElse(table, schema0))
    }
}

/** Write builder; with `clusterBy` (comma-separated columns, optionally
  * plus `orderBy`) the produced [[Write]] implements
  * `RequiresDistributionAndOrdering` — the DSv2 seam through which a real
  * table format (Iceberg's write.distribution-mode, Delta's optimized
  * write) asks SPARK to insert the clustering exchange and in-partition
  * sort before rows reach the writers. At 100 TB this is what keeps one
  * writer per key-group (no small-file explosion, no writer-side
  * re-buffering): the engine shuffles once, the sink just streams sorted
  * runs. Ordering is requested as clusterBy ++ orderBy so each writer
  * sees its key groups as contiguous sorted runs. `numPartitions` pins
  * the writer count (Iceberg's fixed distribution mode) — 0 leaves it to
  * the engine, where AQE sizes/coalesces the exchange by data volume.
  */
class GraftStoreWriteBuilder(table: String, schema: StructType,
    queryId: String, clusterBy: Array[String] = Array.empty,
    orderBy: Array[String] = Array.empty, numPartitions: Int = 0)
    extends WriteBuilder with SupportsTruncate {
  import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
  import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write =
    if (clusterBy.isEmpty) plainWrite
    else new Write with RequiresDistributionAndOrdering {
      override def requiredDistribution(): Distribution =
        Distributions.clustered(
          clusterBy.map(c => Expressions.identity(c): org.apache.spark.sql.connector.expressions.Expression))
      override def requiredOrdering(): Array[SortOrder] =
        (clusterBy ++ orderBy).map(c =>
          Expressions.sort(Expressions.identity(c), SortDirection.ASCENDING))
      override def requiredNumPartitions(): Int = numPartitions
      override def toBatch: BatchWrite =
        new GraftStoreBatchWrite(table, schema, truncateFirst)
      override def toStreaming: StreamingWrite =
        new GraftStoreStreamingWrite(table, schema, queryId)
    }
  private def plainWrite: Write = new Write {
    override def toBatch: BatchWrite =
      new GraftStoreBatchWrite(table, schema, truncateFirst)
    override def toStreaming: StreamingWrite =
      new GraftStoreStreamingWrite(table, schema, queryId)
  }
}

/** Rows staged by one task, carried to the driver for the atomic commit.
  * Carries the writer's partition id so the committed layout (which rows
  * which writer received, in what order) is auditable — the observable a
  * clustered-write spec checks.
  */
case class GraftStoreCommitMessage(partitionId: Int, rows: Array[Array[Any]])
    extends WriterCommitMessage

class GraftStoreBatchWrite(table: String, schema: StructType,
    truncateFirst: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = new GraftStoreWriterFactory(schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.toSeq.map(_.asInstanceOf[GraftStoreCommitMessage])
    GraftStore.recordLayout(table,
      msgs.map(m => m.partitionId -> m.rows).toMap)
    GraftStore.install(table, schema, msgs.flatMap(_.rows), truncateFirst)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class GraftStoreStreamingWrite(table: String, schema: StructType,
    queryId: String) extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory = new GraftStoreWriterFactory(schema)
  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    GraftStore.installEpoch(table, schema, queryId, epochId,
      messages.toSeq.flatMap(
        _.asInstanceOf[GraftStoreCommitMessage].rows))
  // layout audit is batch-only: streaming epochs interleave
  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = ()
}

class GraftStoreWriterFactory(schema: StructType)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] = writer(partitionId)
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] = writer(partitionId)

  private def writer(partitionId: Int): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = Vector.newBuilder[Array[Any]]
      override def write(row: InternalRow): Unit =
        // Spark REUSES the InternalRow buffer between write() calls, so
        // every buffer-backed view must be deep-copied at the task
        // boundary: UTF8String → String (also makes the commit message a
        // plain JVM value), and Unsafe array/map/struct views → .copy()
        // (without it, every staged row would alias the LAST row's bytes)
        buf += schema.fields.zipWithIndex.map { case (f, i) =>
          row.get(i, f.dataType) match {
            case s: UTF8String => s.toString
            case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
            case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
            case r: InternalRow => r.copy()
            case other => other
          }
        }
      override def commit(): WriterCommitMessage =
        GraftStoreCommitMessage(partitionId, buf.result().toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}

case class GraftStorePartition(rows: Array[Array[Any]])
    extends InputPartition

class GraftStoreScan(table: String, schema0: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = schema0
  override def toBatch: Batch = this
  override def description(): String = s"GraftStoreScan($table)"

  override def planInputPartitions(): Array[InputPartition] = {
    // snapshot at planning time; split into a few parallel chunks
    val all = GraftStore.rows(table)
    val n = math.max(1, math.min(4, all.size))
    val per = math.max(1, (all.size + n - 1) / n)
    all.grouped(per).map(g => GraftStorePartition(g.toArray))
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition)
          : PartitionReader[InternalRow] = {
        val rows = p.asInstanceOf[GraftStorePartition].rows
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow =
            InternalRow.fromSeq(rows(i).toIndexedSeq.map {
              case s: String => UTF8String.fromString(s)
              case other => other
            })
          override def close(): Unit = ()
        }
      }
    }
}
