package graft.sources

import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-log` — a file-backed streaming connector with Kafka's wire
  * shape, built on the full DataSourceV2 surface (TableProvider →
  * SupportsRead/SupportsWrite → MicroBatchStream / StreamingWrite).
  *
  * The reference's primary source/sink is a Kafka topic
  * (HotItemsAnalysis/.../app/HotItems.scala:37-48, producer
  * KafkaProducer.scala:19-32); no Kafka connector jar exists in this
  * image (BASELINE.md probe), so this connector supplies the SAME
  * semantics — an append-only, offset-addressed record log with
  * replayable consumption — over a directory:
  *
  *  - the log is a directory of immutable segment files named
  *    `seg-<seq 6>-<count>.log`, one record per line. The record COUNT
  *    is part of the name, so computing the latest offset is a
  *    metadata-only directory listing — the driver never opens a data
  *    file to plan a micro-batch (the property that keeps the source
  *    cheap when a 100 TB log holds millions of segments; a production
  *    deployment would shard the listing, not the read path);
  *  - an offset is the total record count across the name-ordered
  *    segments (exactly Kafka's per-partition monotone long). A
  *    micro-batch [start, end) maps to per-segment (skip, take) slices
  *    — one InputPartition per touched segment, so replay of any
  *    checkpointed range is exact and parallel;
  *  - the sink stages each task's rows in a hidden temp file and the
  *    DRIVER commit renames them into sequence — readers list only
  *    `seg-*` names, so half-written data is never visible (rename is
  *    the commit point, atomic on HDFS-like stores). A per-epoch
  *    marker file makes the streaming commit idempotent: a replayed
  *    epoch (crash between sink commit and offset-log write) is
  *    detected and its temp files discarded instead of re-appended.
  *
  * Wire schema (read side): `value STRING, offset LONG`. The write side
  * requires a `value` STRING column and ignores the rest — the same
  * contract as the Kafka sink. Records are newline-delimited, so
  * `value` must not contain '\n' (CSV/JSON payloads — the reference's
  * own wire format — never do).
  */
object GraftLog {
  val Schema: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("offset", LongType, nullable = false)))

  private val SegName = """seg-(\d{6})-(\d+)\.log""".r

  final case class Segment(path: String, seq: Long, count: Long)

  def fs(dir: String, conf: Configuration): FileSystem =
    new Path(dir).getFileSystem(conf)

  /** Name-ordered segments; count comes from the file NAME (no data
    * reads). Temp files and epoch markers are filtered by the pattern.
    */
  def segments(dir: String, conf: Configuration): Seq[Segment] = {
    val p = new Path(dir)
    val f = fs(dir, conf)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.flatMap { st =>
      st.getPath.getName match {
        case SegName(seq, cnt) => Some(Segment(st.getPath.toString, seq.toLong, cnt.toLong))
        case _ => None
      }
    }.sortBy(_.seq)
  }

  def totalCount(dir: String, conf: Configuration): Long =
    segments(dir, conf).map(_.count).sum

  def segName(seq: Long, count: Long): String = f"seg-$seq%06d-$count%d.log"
}

class GraftLogDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-log"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = GraftLog.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "graft-log requires option(\"path\", ...)")
    new GraftLogTable(path)
  }
}

class GraftLogTable(path: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-log:$path"
  override def schema(): StructType = GraftLog.Schema
  // ACCEPT_ANY_SCHEMA: the sink takes any frame WITH a `value` STRING
  // column (validated in newWriteBuilder) — the Kafka-sink contract —
  // instead of demanding the full read schema (`offset` is assigned by
  // the log, never supplied by the writer).
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val maxPerTrigger = Option(options.get("maxRecordsPerTrigger")).map(_.toLong)
    new ScanBuilder { override def build(): Scan = new GraftLogScan(path, maxPerTrigger) }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val valueIdx = info.schema().fieldIndex("value")
    require(info.schema()(valueIdx).dataType == StringType,
      "graft-log sink requires a STRING `value` column")
    new WriteBuilder {
      override def build(): Write = new GraftLogWrite(path, valueIdx)
    }
  }
}

// ------------------------------------------------------------ read side

class GraftLogScan(path: String, maxPerTrigger: Option[Long] = None) extends Scan {
  override def readSchema(): StructType = GraftLog.Schema
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      GraftLogMicroBatchStream.slices(path, 0L, GraftLog.totalCount(path, new Configuration()))
    override def createReaderFactory(): PartitionReaderFactory = new GraftLogReaderFactory
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftLogMicroBatchStream(path, maxPerTrigger)
}

final case class GraftLogOffset(count: Long) extends Offset {
  override def json(): String = count.toString
}

object GraftLogMicroBatchStream {
  /** [start, end) record range → per-segment (skip, take) slices. */
  def slices(path: String, start: Long, end: Long): Array[InputPartition] = {
    val segs = GraftLog.segments(path, new Configuration())
    val out = Array.newBuilder[InputPartition]
    var base = 0L
    for (s <- segs) {
      val lo = math.max(start, base)
      val hi = math.min(end, base + s.count)
      if (lo < hi)
        out += GraftLogInputPartition(s.path, skip = lo - base, take = hi - lo, firstOffset = lo)
      base += s.count
    }
    out.result()
  }
}

/** Micro-batch stream with optional admission control: with
  * `maxRecordsPerTrigger` set (the Kafka `maxOffsetsPerTrigger`
  * contract), each micro-batch advances at most that many records, so
  * a full-log replay becomes a sequence of bounded batches — the shape
  * a production backlog drain actually runs, and what StreamBench
  * measures. Under Trigger.AvailableNow the end offset is pinned at
  * prepare time: the engine drains [start, pinned-end) in rate-limited
  * batches and stops, even if a writer appends concurrently.
  */
class GraftLogMicroBatchStream(path: String, maxPerTrigger: Option[Long] = None)
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxRows}

  private val conf = new Configuration()
  @volatile private var availableNowEnd: Option[Long] = None

  override def initialOffset(): Offset = GraftLogOffset(0L)
  // legacy entry point — the engine calls the admission-control
  // overload below once SupportsAdmissionControl is implemented
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[GraftLogOffset].count
    val avail = availableNowEnd.getOrElse(GraftLog.totalCount(path, conf))
    val end = limit match {
      case r: ReadMaxRows => math.min(avail, from + r.maxRows)
      case _ => avail
    }
    GraftLogOffset(math.max(end, from))
  }

  override def reportLatestOffset(): Offset =
    GraftLogOffset(GraftLog.totalCount(path, conf))

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(GraftLog.totalCount(path, conf))

  override def deserializeOffset(json: String): Offset = GraftLogOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    GraftLogMicroBatchStream.slices(path,
      start.asInstanceOf[GraftLogOffset].count, end.asInstanceOf[GraftLogOffset].count)
  override def createReaderFactory(): PartitionReaderFactory = new GraftLogReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class GraftLogInputPartition(file: String, skip: Long, take: Long,
    firstOffset: Long) extends InputPartition

class GraftLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftLogReader(partition.asInstanceOf[GraftLogInputPartition])
}

class GraftLogReader(p: GraftLogInputPartition) extends PartitionReader[InternalRow] {
  private val in = {
    val f = GraftLog.fs(p.file, new Configuration())
    new java.io.BufferedReader(
      new java.io.InputStreamReader(f.open(new Path(p.file)), "UTF-8"))
  }
  private var skipped = 0L
  private var emitted = 0L
  private var line: String = _

  override def next(): Boolean = {
    while (skipped < p.skip) { in.readLine(); skipped += 1 }
    if (emitted >= p.take) false
    else {
      line = in.readLine()
      line != null && { emitted += 1; true }
    }
  }
  override def get(): InternalRow =
    InternalRow(UTF8String.fromString(line), p.firstOffset + emitted - 1)
  override def close(): Unit = in.close()
}

// ----------------------------------------------------------- write side

class GraftLogWrite(path: String, valueIdx: Int) extends Write {
  override def toBatch: BatchWrite = new GraftLogBatchWrite(path, valueIdx)
  override def toStreaming: StreamingWrite = new GraftLogStreamingWrite(path, valueIdx)
}

final case class GraftLogTaskCommit(tmpPath: String, count: Long, partitionId: Int)
  extends WriterCommitMessage

/** Ships to executors — a standalone case class (no reference back to
  * the driver-side Write object, which is not serializable).
  */
final case class GraftLogWriterFactory(dir: String, valueIdx: Int)
  extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftLogDataWriter(dir, valueIdx, partitionId)
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new GraftLogDataWriter(dir, valueIdx, partitionId)
}

/** Task-side writer: stage all rows in one hidden temp file; the path
  * travels back to the driver in the commit message. Nothing under a
  * `seg-*` name is touched until the driver commit.
  */
class GraftLogDataWriter(dir: String, valueIdx: Int, partitionId: Int)
  extends DataWriter[InternalRow] {
  private val tmp = new Path(dir, s".tmp-${UUID.randomUUID()}")
  private val f = GraftLog.fs(dir, new Configuration())
  private val out = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(f.create(tmp, true), "UTF-8"))
  private var n = 0L

  override def write(row: InternalRow): Unit = {
    val v = row.getUTF8String(valueIdx).toString
    require(!v.contains('\n'), "graft-log records are newline-delimited; value must not contain \\n")
    out.write(v); out.write('\n'); n += 1
  }
  override def commit(): WriterCommitMessage = {
    out.close(); GraftLogTaskCommit(tmp.toString, n, partitionId)
  }
  override def abort(): Unit = { out.close(); f.delete(tmp, false); () }
  override def close(): Unit = ()
}

object GraftLogCommit {
  /** Driver-side commit: rename staged temp files into the next
    * sequence slots, ordered by partitionId so a replayed epoch would
    * produce the identical segment layout. Rename-into-name IS the
    * commit point — readers never list temp files.
    */
  def renameIntoSequence(dir: String, messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    val f = GraftLog.fs(dir, conf)
    f.mkdirs(new Path(dir))
    var seq = GraftLog.segments(dir, conf).lastOption.map(_.seq + 1).getOrElse(0L)
    for (m <- messages.collect { case c: GraftLogTaskCommit => c }.sortBy(_.partitionId)) {
      if (m.count == 0L) f.delete(new Path(m.tmpPath), false)
      else {
        f.rename(new Path(m.tmpPath), new Path(dir, GraftLog.segName(seq, m.count)))
        seq += 1
      }
    }
  }

  def dropTemps(dir: String, messages: Array[WriterCommitMessage]): Unit = {
    val f = GraftLog.fs(dir, new Configuration())
    messages.collect { case c: GraftLogTaskCommit => c }
      .foreach(m => f.delete(new Path(m.tmpPath), false))
  }
}

class GraftLogBatchWrite(dir: String, valueIdx: Int) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    GraftLogWriterFactory(dir, valueIdx)
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    GraftLogCommit.renameIntoSequence(dir, messages)
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    GraftLogCommit.dropTemps(dir, messages)
}

/** Streaming commit is IDEMPOTENT per epoch: foreachBatch-style replay
  * (crash between this commit and the engine's offset-log write) calls
  * commit again with the same epochId; the `_epoch-<id>` marker makes
  * the second call drop its temps instead of appending duplicates —
  * the same at-least-once → effectively-once upgrade `aggMergeBatch`
  * does with its last_batch stamp. Markers and the log must be deleted
  * together with the query checkpoint (epoch ids restart at 0).
  */
class GraftLogStreamingWrite(dir: String, valueIdx: Int) extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    GraftLogWriterFactory(dir, valueIdx)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    val f = GraftLog.fs(dir, conf)
    val marker = new Path(dir, s"_epoch-$epochId")
    if (f.exists(marker)) GraftLogCommit.dropTemps(dir, messages)
    else {
      GraftLogCommit.renameIntoSequence(dir, messages)
      f.create(marker, true).close()
    }
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    GraftLogCommit.dropTemps(dir, messages)
}
