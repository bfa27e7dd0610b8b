package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.changelog.GtidSet

/** Native CDC streaming source (S2): a DataSource-V2 `MicroBatchStream`
  * whose offset IS a MySQL GTID set.
  *
  * Mirrors the reference's binlog reader structure
  * (/root/reference/changelog/mysql.go):
  *  - `readEvents` (:911-968) — tail from a GTID set; here
  *    `latestOffset(start, limit)` advances the set over the replayable log
  *  - `incGTID` (:718-752) — [[GtidSet.add]]: sequential GNOs extend the
  *    last interval, non-sequential GNOs open a new one
  *  - event demux (:754-787) — rows arrive pre-demuxed as
  *    insert/update/delete/ddl with before/after images (:508-544)
  *  - batch admission (:816-864 processBatch caps events per commit) —
  *    `maxEventsPerTrigger` via `SupportsAdmissionControl`, always rounded
  *    up to a TRANSACTION boundary so an offset never splits a gno
  *
  * Scale notes: a binlog is a single ordered stream per source cluster —
  * the reference tails it with one reader per cluster and so does this
  * source (one input partition per micro-batch; parallelism begins at the
  * next stage, where Spark repartitions by row key). Offset planning reads
  * only the (uuid, gno) index, never payloads. Restart safety comes from
  * the checkpointed GTID-set offset: `planInputPartitions(start, end)`
  * replays exactly the transactions in `end \ start`, the same replay
  * contract as `StartSyncGTID` from a saved set.
  */
object BinlogSource {
  val schema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("gtid_uuid", StringType, nullable = false),
    StructField("gno", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("db", StringType, nullable = false),
    StructField("tbl", StringType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("before", StringType, nullable = true),
    StructField("payload", StringType, nullable = false)))
}

class BinlogSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-binlog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = BinlogSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new BinlogTable(properties.asScala.toMap)
}

class BinlogTable(props: Map[String, String]) extends Table with SupportsRead {
  private val path = props.getOrElse("path",
    throw new IllegalArgumentException("graft-binlog requires a path option"))
  override def name(): String = s"graft-binlog($path)"
  override def schema(): StructType = BinlogSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new BinlogScan(path, options.asScala.toMap)
    }
}

class BinlogScan(path: String, options: Map[String, String]) extends Scan {
  override def readSchema(): StructType = BinlogSource.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new BinlogMicroBatchStream(path,
      // CaseInsensitiveStringMap hands options through with lower-cased keys
      options.get("maxeventspertrigger").map(_.toLong))
  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    SourceMetrics.supported
}

/** Offset = GTID set, serialized as `{"gtids":"uuid:1-5,…"}`. */
case class GtidOffset(set: GtidSet) extends Offset {
  override def json(): String = GtidOffset.mapper.writeValueAsString(
    GtidOffset.mapper.createObjectNode().put("gtids", set.serialize))
}

object GtidOffset {
  private val mapper = new ObjectMapper()
  def fromJson(json: String): GtidOffset =
    GtidOffset(GtidSet.parse(mapper.readTree(json).get("gtids").asText))
}

class BinlogMicroBatchStream(path: String, maxEventsPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  // (uuid, gno) per log line — offset planning never touches payloads.
  // The log is read once per stream instance, so it doubles as the
  // Trigger.AvailableNow snapshot (events appended after prepare are not
  // seen until the next run); a live tail would re-list per latestOffset.
  private val confEntries = graft.core.HadoopConf.shipActive()

  private lazy val index: Vector[(String, Long)] =
    BinlogFixture.readIndex(path, graft.core.HadoopConf.rebuild(confEntries))

  override def prepareForTriggerAvailableNow(): Unit = {
    index // force the snapshot read; latestOffset then paces toward its end
  }

  override def initialOffset(): Offset = GtidOffset(GtidSet.empty)

  override def deserializeOffset(json: String): Offset = GtidOffset.fromJson(json)

  override def getDefaultReadLimit: ReadLimit =
    maxEventsPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called with admission control")

  // Amortized planning cursor: the log is in order and the stream's
  // offsets only grow, so an index prefix once contained in the start set
  // stays contained — skip it instead of re-walking the whole (uuid, gno)
  // index every trigger. Driver-side, single-threaded trigger planning;
  // a checkpoint restart gets a fresh stream instance (cursor rebuilds in
  // one pass). Makes per-trigger planning O(batch) amortized instead of
  // O(log length).
  private var scanFrom: Int = 0

  /** Advance the GTID set over unseen transactions, honoring the row cap
    * but never splitting a transaction (the reference's batch boundary is
    * also post-transaction — commitBatch runs between full events).
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startSet = start.asInstanceOf[GtidOffset].set
    val cap = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _ => Long.MaxValue
    }
    while (scanFrom < index.length &&
           startSet.contains(index(scanFrom)._1, index(scanFrom)._2))
      scanFrom += 1
    var set = startSet
    var taken = 0L
    var cur: (String, Long) = null
    var i = scanFrom
    var done = false
    while (i < index.length && !done) {
      val ug = index(i)
      if (startSet.contains(ug._1, ug._2)) i += 1 // interleaved already-seen
      else if (taken < cap || ug == cur) {
        // may exceed cap to finish the current transaction (same (uuid, gno)
        // run); GtidSet.add is idempotent for repeated events of one txn
        set = set.add(ug._1, ug._2)
        taken += 1
        cur = ug
        i += 1
      } else done = true
    }
    GtidOffset(set)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    Array(BinlogInputPartition(path,
      start.asInstanceOf[GtidOffset].set.serialize,
      end.asInstanceOf[GtidOffset].set.serialize,
      confEntries))

  override def createReaderFactory(): PartitionReaderFactory = new BinlogReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class BinlogInputPartition(path: String, startGtids: String, endGtids: String,
                                confEntries: Seq[(String, String)])
    extends InputPartition

class BinlogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[BinlogInputPartition]
    new BinlogPartitionReader(p.path, GtidSet.parse(p.startGtids), GtidSet.parse(p.endGtids),
      p.confEntries)
  }
}

/** Replays the transactions in `end \ start`, in log order.
  *
  * A `mysql://host:port` path is the REAL replication socket: each
  * micro-batch's reader dials the server and sends its start GTID set
  * inside COM_BINLOG_DUMP_GTID — so every micro-batch boundary exercises
  * a genuine reconnect-and-resume on the wire, the `StartSyncGTID`
  * restart contract. (The end-set filter below still applies; the
  * start-set filter is then a no-op because the server already did it.)
  */
class BinlogPartitionReader(path: String, start: GtidSet, end: GtidSet,
                            confEntries: Seq[(String, String)])
    extends PartitionReader[InternalRow] {

  private var rowsEmitted = 0L
  private var bytesRead = 0L
  private var wireRequests = 0L

  private val events: Vector[BinlogFixture.Event] = {
    if (path.startsWith("mysql://")) { wireRequests += 1; BinlogFixture.readSocket(path, start) }
    else BinlogFixture.readCached(path, graft.core.HadoopConf.rebuild(confEntries))
  }

  private val it = events.iterator
    .filter(e => end.contains(e.uuid, e.gno) && !start.contains(e.uuid, e.gno))
  private var current: BinlogFixture.Event = _

  override def next(): Boolean = {
    if (it.hasNext) { current = it.next(); true } else false
  }

  override def get(): InternalRow = {
    val e = current
    rowsEmitted += 1
    bytesRead += e.payload.length + (if (e.before == null) 0 else e.before.length)
    new GenericInternalRow(Array[Any](
      e.seq, UTF8String.fromString(e.uuid), e.gno,
      UTF8String.fromString(e.op), UTF8String.fromString(e.db),
      UTF8String.fromString(e.tbl), e.ts,
      if (e.before == null) null else UTF8String.fromString(e.before),
      UTF8String.fromString(e.payload)))
  }

  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(SourceMetrics.Task("graftRowsEmitted", () => rowsEmitted),
      SourceMetrics.Task("graftBytesRead", () => bytesRead),
      SourceMetrics.Task("graftWireRequests", () => wireRequests))

  override def close(): Unit = ()
}
