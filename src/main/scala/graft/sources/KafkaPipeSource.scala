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

import graft.pipes.LoopbackPipe

/** Streaming consumer over the loopback Kafka-shaped pipe (S3): a
  * DataSource-V2 `MicroBatchStream` whose offset is the per-partition
  * offset map — exactly the `kafka_offsets` shape the reference persists
  * (/root/reference/pipe/kafka.go:152-156,188-211).
  *
  * Unlike the binlog source (one ordered stream), a topic has N
  * independent partitions: `planInputPartitions` emits one input split per
  * topic-partition, so consumption parallelism == partition count, the
  * same scaling rule as Kafka itself. Admission control spreads
  * `maxOffsetsPerTrigger` across partitions proportionally to their
  * backlog (Spark's Kafka source behavior).
  */
object KafkaPipeSource {
  val schema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = false),
    StructField("ts", LongType, nullable = false)))
}

class KafkaPipeSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kafka"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = KafkaPipeSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KafkaPipeTable(properties.asScala.toMap)
}

class KafkaPipeTable(props: Map[String, String]) extends Table with SupportsRead {
  private val path = props.getOrElse("path",
    throw new IllegalArgumentException("graft-kafka requires a path option (topic dir)"))
  override def name(): String = s"graft-kafka($path)"
  override def schema(): StructType = KafkaPipeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new KafkaPipeScan(path, options.asScala.toMap)
    }
}

// (custom metrics are declared on KafkaPipeScan and emitted per task by
// KafkaPipePartitionReader — see graft.sources.SourceMetrics)

class KafkaPipeScan(path: String, options: Map[String, String]) extends Scan {
  override def readSchema(): StructType = KafkaPipeSource.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new KafkaPipeMicroBatchStream(path, options.get("maxoffsetspertrigger").map(_.toLong),
      options.get("targetrowspertrigger").map(_.toLong),
      options.get("ratewindowtriggers").map(_.toInt).getOrElse(4),
      options.get("groupmemberslog"))
  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    SourceMetrics.supported
}

/** Offset = per-partition next-offset map `{"offsets":{"0":5,"1":3}}`. */
case class PartitionOffsets(offsets: Map[Int, Long]) extends Offset {
  override def json(): String = {
    val m = PartitionOffsets.mapper
    val root = m.createObjectNode()
    val o = root.putObject("offsets")
    offsets.toSeq.sortBy(_._1).foreach { case (p, v) => o.put(p.toString, v) }
    m.writeValueAsString(root)
  }
}

object PartitionOffsets {
  private val mapper = new ObjectMapper()
  def fromJson(json: String): PartitionOffsets = {
    val n = mapper.readTree(json).get("offsets")
    val it = n.properties().iterator()
    val b = Map.newBuilder[Int, Long]
    while (it.hasNext) { val e = it.next(); b += (e.getKey.toInt -> e.getValue.asLong) }
    PartitionOffsets(b.result())
  }
}

class KafkaPipeMicroBatchStream(path: String, maxOffsetsPerTrigger: Option[Long],
                                targetRowsPerTrigger: Option[Long] = None,
                                rateWindowTriggers: Int = 4,
                                groupMembersLog: Option[String] = None)
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private val confEntries = graft.core.HadoopConf.shipActive()

  // ADAPTIVE rate targeting (the reference's throttle.Advice loop,
  // /root/reference/throttle/throttle.go, re-expressed as admission
  // control): each trigger is one interval of the sliding window, and
  // the budget keeps the windowed average at targetRowsPerTrigger.
  // Deterministic — triggers, not wall time, advance the window; state
  // resets on checkpoint restart (the rate window is advisory, offsets
  // carry correctness).
  private val rate = targetRowsPerTrigger.map(t =>
    new graft.stream.RateAdvice(t, rateWindowTriggers))
  private var lastAdmitted = 0L

  // a kafka://host:port/topic path consumes a live broker over the REAL
  // wire protocol: Metadata for the partition map, ListOffsets(-1) for
  // ends — the same calls a sarama consumer's admission logic makes
  private def listEnds(): Map[Int, Long] =
    if (path.startsWith("kafka://")) {
      val topic = graft.pipes.KafkaWire.parseUrl(path)._3.getOrElse(
        throw new IllegalArgumentException(s"kafka:// path needs /topic: $path"))
      val n = graft.pipes.KafkaWire.partitionCount(path, topic)
      (0 until n).map(p => p -> graft.pipes.KafkaWire.listOffset(path, topic, p)).toMap
    } else LoopbackPipe.endOffsets(path, graft.core.HadoopConf.rebuild(confEntries))

  // Trigger.AvailableNow snapshot of the log's end, fixed at prepare time
  private var availableEnds: Option[Map[Int, Long]] = None

  override def prepareForTriggerAvailableNow(): Unit = { availableEnds = Some(listEnds()) }

  override def initialOffset(): Offset = PartitionOffsets(Map.empty)

  override def deserializeOffset(json: String): Offset = PartitionOffsets.fromJson(json)

  override def getDefaultReadLimit: ReadLimit =
    maxOffsetsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("admission-control latestOffset is used")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startMap = start.asInstanceOf[PartitionOffsets].offsets.withDefaultValue(0L)
    val ends = availableEnds.getOrElse(listEnds())
    val backlog = ends.map { case (p, e) => p -> math.max(0L, e - startMap(p)) }
    val total = backlog.values.sum
    val hardCap = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _ => Long.MaxValue
    }
    val cap = rate match {
      // floor at 1: a zero budget must still make progress, or a bounded
      // Trigger.AvailableNow drain reads "no new offsets" as caught-up
      // and terminates with rows unread; with processing-time triggers
      // the 1-row trickle is the idle-interval minimum, and the window
      // recovers the true budget as it slides
      case Some(r) => math.min(hardCap, math.max(1L, r.admit(lastAdmitted)))
      case None => hardCap
    }
    val next =
      if (total <= cap) ends
      else {
        // Proportional allocation, at least 1 from each non-empty backlog
        // while budget lasts. BigInt keeps cap*b exact for arbitrarily
        // large caps/backlogs (a Long multiply can overflow negative here
        // since this branch only requires cap < total). Partitions are
        // visited in id order, so when the budget runs out the TAIL
        // partitions may receive 0 rows this trigger — they drain in
        // subsequent triggers as the head partitions advance.
        var remaining = cap
        backlog.toSeq.sortBy(_._1).map { case (p, b) =>
          val prop = (BigInt(cap) * BigInt(b) / BigInt(total)).toLong
          val share = math.min(b, math.max(if (b > 0) 1L else 0L, prop))
          val take = math.min(share, remaining)
          remaining -= take
          p -> (startMap(p) + take)
        }.toMap
      }
    val endMap = next.map { case (p, e) => p -> math.max(e, startMap(p)) }
    lastAdmitted = endMap.map { case (p, e) => e - startMap(p) }.sum
    PartitionOffsets(endMap)
  }

  // group mode: trigger counter for the member-log lookup. Planning is
  // driver-side and single-threaded per stream instance; on a checkpoint
  // restart the counter resets, which can only change which MEMBER reads
  // a partition's replayed range — row correctness rides the offsets.
  private var groupTrigger = 0

  /** Member count in effect for trigger `idx`: line idx of the member
    * log (1-based counts, last line sticks once the log is exhausted).
    * The file is the join/leave schedule — rewriting it mid-stream is
    * how a live membership change reaches the next trigger's plan.
    */
  private def membersAt(idx: Int): Int = groupMembersLog.map { f =>
    val lines = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)),
      java.nio.charset.StandardCharsets.UTF_8)
      .linesIterator.map(_.trim).filter(_.nonEmpty).map(_.toInt).toVector
    require(lines.nonEmpty, s"empty group members log: $f")
    lines(math.min(idx, lines.size - 1))
  }.getOrElse(0)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PartitionOffsets].offsets.withDefaultValue(0L)
    val e = end.asInstanceOf[PartitionOffsets].offsets
    val perPartition = e.toSeq.sortBy(_._1).collect {
      case (p, until) if until > s(p) =>
        KafkaPipeInputPartition(path, p, s(p), until, confEntries)
    }
    if (groupMembersLog.isEmpty) return perPartition.toArray
    // GROUP MODE — the reference's in-process consumer-group shape
    // composed with the engine: this trigger's partitions are split
    // among N member readers with the SAME contiguous partsPerConsumer
    // arithmetic the live TopicGroup rebalancer uses
    // (pipe/kafka.go:245-289 via TopicGroup.contiguousSplit), so a
    // join/leave between triggers re-splits partition ownership
    // mid-stream while the offset ranges — and therefore the rows —
    // stay exact. Assignment is computed over the topic's FULL sorted
    // partition list (the reference splits all partitions, drained or
    // not), then empty members drop out.
    val nMembers = membersAt(groupTrigger)
    groupTrigger += 1
    val allParts = e.keys.toSeq.sorted
    val assign = graft.pipes.TopicGroup.contiguousSplit(allParts.size, nMembers)
    val owner = allParts.zipWithIndex.map { case (p, i) => p -> assign(i) }.toMap
    perPartition.groupBy(ip => owner(ip.partition)).toSeq.sortBy(_._1)
      .map { case (member, ips) =>
        KafkaPipeGroupInputPartition(member, ips.sortBy(_.partition))
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new KafkaPipeReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class KafkaPipeInputPartition(path: String, partition: Int, from: Long, until: Long,
                                   confEntries: Seq[(String, String)])
    extends InputPartition

/** Group-mode split: ONE reader (= one group member) drains its assigned
  * topic partitions sequentially — the task-level analogue of a
  * TopicGroup consumer's pump set for this trigger.
  */
case class KafkaPipeGroupInputPartition(member: Int, parts: Seq[KafkaPipeInputPartition])
    extends InputPartition

class KafkaPipeReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: KafkaPipeInputPartition => new KafkaPipePartitionReader(p)
      case g: KafkaPipeGroupInputPartition => new KafkaPipeGroupReader(g)
    }
}

/** Chains one [[KafkaPipePartitionReader]] per assigned partition, in
  * partition order — records within a partition keep offset order, the
  * per-member interleaving across partitions is immaterial to the
  * at-least-once set contract (same as a TopicGroup member's pumps).
  */
class KafkaPipeGroupReader(g: KafkaPipeGroupInputPartition)
    extends PartitionReader[InternalRow] {
  private val queue = g.parts.iterator
  private var cur: KafkaPipePartitionReader = _
  private var done = false
  // metrics roll up across completed inner readers, not just the live one
  private var doneTotals = Map.empty[String, Long]

  private def retire(r: KafkaPipePartitionReader): Unit = {
    r.currentMetricsValues().foreach { m =>
      doneTotals = doneTotals.updated(m.name,
        doneTotals.getOrElse(m.name, 0L) + m.value)
    }
    r.close()
  }

  override def next(): Boolean = {
    if (done) return false
    while (cur == null || !cur.next()) {
      if (cur != null) retire(cur)
      if (!queue.hasNext) { cur = null; done = true; return false }
      cur = new KafkaPipePartitionReader(queue.next())
    }
    true
  }

  override def get(): InternalRow = cur.get()

  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] = {
    val live = if (cur != null)
      cur.currentMetricsValues().map(m => m.name -> m.value).toMap
    else Map.empty[String, Long]
    (doneTotals.keySet ++ live.keySet).toArray.map { name =>
      SourceMetrics.Task(name,
        { val v = doneTotals.getOrElse(name, 0L) + live.getOrElse(name, 0L); () => v })
    }
  }

  override def close(): Unit = if (cur != null) cur.close()
}

class KafkaPipePartitionReader(p: KafkaPipeInputPartition)
    extends PartitionReader[InternalRow] {

  private var rowsEmitted = 0L
  private var bytesRead = 0L
  private var wireRequests = 0L

  /** `kafka://` splits consume their range via wire Fetch calls from
    * `from`, looping because the broker's maxBytes bound may trim a
    * response to a whole-message prefix — exactly a consumer's poll loop.
    */
  private def fetchRange(): Iterator[LoopbackPipe.Record] = {
    val topic = graft.pipes.KafkaWire.parseUrl(p.path)._3.get
    val buf = Vector.newBuilder[LoopbackPipe.Record]
    var off = p.from
    var stalled = false
    var maxBytes = 1 << 22
    while (off < p.until && !stalled) {
      wireRequests += 1
      val (recs, hw) = graft.pipes.KafkaWire.fetch(p.path, topic, p.partition, off, maxBytes)
      if (recs.isEmpty) {
        // An empty response is NOT proof the range is drained: the broker
        // trims to a whole-message prefix within maxBytes, so a single
        // record larger than the budget trims to zero. The high watermark
        // distinguishes the cases — below it, grow the budget and retry
        // (a consumer's fetch.max.bytes escalation); silently stopping
        // would drop the rest of the planned range from the micro-batch.
        if (off < math.min(hw, p.until)) {
          if (maxBytes >= (1 << 28))
            throw new java.io.IOException(
              s"record at $topic/${p.partition} offset $off exceeds $maxBytes-byte fetch budget")
          maxBytes = maxBytes << 2
        } else stalled = true // planned range beyond the log: stop, don't spin
      }
      else recs.iterator.takeWhile(_.offset < p.until).foreach { r =>
        buf += LoopbackPipe.Record(p.partition, r.offset,
          if (r.key == null) null else new String(r.key, java.nio.charset.StandardCharsets.UTF_8),
          new String(r.value, java.nio.charset.StandardCharsets.UTF_8), r.ts)
        off = r.offset + 1
      }
    }
    buf.result().iterator
  }

  private val it =
    if (p.path.startsWith("kafka://")) fetchRange()
    else LoopbackPipe.readPartition(p.path, p.partition, p.from, p.until,
      graft.core.HadoopConf.rebuild(p.confEntries))
  private var current: LoopbackPipe.Record = _

  override def next(): Boolean = {
    if (it.hasNext) { current = it.next(); true } else false
  }

  override def get(): InternalRow = {
    val r = current
    rowsEmitted += 1
    bytesRead += r.value.length + (if (r.key == null) 0 else r.key.length)
    new GenericInternalRow(Array[Any](
      r.partition, r.offset,
      if (r.key == null) null else UTF8String.fromString(r.key),
      UTF8String.fromString(r.value), r.ts))
  }

  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(SourceMetrics.Task("graftRowsEmitted", () => rowsEmitted),
      SourceMetrics.Task("graftBytesRead", () => bytesRead),
      SourceMetrics.Task("graftWireRequests", () => wireRequests))

  override def close(): Unit = ()
}
