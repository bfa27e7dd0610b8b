package graft.pipes

import java.util.concurrent.{CountDownLatch, SynchronousQueue, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.apache.hadoop.conf.Configuration

/** In-process consumer-group redistribution over a loopback topic — the
  * reference's OWN rebalance model. storagetapper does not use Kafka's
  * group-coordinator protocol: it splits a topic's partitions among the
  * N consumers registered in the same process and re-splits on every
  * join/leave (/root/reference/pipe/kafka.go:226-292
  * `redistributeConsumers`, registration at :325-361 `NewConsumer`,
  * removal at :431-481 `closeConsumer`), with offsets persisted
  * out-of-band (`kafka_offsets`, kafka.go:370-402) rather than in a
  * broker group.
  *
  * Semantics reproduced here, over [[LoopbackPipe]] topics:
  *  - assignment is the reference's contiguous best-effort-equal split
  *    (the exact `partsPerConsumer` loop arithmetic, kafka.go:245-289);
  *  - a rebalance stops every partition pump, waits for them to park
  *    (kafka.go:231-235 cancel + wg.Wait), reassigns, restarts; a pump's
  *    one-record lookahead that was never delivered is re-offered to the
  *    NEW owner (kafka.go:253-256 `nextMsg` re-push) — a partition hand-
  *    off never loses or duplicates the in-flight record;
  *  - graceful consumer close commits its partitions' NEXT offsets
  *    exactly (kafka.go:389-391 `offset++` on graceful shutdown), so a
  *    successor resumes with no overlap; a NON-graceful close commits
  *    nothing — the at-least-once contract re-delivers from the last
  *    persisted offset (kafka.go:387-388 rewind), duplicates allowed,
  *    loss never;
  *  - offsets persist every `persistInterval` consumed records per
  *    partition (kafka.go:43-49 `offsetPersistInterval`), via the
  *    topic-side committed-group JSON ([[LoopbackPipe.commitGroup]], the
  *    `kafka_offsets` analogue).
  *
  * Spark-first note: inside the engine, Structured Streaming's scheduler
  * IS the partition redistributor — input splits move between executor
  * threads without any of this machinery. This layer exists for the
  * reference's pipe-consumer API surface (its streamers call
  * `NewConsumer`/`Close` concurrently and rely on live re-splitting),
  * proven by GroupConsumerSpec under real thread concurrency.
  */
final class TopicGroup(topicDir: String, group: String, conf: Configuration,
                       persistInterval: Long = 10000L) extends AutoCloseable {

  import LoopbackPipe.Record

  // ------------------------------------------------------------------
  // per-partition pump state (kafkaPartition: consumer + nextMsg buffer)
  private final class Pump(val partition: Int, startOffset: Long) {
    // next offset to read from the log
    val nextRead = new AtomicLong(startOffset)
    // one-record lookahead: read from the log but not yet accepted by an
    // owner's queue (kafka.go:62-65 nextMsg)
    @volatile var pending: Record = _
    // last offset delivered to a consumer (InitialOffset analogue = -1)
    val delivered = new AtomicLong(startOffset - 1)
    // offset persisted to the group store
    val saved = new AtomicLong(startOffset - 1)
    @volatile var owner: GroupConsumer = _
    @volatile var thread: Thread = _
    val stop = new AtomicBoolean(false)
  }

  private val ends = LoopbackPipe.endOffsets(topicDir, conf)
  require(ends.nonEmpty, s"empty topic: $topicDir")
  private val committed = LoopbackPipe.committedGroup(topicDir, group, conf)
  private val pumps: Array[Pump] =
    ends.keys.toArray.sorted.map(p => new Pump(p, committed.getOrElse(p, 0L)))

  private val lock = new Object
  private var members = Vector.empty[GroupConsumer]
  private var closed = false

  /** One registered consumer. The hand-off channel is a RENDEZVOUS queue
    * — the reference's consumers are unbuffered Go channels
    * (kafka.go:355 `make(chan *sarama.ConsumerMessage)`), and that is
    * load-bearing: with no queued backlog, the only in-flight record per
    * partition is the pump's `pending` lookahead, which a rebalance
    * re-offers to the new owner. A buffered queue would strand records
    * at a departing consumer while the pump's read position had already
    * advanced past them.
    */
  final class GroupConsumer private[TopicGroup] () extends AutoCloseable {
    private[TopicGroup] val queue = new SynchronousQueue[Record](true)

    /** Next record, or None after `timeoutMs` of silence. */
    def poll(timeoutMs: Long): Option[Record] = {
      val r = queue.poll(timeoutMs, TimeUnit.MILLISECONDS)
      if (r == null) None
      else {
        // consumption acks the offset (commitOffset per message,
        // kafka.go:370-402): persist every persistInterval records
        val pump = pumps.find(_.partition == r.partition).get
        pump.delivered.set(r.offset)
        if (r.offset - pump.saved.get >= persistInterval) persist(pump, r.offset + 1)
        Some(r)
      }
    }

    /** Graceful leave: commit NEXT offsets of owned partitions exactly,
      * then redistribute the remainder (closeConsumer graceful=true).
      */
    override def close(): Unit = leave(this, graceful = true)

    /** Crash simulation: vanish without committing (graceful=false) —
      * a successor re-reads from the last persisted offset.
      */
    def kill(): Unit = leave(this, graceful = false)
  }

  private def persist(pump: Pump, nextOffset: Long): Unit = lock.synchronized {
    pump.saved.set(nextOffset - 1)
    val all = pumps.map(p => p.partition ->
      (if (p eq pump) nextOffset else p.saved.get + 1)).toMap
    LoopbackPipe.commitGroup(topicDir, group, all.filter(_._2 > 0), conf)
  }

  /** Register a consumer and re-split partitions (NewConsumer). */
  def newConsumer(): GroupConsumer = lock.synchronized {
    require(!closed, "group closed")
    val c = new GroupConsumer
    members :+= c
    redistribute()
    c
  }

  private def leave(c: GroupConsumer, graceful: Boolean): Unit = lock.synchronized {
    if (!members.exists(_ eq c)) return
    // park every pump BEFORE touching read positions — a live pump would
    // race the rewind below
    stopAll()
    if (graceful) {
      // commit exactly the next undelivered offset (kafka.go:389-391);
      // the undelivered lookahead stays in `pending` for the successor
      pumps.filter(_.owner eq c).foreach(p => persist(p, p.delivered.get + 1))
    } else {
      // crash: successor resumes from the last PERSISTED offset — the
      // uncommitted delivered window is re-read (at-least-once)
      pumps.filter(_.owner eq c).foreach { p =>
        p.pending = null
        p.nextRead.set(p.saved.get + 1)
        p.delivered.set(p.saved.get)
      }
    }
    members = members.filterNot(_ eq c)
    redistribute()
  }

  private def stopAll(): Unit = {
    pumps.foreach { p => p.stop.set(true); val t = p.thread; if (t != null) t.interrupt() }
    pumps.foreach { p => val t = p.thread; if (t != null) t.join(); p.thread = null }
  }

  /** The reference's contiguous split (kafka.go:240-289): stop pumps,
    * wait for them to park, reassign with the exact partsPerConsumer
    * arithmetic, restart one pump thread per partition.
    */
  private def redistribute(): Unit = {
    stopAll() // cancel + wg.Wait (kafka.go:231-235)
    if (members.isEmpty || closed) { pumps.foreach(_.owner = null); return }
    val nparts = pumps.length
    val assign = TopicGroup.contiguousSplit(nparts, members.size)
    val started = new CountDownLatch(nparts)
    for (i <- 0 until nparts) {
      val pump = pumps(i)
      val owner = members(assign(i))
      pump.owner = owner
      pump.stop.set(false)
      val t = new Thread(() => { started.countDown(); run(pump, owner) },
        s"group-pump-$group-p${pump.partition}")
      t.setDaemon(true)
      pump.thread = t
      t.start()
    }
    started.await()
  }

  private def run(pump: Pump, owner: GroupConsumer): Unit = {
    try {
      // re-offer a lookahead buffered before the rebalance to the new
      // owner first (kafka.go:253-256)
      if (pump.pending != null) {
        val r = pump.pending
        if (!offer(r, owner, pump)) return
        pump.pending = null
      }
      while (!pump.stop.get) {
        val from = pump.nextRead.get
        val until = LoopbackPipe.endOffsets(topicDir, conf).getOrElse(pump.partition, from)
        if (from >= until) {
          Thread.sleep(5) // tail-poll for new segments
        } else {
          val it = LoopbackPipe.readPartition(topicDir, pump.partition, from, until, conf)
          while (it.hasNext && !pump.stop.get) {
            val r = it.next()
            pump.nextRead.set(r.offset + 1)
            pump.pending = r
            if (!offer(r, owner, pump)) return
            pump.pending = null
          }
        }
      }
    } catch {
      // both are the expected park signal: stopAll() interrupts a pump
      // blocked in poll-sleep (InterruptedException) or mid-read on the
      // segment channel (ClosedByInterruptException) — the un-delivered
      // read position is still in nextRead, so the next owner re-reads it
      case _: InterruptedException => ()
      case _: java.nio.channels.ClosedByInterruptException => ()
    }
  }

  /** Blocking offer that aborts when the pump is stopped; the record
    * stays in `pending` when aborted, for the next owner.
    */
  private def offer(r: Record, owner: GroupConsumer, pump: Pump): Boolean = {
    while (!pump.stop.get) {
      if (owner.queue.offer(r, 20, TimeUnit.MILLISECONDS)) return true
    }
    false
  }

  override def close(): Unit = {
    lock.synchronized { closed = true; members = Vector.empty }
    pumps.foreach { p => p.stop.set(true); val t = p.thread; if (t != null) t.interrupt() }
    pumps.foreach { p => val t = p.thread; if (t != null) t.join(); p.thread = null }
  }
}

/** The contiguous best-effort-equal split, as a pure function — shared
  * by the live [[TopicGroup]] rebalancer and the DSv2 source's
  * group-mode `planInputPartitions` so both surfaces provably assign
  * identically (the exact `partsPerConsumer` loop arithmetic of
  * /root/reference/pipe/kafka.go:245-289).
  */
object TopicGroup {

  /** `result(i)` = member index owning partition i (partitions in id
    * order). The reference assumes nparts >= members; the floor at 1
    * makes extra members simply receive no partitions.
    */
  def contiguousSplit(nparts: Int, nMembers: Int): Array[Int] = {
    require(nMembers > 0, "contiguousSplit needs at least one member")
    val out = new Array[Int](nparts)
    var j = 0
    var partsPerConsumer = math.max(1, nparts / nMembers)
    for (i <- 0 until nparts) {
      out(i) = math.min(j, nMembers - 1)
      // "Try our best to equally redistribute work" — kafka.go:283-289
      if ((nparts - i - 1) % partsPerConsumer == 0) {
        j += 1
        if (nMembers != j)
          partsPerConsumer = math.max(1, (nparts - i - 1) / (nMembers - j))
      }
    }
    out
  }
}
