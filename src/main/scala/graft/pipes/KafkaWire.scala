package graft.pipes

import java.io.{ByteArrayOutputStream, EOFException, InputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32

import scala.collection.mutable

/** The Apache Kafka wire protocol (v0 APIs, message format v1) — broker
  * and client over a real TCP socket, pure JDK.
  *
  * The reference produces/consumes through sarama against a live broker
  * (/root/reference/pipe/kafka.go:326-460 consumer, :482-577 producer);
  * the zero-egress sandbox has no broker to dial, but the protocol is
  * public documentation (kafka.apache.org/protocol), so — like
  * [[graft.changelog.MysqlRepl]] for MySQL replication — the wire format
  * is spoken for real: INT32 size framing, big-endian primitives,
  * request header (api_key, api_version, correlation_id, client_id),
  * and the v0 bodies of ApiVersions(18), Metadata(3), Produce(0),
  * Fetch(1), ListOffsets(2), OffsetCommit(8) and OffsetFetch(9).
  * Messages travel as CRC32-checksummed v1 messages (magic 1:
  * crc(4) magic(1) attrs(1) timestamp(8) key BYTES value BYTES — CRC
  * over everything after the crc field) inside classic MessageSets.
  *
  * [[Broker]] is a loopback broker holding in-memory partition logs: it
  * assigns offsets at append (the producer's offsets are ignored, as a
  * real broker does), serves fetches from any offset, tracks committed
  * group offsets, and ACKS every produce with the assigned base offset —
  * the ack path the loopback file pipe could not exercise. The client
  * half ([[produce]]/[[fetch]]/[[listLatest]]/[[commitOffsets]]/
  * [[fetchOffsets]]) is what a sarama-shaped producer/consumer sends.
  */
object KafkaWire {

  final case class Record(offset: Long, key: Array[Byte], value: Array[Byte], ts: Long)

  // --------------------------------------------------------- primitives

  private class Writer {
    private val out = new ByteArrayOutputStream()
    def i8(v: Int): Writer = { out.write(v & 0xff); this }
    def i16(v: Int): Writer = { out.write((v >> 8) & 0xff); out.write(v & 0xff); this }
    def i32(v: Int): Writer = { i16(v >> 16); i16(v); this }
    def i64(v: Long): Writer = { i32((v >> 32).toInt); i32(v.toInt); this }
    def raw(b: Array[Byte]): Writer = { out.write(b); this }
    def str(s: String): Writer = {
      if (s == null) i16(-1)
      else { val b = s.getBytes(StandardCharsets.UTF_8); i16(b.length); raw(b) }
    }
    def bytes(b: Array[Byte]): Writer = {
      if (b == null) i32(-1) else { i32(b.length); raw(b) }
    }
    def result: Array[Byte] = out.toByteArray
  }

  private def reader(b: Array[Byte]): ByteBuffer = ByteBuffer.wrap(b) // BE by default

  private def rstr(b: ByteBuffer): String = {
    val n = b.getShort.toInt
    if (n < 0) null
    else { val a = new Array[Byte](n); b.get(a); new String(a, StandardCharsets.UTF_8) }
  }

  private def rbytes(b: ByteBuffer): Array[Byte] = {
    val n = b.getInt
    if (n < 0) null else { val a = new Array[Byte](n); b.get(a); a }
  }

  private def readFrame(in: InputStream): Array[Byte] = {
    val sz = new Array[Byte](4)
    var off = 0
    while (off < 4) {
      val r = in.read(sz, off, 4 - off)
      if (r < 0) throw new EOFException("connection closed")
      off += r
    }
    val n = ByteBuffer.wrap(sz).getInt
    require(n >= 0 && n < (1 << 26), s"bad frame size $n")
    val a = new Array[Byte](n)
    off = 0
    while (off < n) {
      val r = in.read(a, off, n - off)
      if (r < 0) throw new EOFException("truncated frame")
      off += r
    }
    a
  }

  private def writeFrame(sock: Socket, payload: Array[Byte]): Unit = {
    val out = sock.getOutputStream
    out.write(Array[Byte](
      ((payload.length >> 24) & 0xff).toByte, ((payload.length >> 16) & 0xff).toByte,
      ((payload.length >> 8) & 0xff).toByte, (payload.length & 0xff).toByte))
    out.write(payload)
    out.flush()
  }

  // ------------------------------------------------- message format v1

  /** One v1 message (magic 1): CRC32 over magic..value. */
  private[graft] def encodeMessage(key: Array[Byte], value: Array[Byte], ts: Long): Array[Byte] = {
    val body = new Writer().i8(1).i8(0).i64(ts).bytes(key).bytes(value).result
    val crc = new CRC32; crc.update(body)
    new Writer().i32(crc.getValue.toInt).raw(body).result
  }

  /** MessageSet: [offset(8) size(4) message]* with ABSOLUTE offsets. */
  private[graft] def encodeMessageSet(base: Long, recs: Seq[(Array[Byte], Array[Byte], Long)]): Array[Byte] = {
    val w = new Writer()
    recs.zipWithIndex.foreach { case ((k, v, ts), i) =>
      val m = encodeMessage(k, v, ts)
      w.i64(base + i).i32(m.length).raw(m)
    }
    w.result
  }

  /** Parse a MessageSet, CRC-verifying every message. */
  private[graft] def decodeMessageSet(bytes: Array[Byte]): Vector[Record] = {
    val b = reader(bytes)
    val out = Vector.newBuilder[Record]
    while (b.remaining() >= 12) {
      val offset = b.getLong
      val size = b.getInt
      if (b.remaining() < size) return out.result() // partial trailing message: legal in fetch responses
      val msg = new Array[Byte](size); b.get(msg)
      val mb = reader(msg)
      val crcWire = mb.getInt
      val crc = new CRC32; crc.update(msg, 4, msg.length - 4)
      require(crc.getValue.toInt == crcWire, s"message CRC mismatch at offset $offset")
      val magic = mb.get()
      mb.get() // attributes (no compression in this pipe)
      val ts = if (magic >= 1) mb.getLong else -1L
      val key = rbytes(mb)
      val value = rbytes(mb)
      out += Record(offset, key, value, ts)
    }
    out.result()
  }

  // -------------------------------------------------------------- broker

  private val APIS: Seq[(Int, Int, Int)] = // (key, min, max)
    Seq((0, 0, 0), (1, 0, 0), (2, 0, 0), (3, 0, 0), (8, 0, 0), (9, 0, 0), (18, 0, 0))

  /** Loopback broker: in-memory partition logs, broker-assigned offsets,
    * produce ACKs, committed group offsets. Thread-per-connection,
    * multiple sequential/parallel clients supported.
    */
  final class Broker(partitionsPerTopic: Int = 8) extends AutoCloseable {
    private val ss = new ServerSocket(0, 32, InetAddress.getLoopbackAddress)
    @volatile private var open = true
    // (topic, partition) -> append-only record log
    private val logs = mutable.Map.empty[(String, Int), mutable.ArrayBuffer[(Array[Byte], Array[Byte], Long)]]
    // (group, topic, partition) -> committed offset
    private val groupOffsets = mutable.Map.empty[(String, String, Int), Long]
    private val produceAcks = new java.util.concurrent.atomic.AtomicInteger(0)

    def port: Int = ss.getLocalPort
    def url: String = s"kafka://127.0.0.1:$port"
    /** Number of produce requests acked (for spec assertions). */
    def acksSent: Int = produceAcks.get()

    private def log(topic: String, p: Int) = synchronized {
      logs.getOrElseUpdate((topic, p), mutable.ArrayBuffer.empty)
    }

    private val acceptor = new Thread(() => {
      while (open) {
        try {
          val sock = ss.accept()
          sock.setTcpNoDelay(true) // request-response over persistent conns: no Nagle stalls
          val t = new Thread(() => try serve(sock) finally sock.close(), "graft-kafka-conn")
          t.setDaemon(true)
          t.start()
        } catch { case _: java.io.IOException => () }
      }
    }, "graft-kafka-accept")
    acceptor.setDaemon(true)
    acceptor.start()

    private def serve(sock: Socket): Unit = {
      val in = sock.getInputStream
      while (true) {
        val req =
          try readFrame(in)
          catch { case _: EOFException => return }
        val b = reader(req)
        val apiKey = b.getShort.toInt
        val apiVersion = b.getShort.toInt
        val correlation = b.getInt
        rstr(b) // client_id
        require(apiVersion == 0, s"only v0 is spoken here (api $apiKey v$apiVersion)")
        val body = apiKey match {
          case 18 => apiVersionsResp()
          case 3 => metadataResp(b)
          case 0 => produceResp(b)
          case 1 => fetchResp(b)
          case 2 => listOffsetsResp(b)
          case 8 => offsetCommitResp(b)
          case 9 => offsetFetchResp(b)
          case other => throw new IllegalArgumentException(s"unsupported api key $other")
        }
        writeFrame(sock, new Writer().i32(correlation).raw(body).result)
      }
    }

    private def apiVersionsResp(): Array[Byte] = {
      val w = new Writer().i16(0).i32(APIS.length)
      APIS.foreach { case (k, lo, hi) => w.i16(k).i16(lo).i16(hi) }
      w.result
    }

    private def metadataResp(b: ByteBuffer): Array[Byte] = {
      val nTopics = b.getInt
      val topics = (0 until nTopics).map(_ => rstr(b))
      val w = new Writer()
      w.i32(1).i32(0).str("127.0.0.1").i32(port) // one broker: node 0
      w.i32(topics.length)
      topics.foreach { t =>
        w.i16(0).str(t).i32(partitionsPerTopic)
        (0 until partitionsPerTopic).foreach { p =>
          w.i16(0).i32(p).i32(0) // error, partition, leader
          w.i32(1).i32(0) // replicas [0]
          w.i32(1).i32(0) // isr [0]
        }
      }
      w.result
    }

    private def produceResp(b: ByteBuffer): Array[Byte] = {
      b.getShort // required_acks (every produce is acked below regardless)
      b.getInt // timeout
      val nTopics = b.getInt
      val w = new Writer().i32(nTopics)
      (0 until nTopics).foreach { _ =>
        val topic = rstr(b)
        val nParts = b.getInt
        w.str(topic).i32(nParts)
        (0 until nParts).foreach { _ =>
          val partition = b.getInt
          val setSize = b.getInt
          val set = new Array[Byte](setSize); b.get(set)
          val recs = decodeMessageSet(set)
          val target = log(topic, partition)
          val base = target.synchronized {
            val base = target.length.toLong
            recs.foreach(r => target += ((r.key, r.value, r.ts)))
            base
          }
          w.i32(partition).i16(0).i64(base) // the ACK: error 0 + assigned base offset
        }
      }
      produceAcks.incrementAndGet()
      w.result
    }

    private def fetchResp(b: ByteBuffer): Array[Byte] = {
      b.getInt // replica_id
      b.getInt // max_wait
      b.getInt // min_bytes
      val nTopics = b.getInt
      val w = new Writer().i32(nTopics)
      (0 until nTopics).foreach { _ =>
        val topic = rstr(b)
        val nParts = b.getInt
        w.str(topic).i32(nParts)
        (0 until nParts).foreach { _ =>
          val partition = b.getInt
          val fetchOffset = b.getLong
          val maxBytes = b.getInt
          val target = log(topic, partition)
          val (slice, hw) = target.synchronized {
            (target.view.slice(fetchOffset.toInt, target.length).toVector, target.length.toLong)
          }
          // honor maxBytes by trimming whole messages
          var budget = math.max(0, maxBytes)
          val take = slice.takeWhile { case (k, v, _) =>
            val sz = 12 + 14 + 8 + (if (k == null) 0 else k.length) + (if (v == null) 0 else v.length)
            if (budget - sz < 0) false else { budget -= sz; true }
          }
          val set = encodeMessageSet(fetchOffset, take)
          w.i32(partition).i16(0).i64(hw).i32(set.length).raw(set)
        }
      }
      w.result
    }

    private def listOffsetsResp(b: ByteBuffer): Array[Byte] = {
      b.getInt // replica_id
      val nTopics = b.getInt
      val w = new Writer().i32(nTopics)
      (0 until nTopics).foreach { _ =>
        val topic = rstr(b)
        val nParts = b.getInt
        w.str(topic).i32(nParts)
        (0 until nParts).foreach { _ =>
          val partition = b.getInt
          val ts = b.getLong
          b.getInt // max_num_offsets
          val end = log(topic, partition).synchronized(log(topic, partition).length.toLong)
          val off = if (ts == -2L) 0L else end // -2 = earliest, -1 = latest
          w.i32(partition).i16(0).i32(1).i64(off)
        }
      }
      w.result
    }

    private def offsetCommitResp(b: ByteBuffer): Array[Byte] = {
      val group = rstr(b)
      val nTopics = b.getInt
      val w = new Writer().i32(nTopics)
      (0 until nTopics).foreach { _ =>
        val topic = rstr(b)
        val nParts = b.getInt
        w.str(topic).i32(nParts)
        (0 until nParts).foreach { _ =>
          val partition = b.getInt
          val offset = b.getLong
          rstr(b) // metadata
          synchronized { groupOffsets((group, topic, partition)) = offset }
          w.i32(partition).i16(0)
        }
      }
      w.result
    }

    private def offsetFetchResp(b: ByteBuffer): Array[Byte] = {
      val group = rstr(b)
      val nTopics = b.getInt
      val w = new Writer().i32(nTopics)
      (0 until nTopics).foreach { _ =>
        val topic = rstr(b)
        val nParts = b.getInt
        w.str(topic).i32(nParts)
        (0 until nParts).foreach { _ =>
          val partition = b.getInt
          val off = synchronized(groupOffsets.getOrElse((group, topic, partition), -1L))
          w.i32(partition).i64(off).str("").i16(0)
        }
      }
      w.result
    }

    override def close(): Unit = { open = false; ss.close() }
  }

  // -------------------------------------------------------------- client

  def parseUrl(url: String): (String, Int, Option[String]) = {
    require(url.startsWith("kafka://"), s"not a kafka url: $url")
    val rest = url.stripPrefix("kafka://")
    val (hp, topic) = rest.indexOf('/') match {
      case -1 => (rest, None)
      case i => (rest.substring(0, i), Some(rest.substring(i + 1)))
    }
    val Array(h, p) = hp.split(":")
    (h, p.toInt, topic)
  }

  // One pooled connection per (thread, host:port), like a real client: a
  // consumer poll loop issues Metadata/ListOffsets/Fetch back-to-back and
  // re-dialing per request triples the wire round trips. Thread-local, so
  // no cross-thread sharing to lock; a dead socket (broker restart) is
  // dropped and the request retried once on a fresh dial. Sockets are
  // daemon-lifetime: brokers here are loopback fixtures, and each entry
  // is keyed by host:port so a new broker instance (new port) never sees
  // a stale socket.
  private val pooled = ThreadLocal.withInitial(
    new java.util.function.Supplier[scala.collection.mutable.Map[String, Socket]] {
      override def get() = scala.collection.mutable.Map.empty[String, Socket]
    })

  /** Api keys safe to replay on a fresh connection after an IO failure on a
    * pooled socket. Produce (0) is deliberately absent: the broker may have
    * applied the append before the connection died, and a blind retry would
    * duplicate records and shift broker-assigned offsets. OffsetCommit (8)
    * sets an absolute value, so replaying it is harmless.
    */
  private val idempotentApiKeys = Set(1, 2, 3, 8, 9, 18)

  private def call(url: String, apiKey: Int, body: Array[Byte]): ByteBuffer = {
    val (host, port, _) = parseUrl(url)
    val key = s"$host:$port"
    val pool = pooled.get()
    def attempt(sock: Socket): ByteBuffer = {
      val correlation = 42
      val header = new Writer().i16(apiKey).i16(0).i32(correlation).str("graft").result
      writeFrame(sock, header ++ body)
      val resp = reader(readFrame(sock.getInputStream))
      require(resp.getInt == correlation, "correlation id mismatch")
      // copy out: the buffer must not alias a reusable socket stream
      val rest = new Array[Byte](resp.remaining()); resp.get(rest)
      reader(rest)
    }
    pool.get(key) match {
      case Some(sock) =>
        try attempt(sock)
        catch {
          case e: Throwable =>
            // ANY failure poisons the pooled socket (a desynced stream
            // would corrupt the next response) — drop it; re-dial once
            // only for IO errors (the stale-connection case) on requests
            // that are safe to replay (the broker may already have applied
            // a Produce whose ack we never read)
            pool.remove(key)
            try sock.close() catch { case _: java.io.IOException => () }
            e match {
              case _: java.io.IOException if idempotentApiKeys(apiKey) =>
                val fresh = new Socket(host, port)
                fresh.setTcpNoDelay(true)
                pool(key) = fresh
                attempt(fresh)
              case other => throw other
            }
        }
      case None =>
        val fresh = new Socket(host, port)
        fresh.setTcpNoDelay(true)
        try { val r = attempt(fresh); pool(key) = fresh; r }
        catch { case e: Throwable => fresh.close(); throw e }
    }
  }

  def apiVersions(url: String): Seq[(Int, Int, Int)] = {
    val b = call(url, 18, Array.emptyByteArray)
    require(b.getShort == 0, "ApiVersions error")
    (0 until b.getInt).map(_ => (b.getShort.toInt, b.getShort.toInt, b.getShort.toInt))
  }

  /** Partition count of `topic` (and implicitly: broker liveness). */
  def partitionCount(url: String, topic: String): Int = {
    val b = call(url, 3, new Writer().i32(1).str(topic).result)
    val nBrokers = b.getInt
    (0 until nBrokers).foreach { _ => b.getInt; rstr(b); b.getInt }
    require(b.getInt >= 1, "no topics in metadata")
    require(b.getShort == 0, "topic error")
    rstr(b)
    b.getInt
  }

  /** Produce with acks: returns the broker-ASSIGNED base offset. */
  def produce(url: String, topic: String, partition: Int,
              recs: Seq[(Array[Byte], Array[Byte], Long)]): Long = {
    val set = encodeMessageSet(0L, recs) // offsets ignored by the broker
    val body = new Writer().i16(-1).i32(10000)
      .i32(1).str(topic).i32(1).i32(partition).i32(set.length).raw(set).result
    val b = call(url, 0, body)
    require(b.getInt == 1, "unexpected topic count")
    rstr(b)
    require(b.getInt == 1, "unexpected partition count")
    b.getInt // partition id
    require(b.getShort == 0, "produce error")
    b.getLong
  }

  /** Fetch from `offset` (CRC-verified); also returns the high watermark. */
  def fetch(url: String, topic: String, partition: Int, offset: Long,
            maxBytes: Int = 1 << 22): (Vector[Record], Long) = {
    val body = new Writer().i32(-1).i32(100).i32(1)
      .i32(1).str(topic).i32(1).i32(partition).i64(offset).i32(maxBytes).result
    val b = call(url, 1, body)
    require(b.getInt == 1, "unexpected topic count")
    rstr(b)
    require(b.getInt == 1, "unexpected partition count")
    b.getInt // partition id
    require(b.getShort == 0, "fetch error")
    val hw = b.getLong
    val setSize = b.getInt
    val set = new Array[Byte](setSize); b.get(set)
    (decodeMessageSet(set), hw)
  }

  /** Latest (`ts = -1`) or earliest (`ts = -2`) offset. */
  def listOffset(url: String, topic: String, partition: Int, ts: Long = -1L): Long = {
    val body = new Writer().i32(-1)
      .i32(1).str(topic).i32(1).i32(partition).i64(ts).i32(1).result
    val b = call(url, 2, body)
    require(b.getInt == 1, "unexpected topic count")
    rstr(b)
    require(b.getInt == 1, "unexpected partition count")
    b.getInt
    require(b.getShort == 0, "list offsets error")
    require(b.getInt == 1, "expected one offset")
    b.getLong
  }

  /** The reference's SaveOffset contract (pipe/kafka.go:152-156) over the
    * wire: commit/fetch per-group per-partition offsets.
    */
  def commitOffsets(url: String, group: String, topic: String, offsets: Map[Int, Long]): Unit = {
    val w = new Writer().str(group).i32(1).str(topic).i32(offsets.size)
    offsets.toSeq.sortBy(_._1).foreach { case (p, o) => w.i32(p).i64(o).str("") }
    val b = call(url, 8, w.result)
    require(b.getInt == 1, "unexpected topic count")
    rstr(b)
    (0 until b.getInt).foreach { _ => b.getInt; require(b.getShort == 0, "commit error") }
  }

  def fetchOffsets(url: String, group: String, topic: String, partitions: Seq[Int]): Map[Int, Long] = {
    val w = new Writer().str(group).i32(1).str(topic).i32(partitions.length)
    partitions.foreach(w.i32)
    val b = call(url, 9, w.result)
    require(b.getInt == 1, "unexpected topic count")
    rstr(b)
    (0 until b.getInt).map { _ =>
      val p = b.getInt
      val off = b.getLong
      rstr(b)
      require(b.getShort == 0, "offset fetch error")
      p -> off
    }.filter(_._2 >= 0).toMap
  }
}
