package graft.changelog

import java.io.{ByteArrayOutputStream, EOFException, InputStream, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets

/** MySQL client/server REPLICATION protocol — the socket half of the
  * binlog reader, closing the gap [[BinlogWire]] left: the reference
  * tails a live server via go-mysql's `BinlogSyncer.StartSyncGTID`
  * (/root/reference/changelog/mysql.go:911-968), which is exactly
  * (1) the connection-phase handshake and (2) `COM_BINLOG_DUMP_GTID`
  * carrying the client's executed-GTID set, after which the server
  * streams raw binlog events. Both halves are implemented here against
  * the public protocol documentation:
  *
  *  - packet framing: 3-byte LE payload length + 1-byte sequence id
  *  - Protocol::HandshakeV10 → HandshakeResponse41 → OK
  *  - COM_BINLOG_DUMP_GTID (0x1e): flags(2) server_id(4)
  *    name_len(4)+name pos(8) data_len(4) + GTID-set SID block
  *  - SID block: n_sids(8 LE); per sid: sid(16) n_intervals(8 LE);
  *    per interval: start(8 LE, inclusive) end(8 LE, EXCLUSIVE)
  *  - event stream: each packet is 0x00 (OK marker) + one raw v4 event;
  *    EOF packet (0xfe, len<9) ends a non-blocking dump
  *
  * [[Server]] is a loopback dump server over a fixture binary log: it
  * performs the real handshake, decodes the client's GTID set, and
  * streams only the transactions the set does NOT contain — the same
  * filter contract a production source's `StartSyncGTID` resume relies
  * on. [[dumpRaw]] is the client: dial, authenticate, dump from a set,
  * return the raw bytes as a parseable binlog (magic prepended) for the
  * unchanged [[BinlogWire.parse]].
  */
object MysqlRepl {

  // ------------------------------------------------------------- framing

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val a = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(a, off, n - off)
      if (r < 0) throw new EOFException(s"socket closed: wanted $n bytes, got $off")
      off += r
    }
    a
  }

  private val MaxChunk = 0xffffff // 16 MB - 1, the protocol's frame limit

  /** One logical MySQL packet: (last sequence id, payload). A payload of
    * `0xffffff` bytes or more arrives SPLIT: each full 16MB-1 frame says
    * "more follows", terminated by the first frame shorter than the
    * limit (an EMPTY terminator when the payload is an exact multiple) —
    * the standard multi-packet rule, which a huge row event in a binlog
    * dump genuinely hits.
    */
  def readPacket(in: InputStream): (Int, Array[Byte]) = {
    val buf = new ByteArrayOutputStream()
    var seq = 0
    var more = true
    while (more) {
      val h = readFully(in, 4)
      val len = (h(0) & 0xff) | ((h(1) & 0xff) << 8) | ((h(2) & 0xff) << 16)
      seq = h(3) & 0xff
      if (len > 0) buf.write(readFully(in, len))
      more = len == MaxChunk
    }
    (seq, buf.toByteArray)
  }

  def writePacket(out: OutputStream, seq: Int, payload: Array[Byte]): Unit = {
    var off = 0
    var s = seq
    var done = false
    while (!done) {
      val len = math.min(payload.length - off, MaxChunk)
      out.write(len & 0xff)
      out.write((len >> 8) & 0xff)
      out.write((len >> 16) & 0xff)
      out.write(s & 0xff)
      out.write(payload, off, len)
      off += len
      s += 1
      done = len < MaxChunk // an exact-multiple payload ends with an empty frame
    }
  }

  private def u32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def u64le(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  private def putIntLE(out: ByteArrayOutputStream, v: Long, n: Int): Unit = {
    var i = 0
    while (i < n) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
  }

  // ------------------------------------------------------ GTID SID block

  private[changelog] def uuidToBytes(u: String): Array[Byte] = {
    val hex = u.replace("-", "")
    require(hex.length == 32, s"not a UUID: $u")
    Array.tabulate(16)(i => Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte)
  }

  private[changelog] def bytesToUuid(b: Array[Byte], off: Int): String = {
    def hex(from: Int, to: Int) = (from until to).map(i => f"${b(off + i) & 0xff}%02x").mkString
    s"${hex(0, 4)}-${hex(4, 6)}-${hex(6, 8)}-${hex(8, 10)}-${hex(10, 16)}"
  }

  /** GTID set → wire SID block (interval ends become EXCLUSIVE). */
  def encodeGtidSet(set: GtidSet): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val sids = set.sets.toSeq.filter(_._2.nonEmpty).sortBy(_._1)
    putIntLE(out, sids.length.toLong, 8)
    sids.foreach { case (uuid, ivs) =>
      out.write(uuidToBytes(uuid))
      putIntLE(out, ivs.length.toLong, 8)
      ivs.foreach { case (s, e) => putIntLE(out, s, 8); putIntLE(out, e + 1, 8) }
    }
    out.toByteArray
  }

  /** Wire SID block → GTID set (exclusive ends back to inclusive). */
  def decodeGtidSet(b: Array[Byte], off: Int): GtidSet = {
    var p = off
    val nSids = u64le(b, p); p += 8
    var set = Map.empty[String, Vector[(Long, Long)]]
    var i = 0L
    while (i < nSids) {
      val uuid = bytesToUuid(b, p); p += 16
      val nIvs = u64le(b, p); p += 8
      var ivs = Vector.empty[(Long, Long)]
      var j = 0L
      while (j < nIvs) {
        val s = u64le(b, p); p += 8
        val e = u64le(b, p); p += 8
        ivs :+= ((s, e - 1))
        j += 1
      }
      set += uuid -> ivs
      i += 1
    }
    GtidSet(set)
  }

  // --------------------------------------------------- connection phase

  private val AuthPluginName = "mysql_native_password"
  // capability bits used (Protocol::CapabilityFlags)
  private val CLIENT_PROTOCOL_41 = 0x00000200L
  private val CLIENT_SECURE_CONNECTION = 0x00008000L
  private val CLIENT_PLUGIN_AUTH = 0x00080000L

  private def handshakeV10(threadId: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(0x0a) // protocol version
    out.write("8.0.99-graft".getBytes(StandardCharsets.UTF_8)); out.write(0)
    putIntLE(out, threadId.toLong, 4)
    out.write(Array.tabulate[Byte](8)(i => (0x30 + i).toByte)); out.write(0) // salt part 1
    val caps = CLIENT_PROTOCOL_41 | CLIENT_SECURE_CONNECTION | CLIENT_PLUGIN_AUTH
    putIntLE(out, caps & 0xffff, 2) // capability lower
    out.write(0x21) // charset utf8
    putIntLE(out, 0x0002L, 2) // status: autocommit
    putIntLE(out, (caps >> 16) & 0xffff, 2) // capability upper
    out.write(21) // auth plugin data len
    out.write(new Array[Byte](10)) // reserved
    out.write(Array.tabulate[Byte](12)(i => (0x40 + i).toByte)); out.write(0) // salt part 2
    out.write(AuthPluginName.getBytes(StandardCharsets.UTF_8)); out.write(0)
    out.toByteArray
  }

  private def handshakeResponse41(user: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    putIntLE(out, CLIENT_PROTOCOL_41 | CLIENT_SECURE_CONNECTION | CLIENT_PLUGIN_AUTH, 4)
    putIntLE(out, 1L << 24, 4) // max packet
    out.write(0x21) // charset
    out.write(new Array[Byte](23))
    out.write(user.getBytes(StandardCharsets.UTF_8)); out.write(0)
    out.write(0) // empty auth response (length-prefixed)
    out.write(AuthPluginName.getBytes(StandardCharsets.UTF_8)); out.write(0)
    out.toByteArray
  }

  private def okPacket(): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(0x00) // OK
    out.write(0x00) // affected rows (lenenc 0)
    out.write(0x00) // last insert id
    putIntLE(out, 0x0002L, 2) // status: autocommit
    putIntLE(out, 0L, 2) // warnings
    out.toByteArray
  }

  private def eofPacket(): Array[Byte] =
    Array[Byte](0xfe.toByte, 0, 0, 0x02, 0)

  // -------------------------------------------------------------- server

  /** One dump request as the server observed it (for resume assertions). */
  final case class DumpRequest(serverId: Long, gtids: GtidSet)

  /** Loopback replication server over one fixture binary log.
    *
    * Thread-per-connection; each connection performs the handshake, then
    * serves commands until COM_BINLOG_DUMP_GTID, which streams the log's
    * events EXCLUDING transactions in the client's set, then EOF (the
    * non-blocking dump shape — a bounded fixture has a last event, so
    * blocking would hang Trigger.AvailableNow forever).
    */
  final class Server(@volatile var log: Array[Byte]) extends AutoCloseable {
    require(log.length >= 4 && java.util.Arrays.equals(
      java.util.Arrays.copyOf(log, 4), BinlogWire.Magic), "not a binlog image")

    private val ss = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
    @volatile private var open = true
    private val reqs = new java.util.concurrent.CopyOnWriteArrayList[DumpRequest]()
    private val connCount = new java.util.concurrent.atomic.AtomicInteger(0)

    def port: Int = ss.getLocalPort
    def url: String = s"mysql://127.0.0.1:$port"
    def connections: Int = connCount.get()
    def dumpRequests: Seq[DumpRequest] = { import scala.jdk.CollectionConverters._; reqs.asScala.toSeq }

    private val acceptor = new Thread(() => {
      while (open) {
        try {
          val sock = ss.accept()
          connCount.incrementAndGet()
          val t = new Thread(() => try serve(sock) finally sock.close(), "graft-repl-conn")
          t.setDaemon(true)
          t.start()
        } catch { case _: java.io.IOException => () } // closed
      }
    }, "graft-repl-accept")
    acceptor.setDaemon(true)
    acceptor.start()

    private def serve(sock: Socket): Unit = {
      val in = new java.io.BufferedInputStream(sock.getInputStream)
      val out = new java.io.BufferedOutputStream(sock.getOutputStream, 1 << 16)
      writePacket(out, 0, handshakeV10(connCount.get())); out.flush()
      readPacket(in) // HandshakeResponse41 — any user/auth accepted (test server)
      writePacket(out, 2, okPacket()); out.flush()
      var done = false
      while (!done) {
        val (_, cmd) =
          try readPacket(in)
          catch { case _: EOFException => return }
        (cmd(0) & 0xff) match {
          case 0x01 => done = true // COM_QUIT
          case 0x03 | 0x0e | 0x15 => // COM_QUERY / COM_PING / COM_REGISTER_SLAVE
            writePacket(out, 1, okPacket()); out.flush()
          case 0x1e => // COM_BINLOG_DUMP_GTID
            // flags(2) server_id(4) name_len(4) name pos(8) data_len(4) sid-block
            val serverId = u32le(cmd, 3)
            val nameLen = u32le(cmd, 7).toInt
            val dataOff = 1 + 2 + 4 + 4 + nameLen + 8 + 4
            val after = decodeGtidSet(cmd, dataOff)
            reqs.add(DumpRequest(serverId, after))
            val ix = indexFor(log)
            ix.segments.foreach { seg =>
              if (seg.gtid == null || !after.contains(seg.gtid._1, seg.gtid._2))
                out.write(seg.packets)
            }
            writePacket(out, 1, eofPacket()); out.flush()
            done = true // non-blocking dump: one dump per connection
          case other =>
            writePacket(out, 1, Array[Byte](0xff.toByte) ++
              Array[Byte](0x30, 0x04) ++ s"#HY000unsupported command $other".getBytes(StandardCharsets.UTF_8))
            out.flush()
        }
      }
    }

    /** One dump unit, pre-framed: either a bookkeeping run (`gtid == null`
      * — FDE / ROTATE / PREVIOUS_GTIDS, always sent because the client
      * parser needs the FDE's post-header table and checksum algorithm)
      * or one whole transaction. `packets` is the ready-to-send wire
      * image: each event already wrapped as a MySQL packet
      * (len(3) seq(1) 0x00-OK-marker + raw v4 event), so serving a dump
      * is one GTID-set membership check and one bulk `write` per
      * transaction instead of a parse + copy + per-event socket write.
      */
    private final case class Segment(gtid: (String, Long), packets: Array[Byte])
    private final class LogIndex(val snap: Array[Byte], val segments: Vector[Segment])

    // The log may grow between dumps (a live master does): the index is
    // keyed by snapshot reference and rebuilt only when `log` is swapped.
    @volatile private var cached: LogIndex = buildIndex(log)

    private def indexFor(snap: Array[Byte]): LogIndex = {
      val c = cached
      if (c.snap eq snap) c
      else { val ix = buildIndex(snap); cached = ix; ix }
    }

    /** Walk the raw log ONCE, tracking GTID transaction membership, and
      * pre-frame every event into its dump packet grouped by transaction.
      */
    private def buildIndex(snap: Array[Byte]): LogIndex = {
      val segs = Vector.newBuilder[Segment]
      var cur = new ByteArrayOutputStream()
      var curGtid: (String, Long) = null
      def flush(): Unit = {
        if (cur.size() > 0) segs += Segment(curGtid, cur.toByteArray)
        cur = new ByteArrayOutputStream()
      }
      def frame(off: Int, size: Int): Unit = {
        // packet header + OK marker + raw event
        val plen = size + 1
        if (plen < MaxChunk) {
          cur.write(plen & 0xff); cur.write((plen >> 8) & 0xff); cur.write((plen >> 16) & 0xff)
          cur.write(1) // seq (client ignores; real servers increment per packet)
          cur.write(0x00)
          cur.write(snap, off, size)
        } else {
          // a >= 16MB-1 event (giant row image) needs multi-packet split
          val payload = new Array[Byte](plen)
          payload(0) = 0x00
          System.arraycopy(snap, off, payload, 1, size)
          writePacket(cur, 1, payload)
        }
      }
      var off = 4
      while (off + 19 <= snap.length) {
        val tpe = snap(off + 4) & 0xff
        val size = u32le(snap, off + 9).toInt
        require(size >= 19 && off + size <= snap.length,
          s"corrupt binlog image: event at $off declares size $size (log ${snap.length})")
        tpe match {
          case 33 => // GTID: body = flags(1) sid(16) gno(8 LE) — txn start
            flush()
            curGtid = (bytesToUuid(snap, off + 20), u64le(snap, off + 36))
            frame(off, size)
          case 15 | 4 | 35 =>
            // FDE / ROTATE / PREVIOUS_GTIDS: always sent, even mid-txn —
            // its own null-gtid segment; the surrounding txn (if any)
            // continues afterwards as a second segment with the same gtid
            // (membership is checked per segment, so the split is sound).
            val saved = curGtid
            flush(); curGtid = null
            frame(off, size)
            flush(); curGtid = saved
          case _ => // body event of the current txn (or pre-GTID noise)
            frame(off, size)
        }
        off += size
      }
      flush()
      new LogIndex(snap, segs.result())
    }

    override def close(): Unit = {
      open = false
      ss.close()
    }
  }

  // -------------------------------------------------------------- client

  /** `mysql://host:port` → (host, port). */
  def parseUrl(url: String): (String, Int) = {
    require(url.startsWith("mysql://"), s"not a mysql url: $url")
    val hp = url.stripPrefix("mysql://").split(":")
    (hp(0), hp(1).toInt)
  }

  /** Dial, handshake, dump everything after `after`; returns a complete
    * binlog image (magic prepended) for the unchanged [[BinlogWire.parse]].
    * This is the `StartSyncGTID` contract: the RESUME point rides to the
    * server inside COM_BINLOG_DUMP_GTID, and the server does the
    * filtering.
    */
  def dumpRaw(url: String, after: GtidSet, serverId: Long = 1001L,
              soTimeoutMs: Int = 60000): Array[Byte] = {
    val (host, port) = parseUrl(url)
    val sock = new Socket(host, port)
    // a hung server must not block the partition reader (and with it the
    // whole streaming batch) forever — surface a SocketTimeoutException
    sock.setSoTimeout(soTimeoutMs)
    try {
      val in = new java.io.BufferedInputStream(sock.getInputStream, 1 << 16)
      val out = sock.getOutputStream
      val (_, greeting) = readPacket(in)
      require((greeting(0) & 0xff) == 0x0a, s"unsupported protocol version ${greeting(0)}")
      writePacket(out, 1, handshakeResponse41("graft")); out.flush()
      val (_, auth) = readPacket(in)
      require((auth(0) & 0xff) == 0x00, "authentication failed")
      val cmd = new ByteArrayOutputStream()
      cmd.write(0x1e)
      putIntLE(cmd, 0x0001L, 2) // BINLOG_DUMP_NON_BLOCK
      putIntLE(cmd, serverId, 4)
      putIntLE(cmd, 0L, 4) // empty binlog filename
      putIntLE(cmd, 4L, 8) // position: past magic
      val sid = encodeGtidSet(after)
      putIntLE(cmd, sid.length.toLong, 4)
      cmd.write(sid)
      writePacket(out, 0, cmd.toByteArray); out.flush()
      val buf = new ByteArrayOutputStream()
      buf.write(BinlogWire.Magic)
      var done = false
      while (!done) {
        val (_, p) = readPacket(in)
        (p(0) & 0xff) match {
          case 0x00 => buf.write(p, 1, p.length - 1)
          case 0xfe if p.length < 9 => done = true
          case 0xff =>
            throw new java.io.IOException(
              "server error: " + new String(p, 9, p.length - 9, StandardCharsets.UTF_8))
          case other => throw new java.io.IOException(s"unexpected packet marker $other")
        }
      }
      buf.toByteArray
    } finally sock.close()
  }
}
