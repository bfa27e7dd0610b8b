package graft.changelog

import java.io.{ByteArrayOutputStream, DataOutputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32

import scala.collection.mutable.ArrayBuffer

/** MySQL binlog v4 BINARY wire format — writer and parser, pure JDK.
  *
  * The reference tails this format off the replication socket via
  * go-mysql's `BinlogSyncer` (/root/reference/changelog/mysql.go:911-968)
  * and demuxes WRITE/UPDATE/DELETE_ROWS, QUERY, GTID, TABLE_MAP and XID
  * events (:754-787). The zero-egress sandbox has no MySQL server to dial,
  * but the *format* is public protocol documentation — so the fixture twin
  * speaks it for real: [[write]] produces a spec-conformant `.binlog`
  * stream (magic, FORMAT_DESCRIPTION, CRC32-checksummed events,
  * TABLE_MAP with `binlog_row_metadata=FULL` optional metadata carrying
  * column names) and [[parse]] decodes one, verifying every CRC. What
  * remains un-exercised is only the socket dial + dump-command handshake.
  *
  * Layout facts used here (all public MySQL protocol docs):
  *  - file magic `0xfe 'b' 'i' 'n'`
  *  - v4 common header: ts(4) type(1) server_id(4) event_size(4)
  *    log_pos(4) flags(2) = 19 bytes
  *  - FORMAT_DESCRIPTION (15): binlog_version(2)=4, server_version(50),
  *    create_ts(4), header_len(1)=19, post-header-length table, then
  *    checksum_alg(1) + CRC32(4)
  *  - GTID_LOG_EVENT (33): flags(1) sid(16) gno(8 LE) lt_type(1)
  *    last_committed(8) sequence_number(8)  [post-header len 42]
  *  - QUERY (2): thread_id(4) exec_time(4) db_len(1) error_code(2)
  *    status_vars_len(2); status vars; db NUL; query
  *  - TABLE_MAP (19): table_id(6) flags(2); db/tbl as len+str+NUL;
  *    col_count(lenenc); type bytes; metadata block (lenenc len);
  *    null-bitmap; optional-metadata TLVs (1=SIGNEDNESS, 4=COLUMN_NAME)
  *  - ROWS v2 (30/31/32): table_id(6) flags(2) extra_len(2, incl. self);
  *    col_count(lenenc); present-bitmap(s); per row: null-bitmap + values
  *  - XID (16): xid(8)
  *  - NEWDECIMAL storage: 9 decimal digits per 4 big-endian bytes, partial
  *    groups in 1-4 bytes, first byte XOR 0x80, negative = all bits
  *    inverted (golden vector in the spec: decimal(14,4) 1234567890.1234
  *    = 81 0D FB 38 D2 04 D2)
  */
object BinlogWire {

  val Magic: Array[Byte] = Array(0xfe.toByte, 'b'.toByte, 'i'.toByte, 'n'.toByte)

  // event type codes
  private val QUERY_EVENT = 2
  private val ROTATE_EVENT = 4
  private val FORMAT_DESCRIPTION_EVENT = 15
  private val XID_EVENT = 16
  private val TABLE_MAP_EVENT = 19
  private val WRITE_ROWS_V2 = 30
  private val UPDATE_ROWS_V2 = 31
  private val DELETE_ROWS_V2 = 32
  private val GTID_EVENT = 33
  private val PREVIOUS_GTIDS_EVENT = 35

  /** Column type codes (MYSQL_TYPE_*). */
  object T {
    val TINY = 1; val SHORT = 2; val LONG = 3; val FLOAT = 4; val DOUBLE = 5
    val LONGLONG = 8; val VARCHAR = 15; val NEWDECIMAL = 246; val BLOB = 252
  }

  /** `meta`: VARCHAR → max byte length; BLOB → number of length bytes
    * (1/2/3/4); NEWDECIMAL → (precision << 8) | scale; others 0.
    */
  final case class Col(name: String, tpe: Int, meta: Int = 0, unsigned: Boolean = false)
  final case class TableDef(db: String, tbl: String, cols: Seq[Col])

  /** One row image change. insert: after only; delete: before only;
    * update: both. Values align with `TableDef.cols`; null allowed.
    * Supported value classes: java.lang.{Byte,Short,Integer,Long,Float,
    * Double}, String, Array[Byte], java.math.BigDecimal.
    */
  final case class Row(op: String, before: Option[IndexedSeq[Any]], after: Option[IndexedSeq[Any]])

  sealed trait Entry { def uuid: String; def gno: Long; def tsMs: Long }
  /** A transaction: GTID → TABLE_MAP → one ROWS event per row → XID. */
  final case class Txn(uuid: String, gno: Long, tsMs: Long, table: TableDef,
                       rows: Seq[Row]) extends Entry
  /** A DDL statement: GTID → QUERY. */
  final case class Ddl(uuid: String, gno: Long, tsMs: Long, db: String,
                       query: String) extends Entry

  /** Parsed row event with its table context and log position. */
  final case class ParsedRow(logPos: Long, uuid: String, gno: Long, tsSec: Long,
                             table: TableDef, row: Row)
  final case class ParsedDdl(logPos: Long, uuid: String, gno: Long, tsSec: Long,
                             db: String, query: String)
  final case class ParsedLog(rows: Vector[ParsedRow], ddls: Vector[ParsedDdl])

  // ------------------------------------------------------------------ util

  private def lenencSize(v: Long): Int =
    if (v < 251) 1 else if (v < 65536) 3 else if (v < 16777216) 4 else 9

  private def putLenenc(b: ByteArrayOutputStream, v: Long): Unit = {
    if (v < 251) b.write(v.toInt)
    else if (v < 65536) { b.write(0xfc); b.write((v & 0xff).toInt); b.write(((v >> 8) & 0xff).toInt) }
    else if (v < 16777216) { b.write(0xfd); b.write((v & 0xff).toInt); b.write(((v >> 8) & 0xff).toInt); b.write(((v >> 16) & 0xff).toInt) }
    else { b.write(0xfe); var i = 0; while (i < 8) { b.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
  }

  private def putIntLE(b: ByteArrayOutputStream, v: Long, n: Int): Unit = {
    var i = 0
    while (i < n) { b.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
  }

  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def remaining: Int = end - pos
    def u8(): Int = { val v = buf(pos) & 0xff; pos += 1; v }
    def skip(n: Int): Unit = pos += n
    def uintLE(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += n; v
    }
    def bytes(n: Int): Array[Byte] = {
      val a = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; a
    }
    def str(n: Int): String = new String(bytes(n), StandardCharsets.UTF_8)
    def lenenc(): Long = {
      val f = u8()
      if (f < 251) f
      else if (f == 0xfc) uintLE(2)
      else if (f == 0xfd) uintLE(3)
      else uintLE(8)
    }
  }

  // ----------------------------------------------------------------- write

  private val ServerVersion = "8.0.30-graft"
  private val ServerId = 1L

  private final class LogWriter(out: OutputStream) {
    private var logPos: Long = 4L // after magic
    private val crc = new CRC32

    /** Emit one event: header + body + CRC32 over both. */
    def event(tsSec: Long, tpe: Int, body: Array[Byte]): Unit = {
      val size = 19 + body.length + 4
      logPos += size
      val h = new ByteArrayOutputStream(19)
      putIntLE(h, tsSec, 4)
      h.write(tpe)
      putIntLE(h, ServerId, 4)
      putIntLE(h, size.toLong, 4)
      putIntLE(h, logPos, 4)
      putIntLE(h, 0L, 2) // flags
      val head = h.toByteArray
      crc.reset(); crc.update(head); crc.update(body)
      out.write(head); out.write(body)
      val c = new ByteArrayOutputStream(4)
      putIntLE(c, crc.getValue, 4)
      out.write(c.toByteArray)
    }
  }

  private def fdeBody(): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    putIntLE(b, 4L, 2) // binlog version
    val sv = ServerVersion.getBytes(StandardCharsets.UTF_8)
    b.write(sv, 0, math.min(sv.length, 50))
    var i = sv.length
    while (i < 50) { b.write(0); i += 1 }
    putIntLE(b, 0L, 4) // create ts
    b.write(19) // common header length
    // post-header length per event type 1..38
    val ph = new Array[Int](38)
    ph(QUERY_EVENT - 1) = 13
    ph(ROTATE_EVENT - 1) = 8
    ph(FORMAT_DESCRIPTION_EVENT - 1) = 84
    ph(XID_EVENT - 1) = 0
    ph(TABLE_MAP_EVENT - 1) = 8
    ph(WRITE_ROWS_V2 - 1) = 10
    ph(UPDATE_ROWS_V2 - 1) = 10
    ph(DELETE_ROWS_V2 - 1) = 10
    ph(GTID_EVENT - 1) = 42
    ph(PREVIOUS_GTIDS_EVENT - 1) = 0
    ph.foreach(b.write)
    b.write(1) // checksum algorithm: CRC32
    b.toByteArray
  }

  private def uuidBytes(uuid: String): Array[Byte] = {
    val hex = uuid.replace("-", "")
    require(hex.length == 32, s"bad GTID uuid: $uuid")
    val a = new Array[Byte](16)
    var i = 0
    while (i < 16) { a(i) = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte; i += 1 }
    a
  }

  private def gtidBody(uuid: String, gno: Long, seq: Long): Array[Byte] = {
    val b = new ByteArrayOutputStream(42)
    b.write(1) // flags: may have SBR statements
    b.write(uuidBytes(uuid), 0, 16)
    putIntLE(b, gno, 8)
    b.write(2) // logical timestamp typecode
    putIntLE(b, seq - 1, 8) // last_committed
    putIntLE(b, seq, 8)     // sequence_number
    b.toByteArray
  }

  private def metaBytes(c: Col): Array[Byte] = c.tpe match {
    case T.VARCHAR =>
      val b = new ByteArrayOutputStream(2); putIntLE(b, c.meta.toLong, 2); b.toByteArray
    case T.BLOB => Array((if (c.meta == 0) 2 else c.meta).toByte)
    case T.NEWDECIMAL => Array(((c.meta >> 8) & 0xff).toByte, (c.meta & 0xff).toByte)
    case T.FLOAT => Array(4.toByte)
    case T.DOUBLE => Array(8.toByte)
    case _ => Array.emptyByteArray
  }

  private def tableMapBody(tableId: Long, t: TableDef): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    putIntLE(b, tableId, 6)
    putIntLE(b, 1L, 2) // flags
    val db = t.db.getBytes(StandardCharsets.UTF_8)
    b.write(db.length); b.write(db, 0, db.length); b.write(0)
    val tb = t.tbl.getBytes(StandardCharsets.UTF_8)
    b.write(tb.length); b.write(tb, 0, tb.length); b.write(0)
    putLenenc(b, t.cols.length.toLong)
    t.cols.foreach(c => b.write(c.tpe))
    val meta = new ByteArrayOutputStream()
    t.cols.foreach(c => { val m = metaBytes(c); meta.write(m, 0, m.length) })
    putLenenc(b, meta.size.toLong)
    meta.writeTo(b)
    // null-bitmap: everything nullable (per-row bitmaps carry actual nulls)
    val nb = (t.cols.length + 7) / 8
    var i = 0
    while (i < nb) { b.write(0xff); i += 1 }
    // optional metadata (binlog_row_metadata=FULL subset):
    // SIGNEDNESS(1): one bit per NUMERIC column, MSB-first
    val numeric = t.cols.filter(c => c.tpe != T.VARCHAR && c.tpe != T.BLOB)
    if (numeric.nonEmpty) {
      val bits = new Array[Byte]((numeric.length + 7) / 8)
      numeric.zipWithIndex.foreach { case (c, i2) =>
        if (c.unsigned) bits(i2 / 8) = (bits(i2 / 8) | (0x80 >> (i2 % 8))).toByte
      }
      b.write(1); putLenenc(b, bits.length.toLong); b.write(bits, 0, bits.length)
    }
    // COLUMN_NAME(4): lenenc-prefixed name per column
    val names = new ByteArrayOutputStream()
    t.cols.foreach { c =>
      val n = c.name.getBytes(StandardCharsets.UTF_8)
      putLenenc(names, n.length.toLong); names.write(n, 0, n.length)
    }
    b.write(4); putLenenc(b, names.size.toLong)
    names.writeTo(b)
    b.toByteArray
  }

  // ------------------------------------------------------- value encoding

  /** MySQL decimal (NEWDECIMAL) binary image. */
  private[graft] def encodeDecimal(v: java.math.BigDecimal, precision: Int, scale: Int): Array[Byte] = {
    val dig = Array(0, 1, 1, 2, 2, 3, 3, 4, 4, 4) // bytes for 0..9 leftover digits
    val neg = v.signum() < 0
    val abs = v.abs().setScale(scale, java.math.RoundingMode.HALF_UP)
    val unscaled = abs.movePointRight(scale).toBigIntegerExact.toString
    val intDigits = precision - scale
    val all = ("0" * (precision - unscaled.length)) + unscaled
    val intPart = all.substring(0, intDigits)
    val fracPart = all.substring(intDigits)
    val out = ArrayBuffer.empty[Byte]
    def writeGroups(s: String, leading: Boolean): Unit = {
      // leading partial group first for the integer part, trailing partial
      // group last for the fraction part
      val partial = s.length % 9
      val (head, rest) = if (leading) s.splitAt(partial) else (s, "")
      if (leading && partial > 0) {
        val v0 = head.toLong
        val nb = dig(partial)
        var i = nb - 1
        while (i >= 0) { out += ((v0 >> (8 * i)) & 0xff).toByte; i -= 1 }
      }
      val full = if (leading) rest else s.substring(0, s.length - s.length % 9)
      full.grouped(9).foreach { g =>
        val v0 = g.toLong
        var i = 3
        while (i >= 0) { out += ((v0 >> (8 * i)) & 0xff).toByte; i -= 1 }
      }
      if (!leading && s.length % 9 > 0) {
        val tail = s.substring(s.length - s.length % 9)
        val v0 = tail.toLong
        val nb = dig(tail.length)
        var i = nb - 1
        while (i >= 0) { out += ((v0 >> (8 * i)) & 0xff).toByte; i -= 1 }
      }
    }
    writeGroups(intPart, leading = true)
    writeGroups(fracPart, leading = false)
    val a = out.toArray
    if (neg) { var i = 0; while (i < a.length) { a(i) = (~a(i)).toByte; i += 1 } }
    a(0) = (a(0) ^ 0x80).toByte
    a
  }

  private[graft] def decimalBinSize(precision: Int, scale: Int): Int = {
    val dig = Array(0, 1, 1, 2, 2, 3, 3, 4, 4, 4)
    val intDigits = precision - scale
    (intDigits / 9) * 4 + dig(intDigits % 9) + (scale / 9) * 4 + dig(scale % 9)
  }

  private[graft] def decodeDecimal(a: Array[Byte], precision: Int, scale: Int): java.math.BigDecimal = {
    val b = a.clone()
    val neg = (b(0) & 0x80) == 0
    b(0) = (b(0) ^ 0x80).toByte
    if (neg) { var i = 0; while (i < b.length) { b(i) = (~b(i)).toByte; i += 1 } }
    val dig = Array(0, 1, 1, 2, 2, 3, 3, 4, 4, 4)
    val sb = new StringBuilder
    var pos = 0
    def readGroup(nb: Int, width: Int): Unit = {
      var v = 0L; var i = 0
      while (i < nb) { v = (v << 8) | (b(pos + i) & 0xffL); i += 1 }
      pos += nb
      val s = v.toString
      sb.append(("0" * (width - s.length)) + s)
    }
    val intDigits = precision - scale
    if (intDigits % 9 > 0) readGroup(dig(intDigits % 9), intDigits % 9)
    var g = 0
    while (g < intDigits / 9) { readGroup(4, 9); g += 1 }
    val intStr = if (sb.isEmpty) "0" else sb.toString()
    sb.clear()
    g = 0
    while (g < scale / 9) { readGroup(4, 9); g += 1 }
    if (scale % 9 > 0) readGroup(dig(scale % 9), scale % 9)
    val s = intStr + (if (scale > 0) "." + sb.toString() else "")
    val d = new java.math.BigDecimal(s)
    if (neg) d.negate() else d
  }

  private def encodeValue(b: ByteArrayOutputStream, c: Col, v: Any): Unit = (c.tpe, v) match {
    case (T.TINY, n: Number) => b.write(n.intValue() & 0xff)
    case (T.SHORT, n: Number) => putIntLE(b, n.longValue(), 2)
    case (T.LONG, n: Number) => putIntLE(b, n.longValue(), 4)
    case (T.LONGLONG, n: Number) => putIntLE(b, n.longValue(), 8)
    case (T.FLOAT, n: Number) => putIntLE(b, java.lang.Float.floatToIntBits(n.floatValue()) & 0xffffffffL, 4)
    case (T.DOUBLE, n: Number) => putIntLE(b, java.lang.Double.doubleToLongBits(n.doubleValue()), 8)
    case (T.VARCHAR, s: String) =>
      val d = s.getBytes(StandardCharsets.UTF_8)
      require(d.length <= c.meta, s"varchar overflow: ${d.length} > ${c.meta} in ${c.name}")
      if (c.meta < 256) b.write(d.length) else putIntLE(b, d.length.toLong, 2)
      b.write(d, 0, d.length)
    case (T.BLOB, d: Array[Byte]) =>
      val lb = if (c.meta == 0) 2 else c.meta
      putIntLE(b, d.length.toLong, lb)
      b.write(d, 0, d.length)
    case (T.NEWDECIMAL, d: java.math.BigDecimal) =>
      val enc = encodeDecimal(d, (c.meta >> 8) & 0xff, c.meta & 0xff)
      b.write(enc, 0, enc.length)
    case _ => throw new IllegalArgumentException(
      s"unsupported value ${v.getClass.getName} for column ${c.name} type ${c.tpe}")
  }

  private def decodeValue(r: Reader, c: Col): Any = c.tpe match {
    case T.TINY => val v = r.u8(); java.lang.Long.valueOf(if (c.unsigned) v.toLong else v.toByte.toLong)
    case T.SHORT => val v = r.uintLE(2); java.lang.Long.valueOf(if (c.unsigned) v else v.toShort.toLong)
    case T.LONG => val v = r.uintLE(4); java.lang.Long.valueOf(if (c.unsigned) v else v.toInt.toLong)
    case T.LONGLONG => java.lang.Long.valueOf(r.uintLE(8))
    case T.FLOAT => java.lang.Float.valueOf(java.lang.Float.intBitsToFloat(r.uintLE(4).toInt))
    case T.DOUBLE => java.lang.Double.valueOf(java.lang.Double.longBitsToDouble(r.uintLE(8)))
    case T.VARCHAR =>
      val n = if (c.meta < 256) r.u8() else r.uintLE(2).toInt
      r.str(n)
    case T.BLOB =>
      val lb = if (c.meta == 0) 2 else c.meta
      val n = r.uintLE(lb).toInt
      r.bytes(n)
    case T.NEWDECIMAL =>
      val p = (c.meta >> 8) & 0xff; val s = c.meta & 0xff
      decodeDecimal(r.bytes(decimalBinSize(p, s)), p, s)
    case t => throw new IllegalArgumentException(s"unsupported column type $t (${c.name})")
  }

  private def rowImage(b: ByteArrayOutputStream, t: TableDef, vals: IndexedSeq[Any]): Unit = {
    require(vals.length == t.cols.length, s"row arity ${vals.length} != ${t.cols.length}")
    val nb = new Array[Byte]((t.cols.length + 7) / 8)
    vals.zipWithIndex.foreach { case (v, i) =>
      if (v == null) nb(i / 8) = (nb(i / 8) | (1 << (i % 8))).toByte
    }
    b.write(nb, 0, nb.length)
    var i = 0
    while (i < vals.length) {
      if (vals(i) != null) encodeValue(b, t.cols(i), vals(i))
      i += 1
    }
  }

  private def rowsBody(tableId: Long, t: TableDef, row: Row): (Int, Array[Byte]) = {
    val tpe = row.op match {
      case "insert" => WRITE_ROWS_V2
      case "update" => UPDATE_ROWS_V2
      case "delete" => DELETE_ROWS_V2
      case o => throw new IllegalArgumentException(s"bad op $o")
    }
    val b = new ByteArrayOutputStream()
    putIntLE(b, tableId, 6)
    putIntLE(b, 0L, 2)  // flags
    putIntLE(b, 2L, 2)  // extra-data length (includes itself) = none
    putLenenc(b, t.cols.length.toLong)
    val present = new Array[Byte]((t.cols.length + 7) / 8)
    java.util.Arrays.fill(present, 0xff.toByte)
    b.write(present, 0, present.length)                      // cols present
    if (tpe == UPDATE_ROWS_V2) b.write(present, 0, present.length) // after-image bitmap
    tpe match {
      case WRITE_ROWS_V2 => rowImage(b, t, row.after.get)
      case DELETE_ROWS_V2 => rowImage(b, t, row.before.get)
      case UPDATE_ROWS_V2 =>
        rowImage(b, t, row.before.get); rowImage(b, t, row.after.get)
    }
    (tpe, b.toByteArray)
  }

  private def queryBody(db: String, query: String): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    putIntLE(b, 1L, 4) // thread id
    putIntLE(b, 0L, 4) // exec time
    val d = db.getBytes(StandardCharsets.UTF_8)
    b.write(d.length)
    putIntLE(b, 0L, 2) // error code
    putIntLE(b, 0L, 2) // status vars length (none)
    b.write(d, 0, d.length); b.write(0)
    val q = query.getBytes(StandardCharsets.UTF_8)
    b.write(q, 0, q.length)
    b.toByteArray
  }

  /** Write a complete binlog: magic, FDE, then per entry
    * GTID → (TABLE_MAP → ROWS… → XID | QUERY).
    */
  def write(out: OutputStream, entries: Iterator[Entry]): Unit = {
    out.write(Magic)
    val w = new LogWriter(out)
    w.event(0L, FORMAT_DESCRIPTION_EVENT, fdeBody())
    var tableId = 100L
    var seq = 1L
    entries.foreach { e =>
      val ts = e.tsMs / 1000
      w.event(ts, GTID_EVENT, gtidBody(e.uuid, e.gno, seq))
      seq += 1
      e match {
        case t: Txn =>
          w.event(ts, TABLE_MAP_EVENT, tableMapBody(tableId, t.table))
          t.rows.foreach { r =>
            val (tpe, body) = rowsBody(tableId, t.table, r)
            w.event(ts, tpe, body)
          }
          w.event(ts, XID_EVENT, { val b = new ByteArrayOutputStream(8); putIntLE(b, seq, 8); b.toByteArray })
          tableId += 1
        case d: Ddl =>
          w.event(ts, QUERY_EVENT, queryBody(d.db, d.query))
      }
    }
  }

  // ----------------------------------------------------------------- parse

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val a = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(a, off, n - off)
      if (r < 0) throw new EOFException(s"binlog truncated: wanted $n bytes, got $off")
      off += r
    }
    a
  }

  /** Parse a binary log produced by [[write]] or a real server with
    * `binlog_checksum=CRC32, binlog_row_metadata=FULL, binlog_row_image=FULL`
    * restricted to the supported column types. CRC32 of every event is
    * verified; a mismatch fails loudly (a silently-corrupt changelog would
    * corrupt every downstream sink).
    */
  def parse(in: InputStream): ParsedLog = {
    val magic = readFully(in, 4)
    require(java.util.Arrays.equals(magic, Magic), "not a binlog: bad magic")
    val rows = Vector.newBuilder[ParsedRow]
    val ddls = Vector.newBuilder[ParsedDdl]
    val crc = new CRC32
    var postHeaderLen: Array[Int] = null
    var checksummed = false
    var curUuid: String = null
    var curGno: Long = -1L
    val tables = scala.collection.mutable.Map.empty[Long, TableDef]

    def parseTableMap(r: Reader): (Long, TableDef) = {
      val tableId = r.uintLE(6)
      r.skip(2) // flags
      val dbLen = r.u8(); val db = r.str(dbLen); r.skip(1)
      val tbLen = r.u8(); val tbl = r.str(tbLen); r.skip(1)
      val n = r.lenenc().toInt
      val types = Array.fill(n)(r.u8())
      val metaLen = r.lenenc().toInt
      val metaEnd = r.pos + metaLen
      val metas = types.map {
        case T.VARCHAR => r.uintLE(2).toInt
        case T.BLOB => r.u8()
        case T.NEWDECIMAL => val p = r.u8(); val s = r.u8(); (p << 8) | s
        case T.FLOAT | T.DOUBLE => r.u8(); 0
        case _ => 0
      }
      require(r.pos == metaEnd, s"table map metadata length mismatch: ${r.pos} != $metaEnd")
      r.skip((n + 7) / 8) // null bitmap (per-row bitmaps are authoritative)
      // optional metadata TLVs
      var signedness: Array[Byte] = null
      var names: Array[String] = null
      while (r.remaining > 0) {
        val t = r.u8()
        val len = r.lenenc().toInt
        val endPos = r.pos + len
        t match {
          case 1 => signedness = r.bytes(len)
          case 4 =>
            val nb = ArrayBuffer.empty[String]
            while (r.pos < endPos) { val l = r.lenenc().toInt; nb += r.str(l) }
            names = nb.toArray
          case _ => r.skip(len)
        }
        r.pos = endPos
      }
      var numIdx = 0
      val cols = (0 until n).map { i =>
        val tpe = types(i)
        val numeric = tpe != T.VARCHAR && tpe != T.BLOB
        val unsigned = numeric && signedness != null &&
          ((signedness(numIdx / 8) & (0x80 >> (numIdx % 8))) != 0)
        if (numeric) numIdx += 1
        Col(if (names != null && i < names.length) names(i) else s"c$i", tpe, metas(i), unsigned)
      }
      (tableId, TableDef(db, tbl, cols))
    }

    def parseImage(r: Reader, t: TableDef): IndexedSeq[Any] = {
      val nb = r.bytes((t.cols.length + 7) / 8)
      t.cols.zipWithIndex.map { case (c, i) =>
        if ((nb(i / 8) & (1 << (i % 8))) != 0) null else decodeValue(r, c)
      }.toIndexedSeq
    }

    var done = false
    while (!done) {
      val first = in.read()
      if (first < 0) done = true
      else {
        val head = new Array[Byte](19)
        head(0) = first.toByte
        System.arraycopy(readFully(in, 18), 0, head, 1, 18)
        val hr = new Reader(head, 0, 19)
        val tsSec = hr.uintLE(4)
        val tpe = hr.u8()
        hr.skip(4) // server id
        val size = hr.uintLE(4).toInt
        val logPos = hr.uintLE(4)
        hr.skip(2)
        val body = readFully(in, size - 19)
        val bodyEnd =
          if (tpe == FORMAT_DESCRIPTION_EVENT || checksummed) {
            crc.reset(); crc.update(head); crc.update(body, 0, body.length - 4)
            val r = new Reader(body, body.length - 4, body.length)
            val expect = r.uintLE(4)
            require(crc.getValue == expect,
              f"binlog CRC32 mismatch at pos $logPos%d event type $tpe%d")
            body.length - 4
          } else body.length
        val r = new Reader(body, 0, bodyEnd)
        tpe match {
          case FORMAT_DESCRIPTION_EVENT =>
            val ver = r.uintLE(2)
            require(ver == 4, s"unsupported binlog version $ver")
            r.skip(50); r.skip(4)
            val hl = r.u8()
            require(hl == 19, s"unsupported common header length $hl")
            val nTypes = bodyEnd - r.pos - 1 // minus checksum-alg byte
            postHeaderLen = Array.fill(nTypes)(r.u8())
            // the FDE's own CRC was already verified above, which only
            // works for CRC32 logs (the MySQL default since 5.6.6) — an
            // un-checksummed log has no trailing 4 bytes to strip
            val alg = r.u8()
            require(alg == 1, s"only CRC32-checksummed binlogs are supported (alg=$alg)")
            checksummed = true
          case GTID_EVENT =>
            r.skip(1)
            val sid = r.bytes(16)
            def hex(a: Array[Byte], from: Int, to: Int): String =
              (from until to).map(i => f"${a(i) & 0xff}%02x").mkString
            curUuid = s"${hex(sid, 0, 4)}-${hex(sid, 4, 6)}-${hex(sid, 6, 8)}-${hex(sid, 8, 10)}-${hex(sid, 10, 16)}"
            curGno = r.uintLE(8)
          case TABLE_MAP_EVENT =>
            val (id, t) = parseTableMap(r)
            tables(id) = t
          case WRITE_ROWS_V2 | UPDATE_ROWS_V2 | DELETE_ROWS_V2 =>
            val tableId = r.uintLE(6)
            r.skip(2)
            val extraLen = r.uintLE(2).toInt
            r.skip(extraLen - 2)
            val t = tables.getOrElse(tableId,
              throw new IllegalStateException(s"rows event for unmapped table id $tableId"))
            val n = r.lenenc().toInt
            require(n == t.cols.length, s"column count mismatch: $n != ${t.cols.length}")
            r.skip((n + 7) / 8)
            if (tpe == UPDATE_ROWS_V2) r.skip((n + 7) / 8)
            while (r.remaining > 0) {
              val row = tpe match {
                case WRITE_ROWS_V2 => Row("insert", None, Some(parseImage(r, t)))
                case DELETE_ROWS_V2 => Row("delete", Some(parseImage(r, t)), None)
                case UPDATE_ROWS_V2 =>
                  val b = parseImage(r, t); Row("update", Some(b), Some(parseImage(r, t)))
              }
              rows += ParsedRow(logPos, curUuid, curGno, tsSec, t, row)
            }
          case QUERY_EVENT =>
            r.skip(4); r.skip(4)
            val dbLen = r.u8()
            r.skip(2)
            val svLen = r.uintLE(2).toInt
            r.skip(svLen)
            val db = r.str(dbLen); r.skip(1)
            val query = r.str(bodyEnd - r.pos)
            ddls += ParsedDdl(logPos, curUuid, curGno, tsSec, db, query)
          case XID_EVENT | ROTATE_EVENT | PREVIOUS_GTIDS_EVENT => // txn commit / bookkeeping
          case _ => // unknown event types are skippable by design (size in header)
        }
      }
    }
    ParsedLog(rows.result(), ddls.result())
  }
}
