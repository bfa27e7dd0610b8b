package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.changelog.BinlogWire
import graft.changelog.BinlogWire._

/** Byte-level checks of the binlog v4 wire codec: the decimal golden
  * vector is from the public MySQL storage-format documentation (not from
  * our own writer), so writer and parser are not just validated against
  * each other.
  */
class BinlogWireSpec extends AnyFunSuite {

  private val uuidA = "3e11fa47-71ca-11e1-9e33-c80aa9429562"

  private def table = TableDef("graft", "events", Seq(
    Col("event_id", T.LONGLONG),
    Col("name", T.VARCHAR, meta = 300),
    Col("tag", T.VARCHAR, meta = 40),
    Col("score", T.DOUBLE),
    Col("ratio", T.FLOAT),
    Col("small", T.SHORT),
    Col("tiny", T.TINY),
    Col("amount", T.NEWDECIMAL, meta = (14 << 8) | 4),
    Col("blob", T.BLOB, meta = 2),
    Col("n32", T.LONG)))

  private def roundTrip(entries: Seq[Entry]): ParsedLog = {
    val bos = new ByteArrayOutputStream()
    BinlogWire.write(bos, entries.iterator)
    BinlogWire.parse(new ByteArrayInputStream(bos.toByteArray))
  }

  // ------------------------------------------------------------- decimals

  test("NEWDECIMAL golden vector: decimal(14,4) 1234567890.1234 = 81 0D FB 38 D2 04 D2") {
    val enc = BinlogWire.encodeDecimal(new java.math.BigDecimal("1234567890.1234"), 14, 4)
    assert(enc.map(b => f"${b & 0xff}%02X").mkString(" ") === "81 0D FB 38 D2 04 D2")
    assert(BinlogWire.decodeDecimal(enc, 14, 4) === new java.math.BigDecimal("1234567890.1234"))
  }

  test("NEWDECIMAL negative is bitwise inversion of the positive image") {
    val pos = BinlogWire.encodeDecimal(new java.math.BigDecimal("1234567890.1234"), 14, 4)
    val neg = BinlogWire.encodeDecimal(new java.math.BigDecimal("-1234567890.1234"), 14, 4)
    assert(neg.toSeq === pos.map(b => (~b).toByte).toSeq)
    assert(BinlogWire.decodeDecimal(neg, 14, 4) === new java.math.BigDecimal("-1234567890.1234"))
  }

  test("NEWDECIMAL round-trips across precisions/scales") {
    val cases = Seq(
      ("0.0000", 14, 4), ("0.0001", 14, 4), ("-0.0001", 14, 4),
      ("99999999.99", 10, 2), ("-99999999.99", 10, 2),
      ("123456789012345678.123456789", 27, 9),
      ("5", 5, 0), ("-5", 5, 0), ("0", 1, 0))
    cases.foreach { case (s, p, sc) =>
      val v = new java.math.BigDecimal(s).setScale(sc)
      val enc = BinlogWire.encodeDecimal(v, p, sc)
      assert(enc.length === BinlogWire.decimalBinSize(p, sc), s"size for $s")
      assert(BinlogWire.decodeDecimal(enc, p, sc) === v, s"round trip $s")
    }
  }

  // ------------------------------------------------------------ round trip

  test("typed row round-trip: insert/update/delete with nulls, UTF-8, negatives") {
    val before: IndexedSeq[Any] = IndexedSeq(
      java.lang.Long.valueOf(-42L), "héllo wörld ✓", null,
      java.lang.Double.valueOf(-1.5e300), java.lang.Float.valueOf(2.5f),
      java.lang.Long.valueOf(-32768L), java.lang.Long.valueOf(-128L),
      new java.math.BigDecimal("-999.9999"),
      Array[Byte](0, 1, -2, 127), java.lang.Long.valueOf(-2147483648L))
    val after = before.updated(1, "changed").updated(2, "was-null": Any)
    val log = roundTrip(Seq(
      Txn(uuidA, 1L, 1705276800000L, table, Seq(Row("insert", None, Some(before)))),
      Txn(uuidA, 2L, 1705276801000L, table, Seq(Row("update", Some(before), Some(after)))),
      Txn(uuidA, 3L, 1705276802000L, table, Seq(Row("delete", Some(after), None)))))
    assert(log.rows.size === 3)
    val ins = log.rows(0)
    assert(ins.uuid === uuidA && ins.gno === 1L && ins.tsSec === 1705276800L)
    assert(ins.table.db === "graft" && ins.table.tbl === "events")
    assert(ins.table.cols.map(_.name) === table.cols.map(_.name))
    def eq(a: IndexedSeq[Any], b: IndexedSeq[Any]): Unit =
      a.zip(b).zipWithIndex.foreach {
        case ((x: Array[Byte], y: Array[Byte]), _) => assert(x.toSeq === y.toSeq)
        case ((x, y), i) => assert(x === y, s"col $i")
      }
    eq(ins.row.after.get, before)
    val upd = log.rows(1)
    assert(upd.row.op === "update")
    eq(upd.row.before.get, before); eq(upd.row.after.get, after)
    val del = log.rows(2)
    assert(del.row.op === "delete")
    eq(del.row.before.get, after)
  }

  test("DDL entries parse back with db and query text") {
    val log = roundTrip(Seq(
      Ddl(uuidA, 7L, 1705276800000L, "graft", "ALTER TABLE events ADD COLUMN x INT")))
    assert(log.ddls.size === 1)
    val d = log.ddls.head
    assert(d.uuid === uuidA && d.gno === 7L && d.db === "graft")
    assert(d.query === "ALTER TABLE events ADD COLUMN x INT")
  }

  test("unsigned flag survives via SIGNEDNESS optional metadata") {
    val t = TableDef("d", "t", Seq(
      Col("a", T.TINY, unsigned = true),
      Col("s", T.VARCHAR, meta = 10),
      Col("b", T.LONG, unsigned = false)))
    val vals: IndexedSeq[Any] = IndexedSeq(
      java.lang.Long.valueOf(200L), "x", java.lang.Long.valueOf(-5L))
    val log = roundTrip(Seq(Txn(uuidA, 1L, 0L, t, Seq(Row("insert", None, Some(vals))))))
    val cols = log.rows.head.table.cols
    assert(cols.map(_.unsigned) === Seq(true, false, false))
    // unsigned TINY 200 must NOT wrap to -56
    assert(log.rows.head.row.after.get(0) === 200L)
    assert(log.rows.head.row.after.get(2) === -5L)
  }

  // --------------------------------------------------------------- errors

  test("corrupted byte fails the CRC32 check loudly") {
    val bos = new ByteArrayOutputStream()
    BinlogWire.write(bos, Iterator(
      Txn(uuidA, 1L, 0L, table.copy(cols = table.cols.take(1)),
        Seq(Row("insert", None, Some(IndexedSeq(java.lang.Long.valueOf(7L))))))))
    val bytes = bos.toByteArray
    // flip one bit inside the LAST event's body (not in magic/FDE header)
    bytes(bytes.length - 10) = (bytes(bytes.length - 10) ^ 0x01).toByte
    val ex = intercept[IllegalArgumentException] {
      BinlogWire.parse(new ByteArrayInputStream(bytes))
    }
    assert(ex.getMessage.contains("CRC32"))
  }

  test("EXHAUSTIVE corruption fuzz: every single-byte flip fails loudly, none mis-parses") {
    // Every byte of the wire format is integrity-covered: the 4 magic
    // bytes gate the header check, and every event's header+body+CRC
    // field participates in the CRC32 comparison. So flipping ANY single
    // byte must throw — a flip that parsed into different entries would
    // be a silent-corruption hole in the format.
    val bos = new ByteArrayOutputStream()
    BinlogWire.write(bos, Iterator(
      Txn(uuidA, 1L, 0L, table.copy(cols = table.cols.take(1)),
        Seq(Row("insert", None, Some(IndexedSeq(java.lang.Long.valueOf(7L)))),
          Row("delete", Some(IndexedSeq(java.lang.Long.valueOf(7L))), None)))))
    val clean = bos.toByteArray
    val baseline = BinlogWire.parse(new ByteArrayInputStream(clean))
    // several deltas per position: a single fixed bit could miss a field
    // where only some bits are integrity-covered
    val deltas = Seq(0x01, 0x40, 0x80, 0xFF)
    val silent = for {
      i <- 0 until clean.length
      d <- deltas
      mutated = clean.clone()
      _ = mutated(i) = (mutated(i) ^ d).toByte
      msg <- try {
        val parsed = BinlogWire.parse(new ByteArrayInputStream(mutated))
        // parse "succeeded": only acceptable if it equals the baseline,
        // which a byte change cannot (it would mean the byte is dead weight)
        if (parsed.toString == baseline.toString) Some(s"byte $i ^$d: flip invisible")
        else Some(s"byte $i ^$d: silently parsed DIFFERENT content")
      } catch { case _: Exception => None } // loud failure = correct
    } yield msg
    assert(silent.isEmpty,
      s"${silent.size} byte positions corrupt silently:\n" + silent.take(10).mkString("\n"))
  }

  test("bad magic is rejected") {
    val ex = intercept[IllegalArgumentException] {
      BinlogWire.parse(new ByteArrayInputStream(Array[Byte](1, 2, 3, 4)))
    }
    assert(ex.getMessage.contains("magic"))
  }

  test("truncated log fails loudly") {
    val bos = new ByteArrayOutputStream()
    BinlogWire.write(bos, Iterator(
      Txn(uuidA, 1L, 0L, table.copy(cols = table.cols.take(1)),
        Seq(Row("insert", None, Some(IndexedSeq(java.lang.Long.valueOf(7L))))))))
    val bytes = bos.toByteArray
    intercept[java.io.EOFException] {
      BinlogWire.parse(new ByteArrayInputStream(bytes, 0, bytes.length - 3))
    }
  }

  // ---------------------------------------------- spec-layout hand checks

  test("header layout: event_size and log_pos fields are consistent LE u32 chains") {
    val bos = new ByteArrayOutputStream()
    BinlogWire.write(bos, Iterator(
      Ddl(uuidA, 1L, 1700000000000L, "db1", "ALTER TABLE t ADD c INT")))
    val b = bos.toByteArray
    assert((b(0) & 0xff) === 0xfe && b(1) === 'b' && b(2) === 'i' && b(3) === 'n')
    // walk events by the size field; positions must chain and match log_pos
    var pos = 4
    var expectedLogPos = 4L
    var count = 0
    while (pos < b.length) {
      def u32(off: Int): Long =
        (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) | ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
      val size = u32(pos + 9)
      val logPos = u32(pos + 13)
      expectedLogPos += size
      assert(logPos === expectedLogPos, s"event $count log_pos")
      pos += size.toInt
      count += 1
    }
    assert(pos === b.length)
    assert(count === 3) // FDE, GTID, QUERY
    // second event is GTID (type code 33) carrying our uuid bytes
    val fdeSize = {
      def u32(off: Int): Long =
        (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) | ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
      u32(4 + 9).toInt
    }
    val gtidOff = 4 + fdeSize
    assert((b(gtidOff + 4) & 0xff) === 33)
    val sid = (0 until 16).map(i => f"${b(gtidOff + 19 + 1 + i) & 0xff}%02x").mkString
    assert(sid === uuidA.replace("-", ""))
  }

  test("hand-built WRITE_ROWS event bytes parse correctly (layout independence)") {
    // Build a minimal log by hand from the public layout: magic, FDE (from
    // the writer — format bootstrap), then hand-assembled TABLE_MAP +
    // WRITE_ROWS + GTID for a 2-column table (LONGLONG id, VARCHAR(5) s).
    val crc = new java.util.zip.CRC32
    def event(ts: Long, tpe: Int, body: Array[Byte], logPos: Long): Array[Byte] = {
      val size = 19 + body.length + 4
      val h = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      h.putInt(ts.toInt); h.put(tpe.toByte); h.putInt(1); h.putInt(size); h.putInt(logPos.toInt); h.putShort(0)
      h.put(body)
      crc.reset(); crc.update(h.array(), 0, 19 + body.length)
      h.putInt(crc.getValue.toInt)
      h.array()
    }
    val bos = new ByteArrayOutputStream()
    BinlogWire.write(bos, Iterator.empty) // magic + FDE only
    val pre = bos.toByteArray
    val out = new ByteArrayOutputStream()
    out.write(pre)
    var logPos = pre.length.toLong
    // GTID: flags(1) sid(16) gno(8) lt(1) lc(8) seq(8)
    val gtid = java.nio.ByteBuffer.allocate(42).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    gtid.put(1.toByte)
    uuidA.replace("-", "").grouped(2).foreach(h => gtid.put(Integer.parseInt(h, 16).toByte))
    gtid.putLong(9L); gtid.put(2.toByte); gtid.putLong(0L); gtid.putLong(1L)
    var e = event(0, 33, gtid.array(), logPos + 19 + 42 + 4); logPos += e.length; out.write(e)
    // TABLE_MAP for table id 5: db "d", tbl "t", cols [LONGLONG, VARCHAR(5)]
    val tm = new ByteArrayOutputStream()
    tm.write(Array[Byte](5, 0, 0, 0, 0, 0)) // table id 6B
    tm.write(Array[Byte](1, 0))             // flags
    tm.write(1); tm.write('d'); tm.write(0)
    tm.write(1); tm.write('t'); tm.write(0)
    tm.write(2)                              // col count (lenenc < 251)
    tm.write(8); tm.write(15)                // LONGLONG, VARCHAR
    tm.write(2); tm.write(5); tm.write(0)    // meta block: len=2, varchar max=5 LE
    tm.write(0x03)                           // null bitmap (2 cols)
    // optional metadata: SIGNEDNESS for 1 numeric col (signed)
    tm.write(1); tm.write(1); tm.write(0x00)
    // COLUMN_NAME: "id", "s"
    val names = new ByteArrayOutputStream()
    names.write(2); names.write("id".getBytes); names.write(1); names.write("s".getBytes)
    tm.write(4); tm.write(names.size); names.writeTo(tm)
    e = event(0, 19, tm.toByteArray, logPos + 19 + tm.size + 4); logPos += e.length; out.write(e)
    // WRITE_ROWS_V2: table id, flags, extra len 2, col count 2, present ff, row
    val wr = new ByteArrayOutputStream()
    wr.write(Array[Byte](5, 0, 0, 0, 0, 0))
    wr.write(Array[Byte](0, 0))
    wr.write(Array[Byte](2, 0))              // extra data length (self only)
    wr.write(2)                              // col count
    wr.write(0x03)                           // columns present
    wr.write(0x00)                           // null bitmap: none null
    wr.write(Array[Byte](0x2A, 0, 0, 0, 0, 0, 0, 0)) // id = 42 LE
    wr.write(3); wr.write("abc".getBytes)    // varchar(5): 1-byte len
    e = event(0, 30, wr.toByteArray, logPos + 19 + wr.size + 4); logPos += e.length; out.write(e)
    val log = BinlogWire.parse(new ByteArrayInputStream(out.toByteArray))
    assert(log.rows.size === 1)
    val r = log.rows.head
    assert(r.uuid === uuidA && r.gno === 9L)
    assert(r.table.db === "d" && r.table.tbl === "t")
    assert(r.table.cols.map(_.name) === Seq("id", "s"))
    assert(r.row.op === "insert")
    assert(r.row.after.get(0) === 42L)
    assert(r.row.after.get(1) === "abc")
  }
}
