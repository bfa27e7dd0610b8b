package graft.encode

import java.io.ByteArrayOutputStream

/** Minimal MessagePack encoder for Common Format events (E3).
  *
  * No msgpack library ships in-container, so this implements the subset of
  * the public MessagePack spec (https://msgpack.org) the CF event needs:
  * fixmap/map16, fixstr/str8/str16, nil, bool, minimal-size ints,
  * fixarray/array16, bin8/16/32, float32/float64. The reference generates
  * its codec with the public tinylib `msgp` generator
  * (/root/reference/types/format.go:23); byte parity follows that
  * generator's wire rules — struct = fixmap of field names, signed ints
  * minimal-size with positives skipping int8 (`WriteInt64`), `SeqNo` as
  * uint64 (`WriteUint64` → 0xcc/0xcd/0xce/0xcf), float32 as 0xca —
  * asserted by the golden-byte fixtures in EncodeSpec. Field names match
  * the Go struct: Type, Key, SeqNo, Timestamp, Fields.
  */
object MsgPackCodec {

  final class Packer {
    private val out = new ByteArrayOutputStream()

    def bytes: Array[Byte] = out.toByteArray

    def packMapHeader(n: Int): Packer = {
      if (n < 16) out.write(0x80 | n)
      else { out.write(0xde); out.write(n >> 8); out.write(n & 0xff) }
      this
    }

    def packArrayHeader(n: Int): Packer = {
      if (n < 16) out.write(0x90 | n)
      else { out.write(0xdc); out.write(n >> 8); out.write(n & 0xff) }
      this
    }

    def packString(s: String): Packer = {
      val b = s.getBytes("UTF-8")
      if (b.length < 32) out.write(0xa0 | b.length)
      else if (b.length < 256) { out.write(0xd9); out.write(b.length) }
      else { out.write(0xda); out.write(b.length >> 8); out.write(b.length & 0xff) }
      out.write(b, 0, b.length)
      this
    }

    def packNil(): Packer = { out.write(0xc0); this }

    def packBoolean(v: Boolean): Packer = { out.write(if (v) 0xc3 else 0xc2); this }

    private def writeBE(v: Long, nBytes: Int): Unit = {
      var i = (nBytes - 1) * 8
      while (i >= 0) { out.write(((v >> i) & 0xff).toInt); i -= 8 }
    }

    /** Minimal-size SIGNED int — byte-for-byte the public tinylib/msgp
      * `WriteInt64` (the codec `//go:generate msgp` emits for int64
      * struct fields, /root/reference/types/format.go:23): positives use
      * fixint then int16/int32/int64 (never int8); negatives walk
      * fixint/int8/int16/int32/int64.
      */
    def packLong(v: Long): Packer = {
      if (v >= 0) {
        if (v <= 127) out.write(v.toInt)
        else if (v <= Short.MaxValue) { out.write(0xd1); writeBE(v, 2) }
        else if (v <= Int.MaxValue) { out.write(0xd2); writeBE(v, 4) }
        else { out.write(0xd3); writeBE(v, 8) }
      } else {
        if (v >= -32) out.write(0xe0 | (v.toInt & 0x1f))
        else if (v >= Byte.MinValue) { out.write(0xd0); writeBE(v, 1) }
        else if (v >= Short.MinValue) { out.write(0xd1); writeBE(v, 2) }
        else if (v >= Int.MinValue) { out.write(0xd2); writeBE(v, 4) }
        else { out.write(0xd3); writeBE(v, 8) }
      }
      this
    }

    /** Minimal-size UNSIGNED int (`WriteUint64` — SeqNo is uint64). */
    def packUnsigned(v: Long): Packer = {
      require(v >= 0, "uint64 fixture values are limited to Long range here")
      if (v <= 127) out.write(v.toInt)
      else if (v <= 0xffL) { out.write(0xcc); writeBE(v, 1) }
      else if (v <= 0xffffL) { out.write(0xcd); writeBE(v, 2) }
      else if (v <= 0xffffffffL) { out.write(0xce); writeBE(v, 4) }
      else { out.write(0xcf); writeBE(v, 8) }
      this
    }

    def packFloat(v: Float): Packer = {
      out.write(0xca)
      writeBE(java.lang.Float.floatToIntBits(v).toLong & 0xffffffffL, 4)
      this
    }

    def packDouble(v: Double): Packer = {
      out.write(0xcb)
      val bits = java.lang.Double.doubleToLongBits(v)
      var i = 56
      while (i >= 0) { out.write(((bits >> i) & 0xff).toInt); i -= 8 }
      this
    }

    def packBinary(b: Array[Byte]): Packer = {
      if (b.length < 256) { out.write(0xc4); out.write(b.length) }
      else if (b.length < 65536) { out.write(0xc5); out.write(b.length >> 8); out.write(b.length & 0xff) }
      else {
        out.write(0xc6)
        var i = 24
        while (i >= 0) { out.write((b.length >> i) & 0xff); i -= 8 }
      }
      out.write(b, 0, b.length)
      this
    }

    def packValue(v: Any): Packer = v match {
      case null => packNil()
      case s: String => packString(s)
      case i: Int => packLong(i.toLong)
      case l: Long => packLong(l)
      case b: Boolean => packBoolean(b)
      case d: Double => packDouble(d)
      case f: Float => packFloat(f) // float32 wire type, like msgp AppendIntf
      // DECIMAL → float64 at the wire edge (util/util.go:234)
      case d: java.math.BigDecimal => packDouble(d.doubleValue())
      case b: Array[Byte] => packBinary(b)
      case other => packString(other.toString)
    }
  }

  /** CF event → msgpack bytes. Field layout mirrors types.CommonFormatEvent
    * (/root/reference/types/format.go:26-46).
    */
  def encodeEvent(opType: String, key: Seq[Any], seqNo: Long, timestamp: Long,
                  fields: Option[Seq[(String, Any)]]): Array[Byte] = {
    val p = new Packer
    p.packMapHeader(5)
    p.packString("Type").packString(opType)
    p.packString("Key").packArrayHeader(key.length)
    key.foreach(p.packValue)
    p.packString("SeqNo").packUnsigned(seqNo) // SeqNo is uint64 in the Go struct
    p.packString("Timestamp").packLong(timestamp)
    p.packString("Fields")
    fields match {
      case None => p.packNil()
      case Some(fs) =>
        p.packArrayHeader(fs.length)
        fs.foreach { case (n, v) =>
          p.packMapHeader(2)
          p.packString("Name").packString(n)
          p.packString("Value").packValue(v)
        }
    }
    p.bytes
  }

  // ------------------------------------------------------------- decoding

  /** Minimal decoder for round-trip tests. Returns (value, bytesConsumed). */
  def decode(b: Array[Byte], off: Int = 0): (Any, Int) = {
    val t = b(off) & 0xff
    if (t < 0x80) (t.toLong, 1)
    else if (t >= 0xe0) ((t - 256).toLong, 1)
    else if ((t & 0xf0) == 0x80) decodeMap(b, off + 1, t & 0x0f)
    else if ((t & 0xf0) == 0x90) decodeArray(b, off + 1, t & 0x0f)
    else if ((t & 0xe0) == 0xa0) decodeStr(b, off + 1, t & 0x1f)
    else t match {
      case 0xc0 => (null, 1)
      case 0xc2 => (false, 1)
      case 0xc3 => (true, 1)
      case 0xc4 => val n = b(off + 1) & 0xff; (b.slice(off + 2, off + 2 + n), 2 + n)
      case 0xc5 => val n = ((b(off + 1) & 0xff) << 8) | (b(off + 2) & 0xff); (b.slice(off + 3, off + 3 + n), 3 + n)
      case 0xca =>
        var bits = 0
        var i = 0
        while (i < 4) { bits = (bits << 8) | (b(off + 1 + i) & 0xff); i += 1 }
        (java.lang.Float.intBitsToFloat(bits), 5)
      case 0xcb =>
        var bits = 0L
        var i = 0
        while (i < 8) { bits = (bits << 8) | (b(off + 1 + i) & 0xffL); i += 1 }
        (java.lang.Double.longBitsToDouble(bits), 9)
      case 0xcc => ((b(off + 1) & 0xffL), 2)
      case 0xcd => (((b(off + 1) & 0xffL) << 8) | (b(off + 2) & 0xffL), 3)
      case 0xce =>
        var v = 0L
        var i = 0
        while (i < 4) { v = (v << 8) | (b(off + 1 + i) & 0xffL); i += 1 }
        (v, 5)
      case 0xcf =>
        var v = 0L
        var i = 0
        while (i < 8) { v = (v << 8) | (b(off + 1 + i) & 0xffL); i += 1 }
        (v, 9)
      case 0xd0 => (b(off + 1).toLong, 2)
      case 0xd1 => (((b(off + 1).toLong) << 8) | (b(off + 2) & 0xffL), 3)
      case 0xd2 =>
        var v = b(off + 1).toLong
        var i = 1
        while (i < 4) { v = (v << 8) | (b(off + 1 + i) & 0xffL); i += 1 }
        (v, 5)
      case 0xd3 =>
        var v = 0L
        var i = 0
        while (i < 8) { v = (v << 8) | (b(off + 1 + i) & 0xffL); i += 1 }
        (v, 9)
      case 0xd9 => val n = b(off + 1) & 0xff; decodeStr(b, off + 2, n) match { case (s, c) => (s, c + 1) }
      case 0xda => val n = ((b(off + 1) & 0xff) << 8) | (b(off + 2) & 0xff); decodeStr(b, off + 3, n) match { case (s, c) => (s, c + 2) }
      case 0xdc => val n = ((b(off + 1) & 0xff) << 8) | (b(off + 2) & 0xff); decodeArray(b, off + 3, n) match { case (a, c) => (a, c + 2) }
      case 0xde => val n = ((b(off + 1) & 0xff) << 8) | (b(off + 2) & 0xff); decodeMap(b, off + 3, n) match { case (m, c) => (m, c + 2) }
      case other => throw new IllegalArgumentException(f"msgpack type 0x$other%02x unsupported")
    }
  }

  private def decodeStr(b: Array[Byte], off: Int, n: Int): (String, Int) =
    (new String(b, off, n, "UTF-8"), 1 + n)

  private def decodeArray(b: Array[Byte], off: Int, n: Int): (Seq[Any], Int) = {
    var o = off
    val items = (0 until n).map { _ =>
      val (v, c) = decode(b, o); o += c; v
    }
    (items, 1 + (o - off))
  }

  private def decodeMap(b: Array[Byte], off: Int, n: Int): (Map[Any, Any], Int) = {
    var o = off
    val items = (0 until n).map { _ =>
      val (k, kc) = decode(b, o); o += kc
      val (v, vc) = decode(b, o); o += vc
      k -> v
    }
    (items.toMap, 1 + (o - off))
  }
}
