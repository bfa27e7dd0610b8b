package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.encode.MsgPackCodec
import graft.pipes.Framing

/** Length-delimited binary framing round-trip — msgpack CF events over
  * the file pipe (the reference's binary file layout).
  */
class FramingSpec extends SparkSuite {
  import spark.implicits._

  test("frame wire format: 4-byte little-endian length prefix") {
    val out = new ByteArrayOutputStream()
    Framing.writeFrame(out, Array[Byte](0x61, 0x62, 0x63))
    val bytes = out.toByteArray
    assert(bytes.take(4).toSeq == Seq[Byte](3, 0, 0, 0)) // LE uint32
    assert(bytes.drop(4).toSeq == Seq[Byte](0x61, 0x62, 0x63))
    val back = Framing.readFrames(new ByteArrayInputStream(bytes)).toList
    assert(back.map(_.toSeq) == List(Seq[Byte](0x61, 0x62, 0x63)))
    // empty records and multiple frames
    val out2 = new ByteArrayOutputStream()
    Framing.writeFrame(out2, Array.empty[Byte])
    Framing.writeFrame(out2, Array.fill[Byte](300)(7))
    val back2 = Framing.readFrames(new ByteArrayInputStream(out2.toByteArray)).toList
    assert(back2.map(_.length) == List(0, 300))
  }

  test("truncated frame fails integrity, not silence") {
    val out = new ByteArrayOutputStream()
    Framing.writeFrame(out, Array.fill[Byte](10)(1))
    val cut = out.toByteArray.dropRight(3)
    intercept[IllegalArgumentException] {
      Framing.readFrames(new ByteArrayInputStream(cut)).toList
    }
  }

  test("msgpack CF events round-trip through a gzip framed file pipe") {
    val dir = Files.createTempDirectory("graft-framed").toString + "/out"
    val events = (1L to 500L).map { i =>
      MsgPackCodec.encodeEvent(if (i % 7 == 0) "delete" else "insert",
        Seq(i), i, 0L,
        if (i % 7 == 0) None else Some(Seq("f1" -> i, "f2" -> s"v$i")))
    }
    val df = events.toDF("value")
    val written = Framing.write(df, dir, "value", gzip = true)
    assert(written == 500)

    val back = Framing.read(spark, dir)
    assert(back.count() == 500)
    val decoded = back.select("value").collect().map { r =>
      MsgPackCodec.decode(r.getAs[Array[Byte]](0))._1.asInstanceOf[Map[Any, Any]]
    }
    assert(decoded.map(_("SeqNo").asInstanceOf[Long]).sorted.toSeq == (1L to 500L))
    val deletes = decoded.filter(_("Type") == "delete")
    assert(deletes.length == 500 / 7 && deletes.forall(_("Fields") == null))
  }
}
