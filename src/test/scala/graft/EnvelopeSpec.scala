package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.encode.{CfDecode, CommonFormatJson, Envelope}

class EnvelopeSpec extends SparkSuite {

  test("wrap/unwrap round-trips header and returns payload untouched") {
    val payload = Array[Byte](1, 2, 3, 0x7f, -1, '}', '{')
    val wrapped = Envelope.wrap("avro", "11222", payload, seqNo = 42L,
      timestampNanos = 1700000000000000000L)
    val (header, got) = Envelope.unwrap(wrapped)
    assert(header.eventType == "avro")
    assert(header.key == Seq("11222"))
    assert(header.seqNo == 42L)
    assert(header.timestamp == 1700000000000000000L)
    assert(got.toSeq == payload.toSeq)
  }

  test("unwrap tolerates json-ish bytes inside the payload") {
    val payload = """{"Type":"fake","Key":[1]}""".getBytes("UTF-8")
    val (header, got) = Envelope.unwrap(Envelope.wrap("json", "k", payload, 1L, 0L))
    assert(header.eventType == "json")
    assert(new String(got, "UTF-8") == """{"Type":"fake","Key":[1]}""")
  }
}

class CfDecodeSpec extends SparkSuite {
  import spark.implicits._

  test("encode -> decode round-trip restores typed values") {
    val payload = StructType(Seq(
      StructField("f1", LongType),
      StructField("f3", IntegerType),
      StructField("f2", StringType)))
    val src = Seq((1L, 0, "bbb1", "insert", 5L), (2L, 7, null, "insert", 6L))
      .toDF("f1", "f3", "f2", "op", "seqno")
    val encoded = src.select(
      CommonFormatJson.encodeRows(src, pkCols = Seq("f1"),
        payloadCols = Seq("f1", "f3", "f2")).as("j"))
    val decoded = encoded.select(CfDecode.decodeRows(col("j"), payload): _*)

    val rows = decoded.orderBy("seqno").collect()
    assert(rows(0).getAs[String]("op") == "insert")
    assert(rows(0).getAs[Long]("seqno") == 5L)
    assert(rows(0).getAs[scala.collection.Seq[String]]("key").toSeq == Seq("1"))
    assert(rows(0).getAs[Long]("f1") == 1L)
    assert(rows(0).getAs[Int]("f3") == 0)
    assert(rows(0).getAs[String]("f2") == "bbb1")
    assert(rows(1).isNullAt(rows(1).fieldIndex("f2"))) // null survives
  }

  test("delete events decode with null payload fields") {
    val payload = StructType(Seq(StructField("f1", LongType)))
    val src = Seq((3L, "delete", 9L)).toDF("f1", "op", "seqno")
    val encoded = src.select(
      CommonFormatJson.encodeRows(src, Seq("f1"), Seq("f1")).as("j"))
    val r = encoded.select(CfDecode.decodeRows(col("j"), payload): _*).head()
    assert(r.getAs[String]("op") == "delete")
    assert(r.getAs[scala.collection.Seq[String]]("key").toSeq == Seq("3"))
    assert(r.isNullAt(r.fieldIndex("f1"))) // no Fields on deletes
  }

  test("timestamps render RFC3339Nano (no trailing zeros) and round-trip") {
    import graft.encode.CommonFormatJson
    val src = Seq(
      java.sql.Timestamp.valueOf("2024-01-01 00:09:58.778549"),
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-01-01 12:00:00.5"))
      .toDF("ts").withColumn("op", lit("insert")).withColumn("seqno", lit(1L))
    val payload = StructType(Seq(StructField("ts", TimestampType)))
    val encoded = src.select(col("ts"),
      CommonFormatJson.encodeRows(src, Seq("seqno"), Seq("ts")).as("j"))
    val strs = encoded.select(col("j")).collect().map(_.getString(0))
    assert(strs(0).contains(""""Value":"2024-01-01T00:09:58.778549Z""""))
    assert(strs(1).contains(""""Value":"2024-01-01T00:00:00Z""""))
    assert(strs(2).contains(""""Value":"2024-01-01T12:00:00.5Z""""))
    // decode restores the original instants
    val decoded = encoded.select(col("ts"),
      CfDecode.decodeRows(col("j"), payload).last.as("ts2"))
    assert(decoded.filter(col("ts") =!= col("ts2")).count() == 0)
  }

  test("binary fixup: base64 back to bytes") {
    val src = Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("b")
      .withColumn("op", lit("insert")).withColumn("seqno", lit(1L))
    val payload = StructType(Seq(StructField("b", BinaryType)))
    val encoded = src.select(
      CommonFormatJson.encodeRows(src, Seq("seqno"), Seq("b")).as("j"))
    val r = encoded.select(CfDecode.decodeRows(col("j"), payload): _*).head()
    assert(r.getAs[Array[Byte]]("b").toSeq == Seq[Byte](1, 2, 3))
  }
}
