package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.encode.{AvroCodec, CommonFormatJson, MsgPackCodec, SqlDml}

class CfJsonSpec extends SparkSuite {
  import spark.implicits._
  import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

  test("insert golden string — typed values, nulls (main_test.go:57)") {
    // {"Type":"insert","Key":[1],"SeqNo":5,"Timestamp":0,
    //  "Fields":[{"Name":"f1","Value":1},{"Name":"f3","Value":0},{"Name":"f4","Value":null}]}
    val df = Seq((1L, 0, Option.empty[Int])).toDF("f1", "f3", "f4").select(
      CommonFormatJson.insertJson(Seq(col("f1") -> LongType), lit(5L), lit(0L),
        Seq(("f1", col("f1"), LongType), ("f3", col("f3"), IntegerType),
          ("f4", col("f4"), IntegerType))).as("j"))
    assert(df.head().getString(0) ==
      """{"Type":"insert","Key":[1],"SeqNo":5,"Timestamp":0,"Fields":[{"Name":"f1","Value":1},{"Name":"f3","Value":0},{"Name":"f4","Value":null}]}""")
  }

  test("string values quoted and escaped (main_test.go:58)") {
    val df = Seq((1L, "bbb1"), (2L, """q"uo\te""")).toDF("f1", "f2").select(
      CommonFormatJson.insertJson(Seq(col("f1") -> LongType), lit(6L), lit(0L),
        Seq(("f2", col("f2"), StringType))).as("j"))
    val rows = df.collect().map(_.getString(0))
    assert(rows(0) ==
      """{"Type":"insert","Key":[1],"SeqNo":6,"Timestamp":0,"Fields":[{"Name":"f2","Value":"bbb1"}]}""")
    assert(rows(1).contains("""{"Name":"f2","Value":"q\"uo\\te"}"""))
  }

  test("delete golden string: no Fields member (main_test.go:96)") {
    val df = Seq(Tuple1(3L)).toDF("f1").select(
      CommonFormatJson.deleteJson(Seq(col("f1") -> LongType), lit(9L), lit(0L)).as("j"))
    assert(df.head().getString(0) ==
      """{"Type":"delete","Key":[3],"SeqNo":9,"Timestamp":0}""")
  }

  test("schema event golden string (encoder_test.go:136 shape)") {
    val got = CommonFormatJson.schemaEventJson(Seq("f1"), 1L, 0L,
      Seq("f1" -> "bigint", "f2" -> "char(16)", "f17" -> "tinyint(1)"))
    assert(got ==
      """{"Type":"schema","Key":["f1"],"SeqNo":1,"Timestamp":0,"Fields":[{"Name":"f1","Value":"bigint"},{"Name":"f2","Value":"char(16)"},{"Name":"f17","Value":"tinyint(1)"}]}""")
  }
}

class SqlDmlSpec extends SparkSuite {
  import spark.implicits._

  private val cols = Seq(
    ("f1", col("f1"), false),
    ("f3", col("f3"), false),
    ("f4", col("f4"), true))

  test("INSERT golden string with NULL rendering (main_test.go:65)") {
    // INSERT INTO "e2e_test_table1" ("seqno","f1","f3","f4") VALUES (5,1,0,NULL);
    val df = Seq((1L, 0L, Option.empty[Int])).toDF("f1", "f3", "f4")
      .select(SqlDml.insertStmt("e2e_test_table1", lit(5L), cols).as("s"))
    assert(df.head().getString(0) ==
      """INSERT INTO "e2e_test_table1" ("seqno","f1","f3","f4") VALUES (5,1,0,NULL);""")
  }

  test("idempotent INSERT golden string (main_test.go:73)") {
    val df = Seq((1L, 0L, Option.empty[Int])).toDF("f1", "f3", "f4")
      .select(SqlDml.insertIdempotentStmt("e2e_test_table1", lit(5L), cols,
        pkCols = Set("f1")).as("s"))
    assert(df.head().getString(0) ==
      """INSERT INTO "e2e_test_table1" ("seqno","f1","f3","f4") VALUES (5,1,0,NULL)""" +
        """ ON DUPLICATE KEY UPDATE "f3"= IF(seqno < VALUES(seqno), VALUES("f3"),"f3"),""" +
        """"f4"= IF(seqno < VALUES(seqno), VALUES("f4"),"f4"),""" +
        """ seqno = IF(seqno < VALUES(seqno), VALUES(seqno), seqno);""")
  }

  test("string values escape embedded quotes") {
    val df = Seq(Tuple1("it's")).toDF("f4")
      .select(SqlDml.insertStmt("t", lit(1L), Seq(("f4", col("f4"), true))).as("s"))
    assert(df.head().getString(0).contains("'it''s'"))
  }

  test("DELETE golden string (main_test.go:101)") {
    val df = Seq(Tuple1(9L)).toDF("f1")
      .select(SqlDml.deleteStmt("e2e_test_table1", lit(33L),
        Seq(("f1", col("f1"), false))).as("s"))
    assert(df.head().getString(0) ==
      """DELETE FROM "e2e_test_table1" WHERE "seqno"=33 AND "f1"=9;""")
  }

  test("mysql dialect swaps identifier quoting") {
    val df = Seq(Tuple1(9L)).toDF("f1")
      .select(SqlDml.deleteStmt("t", lit(1L),
        Seq(("f1", col("f1"), false)), identQuote = "`").as("s"))
    assert(df.head().getString(0) == "DELETE FROM `t` WHERE `seqno`=1 AND `f1`=9;")
  }

  test("mysql dialect never rewrites quote chars inside data values") {
    // A data value containing double quotes must survive dialect rendering
    // untouched (reference quotes identifiers at build time, never data —
    // encoder/sql.go quotedIdent).
    val df = Seq(Tuple1("""say "hi" and `bye`""")).toDF("f4")
      .select(SqlDml.insertStmt("t", lit(1L), Seq(("f4", col("f4"), true)),
        identQuote = "`").as("s"))
    assert(df.head().getString(0) ==
      "INSERT INTO `t` (`seqno`,`f4`) VALUES (1,'say \"hi\" and `bye`');")
  }

  test("sink DDL shape: seqno unique key + PK") {
    // /root/reference/main_test.go:345 shape
    val ddl = SqlDml.createTableStmt("t",
      Seq(("f1", "INT", true), ("f4", "TEXT", false)), Seq("f1"))
    assert(ddl ==
      """CREATE TABLE "t" ("seqno" BIGINT NOT NULL, "f1" INT NOT NULL, "f4" TEXT, UNIQUE KEY("seqno"), PRIMARY KEY (f1));""")
  }
}

class MsgPackSpec extends SparkSuite {

  test("CF event round-trips through msgpack") {
    val bytes = MsgPackCodec.encodeEvent("insert", Seq(1L, "k"), 42L, 1700000000L,
      Some(Seq("f1" -> 1L, "f2" -> "text", "f3" -> 2.5d, "f4" -> null)))
    val (decoded, n) = MsgPackCodec.decode(bytes)
    assert(n == bytes.length)
    val m = decoded.asInstanceOf[Map[Any, Any]]
    assert(m("Type") == "insert")
    assert(m("SeqNo") == 42L)
    assert(m("Key").asInstanceOf[Seq[Any]] == Seq(1L, "k"))
    val fields = m("Fields").asInstanceOf[Seq[Any]].map(_.asInstanceOf[Map[Any, Any]])
    assert(fields.map(_("Name")) == Seq("f1", "f2", "f3", "f4"))
    assert(fields(2)("Value") == 2.5d)
    assert(fields(3)("Value") == null)
  }

  test("delete event has nil Fields (reference: key+type only)") {
    val bytes = MsgPackCodec.encodeEvent("delete", Seq(7L), 9L, 0L, None)
    val m = MsgPackCodec.decode(bytes)._1.asInstanceOf[Map[Any, Any]]
    assert(m("Type") == "delete")
    assert(m("Fields") == null)
  }

  test("integer edge encodings (fixint, negative, int64)") {
    for (v <- Seq(0L, 1L, 127L, -1L, -32L, 128L, -33L, Long.MaxValue, Long.MinValue)) {
      val b = MsgPackCodec.encodeEvent("insert", Seq(v), 1L, 0L, None)
      val m = MsgPackCodec.decode(b)._1.asInstanceOf[Map[Any, Any]]
      assert(m("Key").asInstanceOf[Seq[Any]].head == v, s"value $v")
    }
  }

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("golden bytes: basic insert (testBasicResult[0], msgp wire rules)") {
    // types.CommonFormatEvent{Type:"insert", Key:[int64(1)], SeqNo:1,
    // Timestamp:0, Fields:&[{f1,int64(1)}]} — encoder_test.go:56; bytes
    // hand-derived from the public tinylib/msgp generated-marshaler rules
    // (fixmap(5) of named fields, minimal-size ints).
    val bytes = MsgPackCodec.encodeEvent("insert", Seq(1L), 1L, 0L,
      Some(Seq("f1" -> 1L)))
    assert(hex(bytes) ==
      "85" + // fixmap(5)
      "a454797065" + "a6696e73657274" + // "Type":"insert"
      "a34b6579" + "9101" + // "Key":[1]
      "a55365714e6f" + "01" + // "SeqNo":1 (uint, pos fixint)
      "a954696d657374616d70" + "00" + // "Timestamp":0
      "a64669656c6473" + "91" + // "Fields": 1-elem array
      "82" + "a44e616d65" + "a26631" + "a556616c7565" + "01") // {Name:f1,Value:1}
  }

  test("golden bytes: delete with nil Fields (testBasicResult[2])") {
    // {Type:"delete", Key:[int64(2)], SeqNo:3, Timestamp:0, Fields:nil}
    val bytes = MsgPackCodec.encodeEvent("delete", Seq(2L), 3L, 0L, None)
    assert(hex(bytes) ==
      "85a454797065a664656c657465a34b65799102a55365714e6f03" +
      "a954696d657374616d7000a64669656c6473c0")
  }

  test("golden bytes: all-datatypes t2 row field values (msgp minimal sizes)") {
    // Value wire types from testAllDataTypesResult[0] (encoder_test.go:93),
    // minus time.Time (CF normalization renders datetimes as strings here):
    // int16/int32 positives never use int8 (msgp WriteInt64), uint SeqNo
    // uses 0xcc/0xcd..., float32 is 0xca, []byte is bin8, bool, nil.
    val bytes = MsgPackCodec.encodeEvent("insert", Seq(1L), 300L, 300L,
      Some(Seq(
        "f1" -> 1L,
        "f2" -> "asdf",
        "f8" -> 2017L,
        "f9" -> (1L << 54),
        "f10" -> "abc".getBytes("UTF-8"),
        "f11" -> 8765L,
        "f12" -> 1111f,
        "f13" -> 2222.67d,
        "f17" -> true,
        "f18" -> """{"one":"two"}""",
        "f2n" -> null)))
    val f13bits = "%016x".format(java.lang.Double.doubleToLongBits(2222.67d))
    assert(hex(bytes) ==
      "85" +
      "a454797065a6696e73657274" +
      "a34b65799101" +
      "a55365714e6f" + "cd012c" + // SeqNo 300 = uint16
      "a954696d657374616d70" + "d1012c" + // Timestamp 300 = int16
      "a64669656c64739b" + // 11 fields
      "82a44e616d65a26631a556616c756501" + // f1: 1
      "82a44e616d65a26632a556616c7565a461736466" + // f2: "asdf"
      "82a44e616d65a26638a556616c7565d107e1" + // f8: 2017 int16
      "82a44e616d65a26639a556616c7565d30040000000000000" + // f9: 1<<54 int64
      "82a44e616d65a3663130a556616c7565c403616263" + // f10: bin8 "abc"
      "82a44e616d65a3663131a556616c7565d1223d" + // f11: 8765 int16
      "82a44e616d65a3663132a556616c7565ca448ae000" + // f12: float32 1111
      "82a44e616d65a3663133a556616c7565cb" + f13bits + // f13: double
      "82a44e616d65a3663137a556616c7565c3" + // f17: true
      "82a44e616d65a3663138a556616c7565ad7b226f6e65223a2274776f227d" + // f18 json str
      "82a44e616d65a366326ea556616c7565c0") // null
    // decode round-trip of the same buffer
    val (decoded, n) = MsgPackCodec.decode(bytes)
    assert(n == bytes.length)
    val m = decoded.asInstanceOf[Map[Any, Any]]
    assert(m("SeqNo") == 300L && m("Timestamp") == 300L)
    val fields = m("Fields").asInstanceOf[Seq[Any]].map(_.asInstanceOf[Map[Any, Any]])
    assert(fields.find(_("Name") == "f12").get("Value") == 1111f)
    assert(fields.find(_("Name") == "f9").get("Value") == (1L << 54))
    assert(java.util.Arrays.equals(
      fields.find(_("Name") == "f10").get("Value").asInstanceOf[Array[Byte]],
      "abc".getBytes("UTF-8")))
  }

  test("unsigned SeqNo boundaries use uint wire types") {
    def seqNoByte(seq: Long): String = {
      val b = MsgPackCodec.encodeEvent("insert", Seq(1L), seq, 0L, None)
      val h = hex(b)
      h.substring(h.indexOf("a55365714e6f") + "a55365714e6f".length,
        h.indexOf("a954696d657374616d70"))
    }
    assert(seqNoByte(127L) == "7f") // positive fixint
    assert(seqNoByte(200L) == "ccc8") // uint8
    assert(seqNoByte(65535L) == "cdffff") // uint16
    assert(seqNoByte(1L << 32) == "cf0000000100000000") // uint64
  }
}

class AvroCodecSpec extends SparkSuite {
  import spark.implicits._

  private val payload = StructType(Seq(
    StructField("f1", LongType, nullable = false),
    StructField("f2", StringType),
    StructField("f3", DoubleType)))

  test("insert rows round-trip with ref_key/row_key/is_deleted metadata") {
    val df = Seq((1L, "a", 2.5, 10L, "11", "insert"))
      .toDF("f1", "f2", "f3", "seqno", "row_key", "op")
    val bytes = AvroCodec.encode(df, payload, "t1", "graft").head()
    val rec = AvroCodec.decode(bytes, AvroCodec.avroSchema(payload, "t1", "graft"))
    assert(rec.get("f1") == 1L)
    assert(rec.get("f2").toString == "a")
    assert(rec.get("f3") == 2.5)
    assert(rec.get("ref_key") == 10L)
    assert(rec.get("is_deleted") == false)
    val rk = rec.get("row_key").asInstanceOf[java.nio.ByteBuffer]
    assert(new String(rk.array(), rk.position(), rk.remaining()) == "11")
  }

  test("delete events carry only metadata (payload nulled)") {
    val df = Seq((1L, "a", 2.5, 11L, "11", "delete"))
      .toDF("f1", "f2", "f3", "seqno", "row_key", "op")
    val bytes = AvroCodec.encode(df, payload, "t1", "graft").head()
    val rec = AvroCodec.decode(bytes, AvroCodec.avroSchema(payload, "t1", "graft"))
    assert(rec.get("f1") == null)
    assert(rec.get("f2") == null)
    assert(rec.get("is_deleted") == true)
    assert(rec.get("ref_key") == 11L)
  }

  test("golden bytes: avro binary encoding per the public Avro spec") {
    // union [type, null] writes a zigzag branch index then the value;
    // longs/lengths are zigzag varints. Hand-derived for
    // (f1=1L, f2="asdf", f3=null, ref_key=42, row_key="11", is_deleted=false):
    //   f1: 00 (branch 0) 02 (zigzag 1)
    //   f2: 00 08 (len 4) 61 73 64 66
    //   f3: 02 (branch 1 = null)
    //   ref_key: 00 54 (zigzag 42)
    //   row_key: 00 04 (len 2) 31 31
    //   is_deleted: 00 00 (false)
    val df = Seq((1L, "asdf", 42L, "11", "insert"))
      .toDF("f1", "f2", "seqno", "row_key", "op")
      .withColumn("f3", lit(null).cast("double"))
    val bytes = AvroCodec.encode(df, payload, "t1", "graft").head()
    assert(bytes.map("%02x".format(_)).mkString ==
      "0002" + "00086173646602" + "0054" + "00043131" + "0000")
  }

  test("avro schema has the 3 appended metadata fields") {
    val sch = AvroCodec.avroSchema(payload, "t1", "graft")
    val names = sch.getFields.toArray.map(_.asInstanceOf[org.apache.avro.Schema.Field].name()).toSeq
    assert(names == Seq("f1", "f2", "f3", "ref_key", "row_key", "is_deleted"))
  }

  test("golden schema JSON: nullable unions, namespace, metadata trio") {
    // the reference emits record schemas whose every field is a
    // [type, "null"] union with default null
    // (/root/reference/schema/mysql_avro_schema_converter.go:106-130)
    val json = AvroCodec.avroSchema(StructType(Seq(
      StructField("id", LongType))), "t1", "graft").toString
    assert(json ==
      """{"type":"record","name":"t1","namespace":"graft","fields":[""" +
      """{"name":"id","type":["long","null"],"default":null},""" +
      """{"name":"ref_key","type":["long","null"],"default":null},""" +
      """{"name":"row_key","type":["bytes","null"],"default":null},""" +
      """{"name":"is_deleted","type":["boolean","null"],"default":null}]}""")
  }

  test("delete events keep primary-key payload columns when keyCols set") {
    // fillAvroKey without fillAvroFields (encoder/avro.go:326-359)
    val df = Seq((7L, "gone", 1.5, 11L, "7", "delete"))
      .toDF("f1", "f2", "f3", "seqno", "row_key", "op")
    val bytes = AvroCodec.encode(df, payload, "t1", "graft", keyCols = Seq("f1")).head()
    val rec = AvroCodec.decode(bytes, AvroCodec.avroSchema(payload, "t1", "graft"))
    assert(rec.get("f1") == 7L)      // key survives
    assert(rec.get("f2") == null)    // non-key nulled
    assert(rec.get("f3") == null)
    assert(rec.get("is_deleted") == true)
  }

  test("zero timestamp encodes as null (Go zero-time sentinel)") {
    // encoder/avro.go:149-155: v.IsZero() -> nil
    val ts = StructType(Seq(StructField("t", TimestampType)))
    val df = Seq(
      (new java.sql.Timestamp(0L), 1L, "1", "insert"),
      (new java.sql.Timestamp(86400000L), 2L, "2", "insert"))
      .toDF("t", "seqno", "row_key", "op")
    val sch = AvroCodec.avroSchema(ts, "t1", "graft")
    val recs = AvroCodec.encode(df, ts, "t1", "graft").collect()
      .map(AvroCodec.decode(_, sch)).sortBy(_.get("ref_key").asInstanceOf[Long])
    assert(recs(0).get("t") == null)
    assert(recs(1).get("t") == 86400000L)
  }

  test("short/byte payload columns widen to the Avro INT wire type") {
    val st = StructType(Seq(StructField("sh", ShortType), StructField("by", ByteType)))
    val df = Seq((3.toShort, 5.toByte, 1L, "1", "insert"))
      .toDF("sh", "by", "seqno", "row_key", "op")
    val back = AvroCodec.decodeRows(
      AvroCodec.encode(df, st, "t1", "graft"), st, "t1", "graft").head()
    assert(back.getInt(0) == 3 && back.getInt(1) == 5)
  }

  test("encode rejects keyCols not present in the payload schema") {
    val df = Seq((1L, "a", 2.5, 10L, "1", "insert"))
      .toDF("f1", "f2", "f3", "seqno", "row_key", "op")
    val err = intercept[IllegalArgumentException] {
      AvroCodec.encode(df, payload, "t1", "graft", keyCols = Seq("f1_typo"))
    }
    assert(err.getMessage.contains("f1_typo"))
  }

  test("decodeRows: distributed wire round-trip with typed columns") {
    val df = Seq(
      (1L, "a", 2.5, 10L, "1", "insert"),
      (2L, "b", 3.5, 20L, "2", "delete"))
      .toDF("f1", "f2", "f3", "seqno", "row_key", "op")
    val bytes = AvroCodec.encode(df, payload, "t1", "graft", keyCols = Seq("f1"))
    val back = AvroCodec.decodeRows(bytes, payload, "t1", "graft")
      .orderBy("ref_key").collect()
    assert(back(0).getLong(0) == 1L && back(0).getString(1) == "a" &&
      back(0).getDouble(2) == 2.5 && back(0).getLong(3) == 10L &&
      back(0).getString(4) == "1" && !back(0).getBoolean(5))
    assert(back(1).getLong(0) == 2L && back(1).isNullAt(1) &&
      back(1).isNullAt(2) && back(1).getBoolean(5))
  }
}
