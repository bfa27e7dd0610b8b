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

  test("avro schema has the 3 appended metadata fields") {
    val sch = AvroCodec.avroSchema(payload, "t1", "graft")
    val names = sch.getFields.toArray.map(_.asInstanceOf[org.apache.avro.Schema.Field].name()).toSeq
    assert(names == Seq("f1", "f2", "f3", "ref_key", "row_key", "is_deleted"))
  }
}
