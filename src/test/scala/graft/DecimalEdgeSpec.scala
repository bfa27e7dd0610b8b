package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.encode.{AvroCodec, CommonFormatJson, MsgPackCodec}

/** SURVEY §1.2 hard-part #5: the reference reads MySQL decimals lossily
  * as float64 (`/root/reference/util/util.go:234`), so PARITY output must
  * carry the double — but nothing forces the loss to happen at the scan.
  * The internal path carries `DecimalType(p,s)` exactly; each encoder
  * casts decimal → double at the wire edge. These tests prove both
  * halves: internal arithmetic that a double-typed plan would get wrong,
  * and encoder bytes identical to a plan that read doubles from the
  * start.
  */
class DecimalEdgeSpec extends SparkSuite {
  import spark.implicits._

  // a value double cannot represent exactly: 17 significant digits
  private val cents = "123456789012345.67"
  private val df = Seq((1L, new java.math.BigDecimal(cents)))
    .toDF("id", "amount")
    .select(col("id"), col("amount").cast(DecimalType(20, 2)).as("amount"))

  test("internal decimal arithmetic is exact where double drifts") {
    val sum = df.select((col("amount") + col("amount")).as("s")).head().getDecimal(0)
    assert(sum.compareTo(new java.math.BigDecimal("246913578024691.34")) == 0)
    // the same sum through double loses the trailing digits
    val viaDouble = df.select((col("amount").cast("double") + col("amount").cast("double")).as("s"))
      .head().getDouble(0)
    assert(new java.math.BigDecimal(viaDouble).compareTo(
      new java.math.BigDecimal("246913578024691.34")) != 0)
  }

  test("CF JSON renders the decimal exactly as the reference's float64 read would") {
    def cf(c: org.apache.spark.sql.Column, dt: DataType) =
      df.select(CommonFormatJson.jsonValue(c, dt).as("j")).head().getString(0)
    val fromDecimal = cf(col("amount"), DecimalType(20, 2))
    val fromDouble = cf(col("amount").cast("double"), DoubleType)
    assert(fromDecimal == fromDouble,
      s"decimal edge-cast ($fromDecimal) must equal the lossy-scan rendering ($fromDouble)")
    // and the loss really happened at the edge: the wire value is the
    // double approximation, not the exact decimal string
    assert(fromDecimal != cents)
  }

  test("Avro bytes from a decimal plan equal bytes from a lossy double plan") {
    val stDec = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("amount", DecimalType(20, 2))))
    val stDbl = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("amount", DoubleType)))
    def bytes(in: org.apache.spark.sql.DataFrame, st: StructType) =
      AvroCodec.encode(
        in.withColumn("seqno", lit(7L))
          .withColumn("row_key", lit("k1"))
          .withColumn("op", lit("insert")),
        st, "rec", "graft.test").head()
    val fromDecimal = bytes(df, stDec)
    val fromDouble = bytes(df.withColumn("amount", col("amount").cast("double")), stDbl)
    assert(java.util.Arrays.equals(fromDecimal, fromDouble),
      "Avro wire bytes must be identical whether the loss happens at scan or edge")
  }

  test("MsgPack packs the decimal as the float64 wire value") {
    def ev(v: Any) = MsgPackCodec.encodeEvent("insert", Seq(1L), 7L, 0L,
      Some(Seq("amount" -> v)))
    val dec = ev(new java.math.BigDecimal(cents))
    val dbl = ev(new java.math.BigDecimal(cents).doubleValue())
    assert(java.util.Arrays.equals(dec, dbl))
  }

  test("SQL DML VALUES renders a decimal through the float64 edge") {
    def stmt(amount: org.apache.spark.sql.Column) = df
      .select(graft.encode.SqlDml.insertStmt("t", lit(1L),
        Seq(("id", col("id"), false), ("amount", amount, false))).as("s"))
      .head().getString(0)
    val fromDecimal = stmt(col("amount"))
    val fromDouble = stmt(col("amount").cast("double"))
    assert(fromDecimal == fromDouble,
      "statement text must match a plan that read doubles from the start")
    assert(!fromDecimal.contains(cents),
      "the exact decimal literal must not leak into the statement")
    // non-decimal rendering is untouched: longs stay integral literals
    assert(fromDecimal.contains("VALUES (1,1,"))
    // a small decimal that double represents exactly still drops the
    // trailing zero scale digit (1.10 -> 1.1), proving the double path
    val small = Seq((2L, new java.math.BigDecimal("1.10"))).toDF("id", "amount")
      .select(col("id"), col("amount").cast(DecimalType(10, 2)).as("amount"))
    val s = small.select(graft.encode.SqlDml.insertStmt("t", lit(1L),
      Seq(("amount", col("amount"), false))).as("s")).head().getString(0)
    assert(s.contains("(1,1.1)") && !s.contains("1.10"))
  }
}
