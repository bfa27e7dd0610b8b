package graft

import org.apache.spark.sql.types._

import graft.core.OutputTypeLint

/** Contract of the gated-output type lint (r15 verdict task 2): the
  * driver's correctness harness is only proven byte-equivalent to the
  * local oracle tool on a fixed set of output types; anything else must
  * fail Verify loudly instead of reaching the driver gate untested.
  */
class OutputTypeLintSpec extends SparkSuite {

  private def schema(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  test("proven types pass") {
    val s = schema("a" -> LongType, "b" -> IntegerType, "c" -> StringType,
      "d" -> DateType, "e" -> BinaryType, "f" -> BooleanType,
      "g" -> DoubleType, "h" -> ShortType, "i" -> ByteType)
    assert(OutputTypeLint.violations(s).isEmpty)
    OutputTypeLint.check("q_ok", s) // must not throw
  }

  test("DECIMAL is rejected — the r15 regression class") {
    val s = schema("event_type" -> StringType,
      "ks_num" -> DecimalType(38, 0))
    assert(OutputTypeLint.violations(s) == Seq("ks_num: DECIMAL(38,0)"))
    val e = intercept[IllegalStateException] {
      OutputTypeLint.check("q_ks_drift", s)
    }
    assert(e.getMessage.contains("q_ks_drift"))
    assert(e.getMessage.contains("ks_num"))
  }

  test("TIMESTAMP, FLOAT, ARRAY, MAP, STRUCT are rejected") {
    val bad = Seq[DataType](TimestampType, FloatType,
      ArrayType(LongType), MapType(StringType, LongType),
      StructType(Seq(StructField("x", LongType))))
    for (t <- bad)
      assert(OutputTypeLint.violations(schema("c" -> t)).nonEmpty, t.sql)
  }

  test("the shipped KS rows now emit lint-clean schemas") {
    for (q <- Seq("q_ks_drift", "q_stream_ks")) {
      // schema only — ksDrift is lazy; streamKs would run the stream, so
      // pin the shared fold's schema via the batch path both rows use
      val df = QueriesQuality.ksDrift(spark, sf0001)
      OutputTypeLint.check(q, df.schema)
      assert(df.schema("ks_num").dataType == StringType)
    }
  }
}
