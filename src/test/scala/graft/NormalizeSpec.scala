package graft

import org.apache.spark.sql.types._

import graft.core.Normalize

class NormalizeSpec extends SparkSuite {
  import spark.implicits._

  test("zero-dates null out with a provenance flag") {
    val df = Seq(("0000-00-00 00:00:00", 1L), ("2024-01-01 00:00:00", 2L))
      .toDF("ts", "id")
    val got = Normalize.zeroDateToNull(df, "ts").orderBy("id").collect()
    assert(got(0).isNullAt(0) && got(0).getBoolean(2))
    assert(got(1).getString(0).startsWith("2024") && !got(1).getBoolean(2))
  }

  test("castToSchema applies type fixups incl. tinyint(1) booleans") {
    val raw = Seq(("1", "7", "2024-01-02 03:04:05"), ("0", "9", "0000-00-00 00:00:00"))
      .toDF("flag", "n", "dt")
    val target = StructType(Seq(
      StructField("flag", BooleanType),
      StructField("n", LongType),
      StructField("dt", TimestampNTZType)))
    val got = Normalize.castToSchema(raw, target).orderBy("n").collect()
    assert(got(0).getBoolean(0) && got(0).getLong(1) == 7L)
    assert(got(0).getAs[java.time.LocalDateTime](2).getYear == 2024)
    assert(!got(1).getBoolean(0))
    assert(got(1).isNullAt(2)) // zero-date -> null instead of cast error
  }
}
