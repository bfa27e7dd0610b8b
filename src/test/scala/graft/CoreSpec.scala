package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{RowKey, Schema}
import graft.changelog.Ddl

class RowKeySpec extends SparkSuite {
  import spark.implicits._

  test("length-prefixed row key matches reference GetRowKey shape") {
    // FIXTURES.md §4: PK (1, 22) -> "1" + "1" + "2" + "22" = "11222"
    val df = Seq((1L, 22L)).toDF("f1", "f2")
      .select(RowKey.rowKey(Seq(col("f1"), col("f2"))))
    assert(df.head().getString(0) == "11222")
  }

  test("row key single column") {
    val df = Seq(Tuple1(12345L)).toDF("f1").select(RowKey.rowKey(Seq(col("f1"))))
    assert(df.head().getString(0) == "512345")
  }

  test("non-ASCII PK values are prefixed with UTF-8 BYTE length (Go len())") {
    // 'é' is 1 char but 2 UTF-8 bytes — reference encoder/encoder.go:108
    val df = Seq(Tuple1("é")).toDF("f1").select(RowKey.rowKey(Seq(col("f1"))))
    assert(df.head().getString(0) == "2é")
    graft.functions.RowKeyExpression.register(spark)
    val native = Seq(Tuple1("café")).toDF("f1")
      .selectExpr("graft_row_key(f1) as rk")
    assert(native.head().getString(0) == "5café")
  }

  test("partition key is non-negative and stable") {
    val df = Seq(-5L, 0L, 31L, 32L, 33L).toDF("k")
      .select(RowKey.partitionKey(col("k"), 32).as("p"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(27L, 0L, 31L, 0L, 1L))
  }
}

class SchemaSpec extends SparkSuite {
  import Schema._

  // FIXTURES.md §2: the all-data-types table t2
  private val t2 = TableSchema("db1", "t2", Seq(
    ColumnSchema("f1", 1, isNullable = false, "bigint", key = "PRI"),
    ColumnSchema("f2", 2, isNullable = true, "char"),
    ColumnSchema("f4", 4, isNullable = true, "text"),
    ColumnSchema("f5", 5, isNullable = true, "timestamp"),
    ColumnSchema("f8", 8, isNullable = true, "year"),
    ColumnSchema("f10", 10, isNullable = true, "binary"),
    ColumnSchema("f12", 12, isNullable = true, "float"),
    ColumnSchema("f14", 14, isNullable = true, "decimal", numericPrecision = 10, numericScale = 0),
    ColumnSchema("f16", 16, isNullable = true, "datetime"),
    ColumnSchema("f17", 17, isNullable = true, "tinyint", columnType = "tinyint(1)"),
    ColumnSchema("f18", 18, isNullable = true, "json")))

  test("t2 maps to the documented Spark types") {
    val st = toStructType(t2)
    def dt(n: String) = st(n).dataType
    assert(dt("f1") == LongType)
    assert(dt("f2") == StringType)
    assert(dt("f5") == TimestampType)
    assert(dt("f8") == IntegerType)
    assert(dt("f10") == BinaryType)
    assert(dt("f12") == FloatType)
    assert(dt("f14") == DecimalType(10, 0)) // exact internally; double at the encoder edge
    assert(st("f14").metadata.getString("improvedType") == "decimal(10,0)")
    assert(dt("f16") == TimestampNTZType)
    assert(dt("f17") == BooleanType) // tinyint(1)
    assert(dt("f18") == StringType)
  }

  test("default carries decimal(p,s) exactly; lossy mode recovers the reference scan type") {
    val money = TableSchema("db1", "m", Seq(
      ColumnSchema("id", 1, isNullable = false, "bigint", key = "PRI"),
      ColumnSchema("amount", 2, isNullable = true, "decimal",
        numericPrecision = 12, numericScale = 2)))
    // lossy mode: the reference's float64 scan type end-to-end
    assert(toStructType(money, exactDecimals = false)("amount").dataType == DoubleType)
    // default: exact DecimalType internally, and the sink DDL keeps precision
    val exact = toStructType(money)
    assert(exact("amount").dataType == DecimalType(12, 2))
    assert(sqlType(exact("amount").dataType) == "DECIMAL(12,2)")
    // exact decimal arithmetic does not drift: classic 0.1+0.2 case
    val df = spark.sql("SELECT CAST(0.1 AS DECIMAL(12,2)) + CAST(0.2 AS DECIMAL(12,2)) AS s")
    assert(df.head().getDecimal(0).compareTo(new java.math.BigDecimal("0.30")) == 0)
  }

  test("PK columns recoverable from metadata; PK-less tables detected") {
    assert(pkColumns(toStructType(t2)) == Seq("f1"))
    assert(t2.hasPrimaryKey)
    assert(!TableSchema("d", "t", Seq(ColumnSchema("x", 1, true, "int"))).hasPrimaryKey)
  }
}

class DdlSpec extends SparkSuite {
  import Ddl._

  test("ALTER TABLE forms classify with db/table extraction") {
    assert(classify("ALTER TABLE db1.t1 ADD f2 varchar(32)") == AlterTable(Some("db1"), "t1", "ADD f2 varchar(32)"))
    assert(classify("alter table `db1`.`t1` drop column f2") == AlterTable(Some("db1"), "t1", "drop column f2"))
    assert(classify("ALTER TABLE t1 ADD COLUMN c INT") == AlterTable(None, "t1", "ADD COLUMN c INT"))
    assert(classify("ALTER IGNORE TABLE `t1` ENGINE=InnoDB") == AlterTable(None, "t1", "ENGINE=InnoDB"))
  }

  test("RENAME TABLE forms") {
    assert(classify("RENAME TABLE t1 TO t2") == RenameTable(None, "t1", "t2"))
    assert(classify("rename table `db1`.`t1` to `db1`.`t2`") == RenameTable(Some("db1"), "t1", "t2"))
  }

  test("non-DDL statements are ignored or rejected") {
    assert(classify("BEGIN") == Ignored)
    assert(classify("COMMIT") == Ignored)
    assert(classify("FLUSH LOGS") == Ignored)
    assert(classify("INSERT INTO t1 VALUES (1)") == NotDdl)
    assert(classify("SELECT * FROM t1") == NotDdl)
    assert(!isDdl("ALTERNATIVE TABLE t1")) // prefix confusion guard
  }
}

/** Pins the cliff-3 fix (SCALE.md, r15): the pre-fan-out width must take
  * the session's configured shuffle width as a floor — a width pinned to
  * the core count alone disconnects spark.sql.shuffle.partitions from
  * every fan-out-downstream stage and starves memory at 1000×.
  */
class SpreadSpec extends SparkSuite {
  import spark.implicits._

  test("byKey width follows the session shuffle width when it exceeds cores") {
    val df = (1 to 100).map(i => (i.toLong, s"t$i")).toDF("id", "t")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "64")
      assert(graft.core.Spread.byKey(df, col("id")).rdd.getNumPartitions == 64)
      // small-fixture configs (width == cores) keep the historical plan
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      assert(graft.core.Spread.byKey(df, col("id")).rdd.getNumPartitions ==
        math.max(spark.sparkContext.defaultParallelism, prev.toInt))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
