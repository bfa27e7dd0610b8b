package graft

import org.apache.spark.sql.functions._

import graft.core.RowKey
import graft.functions.RowKeyExpression

class RowKeyExpressionSpec extends SparkSuite {
  import spark.implicits._

  test("native expression matches the composed-builtins row key on fixtures") {
    RowKeyExpression.register(spark)
    val li = graft.core.Tables.lineitem(spark, sf0001)
    val both = li.select(
      RowKey.rowKey(Seq(col("l_orderkey"), col("l_linenumber"))).as("composed"),
      expr("graft_row_key(cast(l_orderkey as string), cast(l_linenumber as string))").as("native"))
    assert(both.filter(col("composed") =!= col("native")).count() == 0)
  }

  test("golden value and null propagation") {
    RowKeyExpression.register(spark)
    val r = Seq((1L, 22L)).toDF("f1", "f2")
      .selectExpr("graft_row_key(cast(f1 as string), cast(f2 as string)) as rk")
    assert(r.head().getString(0) == "11222")
    val n = Seq((Some(1L), Option.empty[Long])).toDF("f1", "f2")
      .selectExpr("graft_row_key(cast(f1 as string), cast(f2 as string)) as rk")
    assert(n.head().isNullAt(0))
  }

  test("works through whole-stage codegen (plan contains no fallback)") {
    RowKeyExpression.register(spark)
    val df = spark.range(1000).selectExpr("graft_row_key(cast(id as string)) as rk")
    // executes via generated code path; spot-check values
    val rows = df.collect()
    assert(rows(7).getString(0) == "17")
    assert(rows(123).getString(0) == "3123")
  }
}
