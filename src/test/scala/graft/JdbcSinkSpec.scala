package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.encode.SqlDml
import graft.pipes.JdbcSink

/** End-to-end SQL sink test against embedded Derby (ansisql dialect —
  * double-quoted identifiers, no MySQL upsert extension).
  */
class JdbcSinkSpec extends SparkSuite {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { c.createStatement().executeUpdate(sql) } finally c.close()
  }

  test("generated INSERT/DELETE statements execute against a real database") {
    exec("""CREATE TABLE "sink_t1" ("seqno" BIGINT NOT NULL, "f1" BIGINT, "f4" VARCHAR(100))""")

    val rows = Seq((1L, "a"), (2L, "it's"), (3L, null)).toDF("f1", "f4")
    val stmts = rows.select(SqlDml.insertStmt("sink_t1", col("f1") * 10,
      Seq(("f1", col("f1"), false), ("f4", col("f4"), true))).as("stmt"))
    JdbcSink.executeBatch(stmts, "stmt", url)

    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "\"sink_t1\"").load()
    assert(back.count() == 3)
    val got = back.collect().map(r =>
      (r.getAs[Long]("seqno"), r.getAs[Long]("f1"), r.getAs[String]("f4"))).toSet
    assert(got == Set((10L, 1L, "a"), (20L, 2L, "it's"), (30L, 3L, null)))

    // delete half of an update pair removes by (seqno, pk)
    val del = Seq(Tuple1(2L)).toDF("f1")
      .select(SqlDml.deleteStmt("sink_t1", lit(20L), Seq(("f1", col("f1"), false))).as("stmt"))
    JdbcSink.executeBatch(del, "stmt", url)
    assert(spark.read.format("jdbc").option("url", url)
      .option("dbtable", "\"sink_t1\"").load().count() == 2)
  }

  test("a decimal column rides the DML round trip as its float64 edge value") {
    exec("""CREATE TABLE "sink_dec" ("seqno" BIGINT NOT NULL, "id" BIGINT, "amt" DOUBLE)""")
    // 17 significant digits: double cannot carry them — the statement must
    // contain the float64 approximation, the exact decimal must not leak
    val exact = "123456789012345.67"
    val rows = Seq((1L, new java.math.BigDecimal(exact))).toDF("id", "amt")
      .select(col("id"),
        col("amt").cast(org.apache.spark.sql.types.DecimalType(20, 2)).as("amt"))
    val stmts = rows.select(SqlDml.insertStmt("sink_dec", col("id"),
      Seq(("id", col("id"), false), ("amt", col("amt"), false))).as("stmt"))
    assert(!stmts.head().getString(0).contains(exact))
    JdbcSink.executeBatch(stmts, "stmt", url)
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "\"sink_dec\"").load()
      .head()
    assert(back.getAs[Double]("amt") == new java.math.BigDecimal(exact).doubleValue())
  }

  test("MERGE idempotent upsert: last-writer-wins by seqno, executed for real") {
    exec("""CREATE TABLE "tgt" ("seqno" BIGINT NOT NULL, "f1" BIGINT, "v" VARCHAR(20))""")
    exec("""CREATE TABLE "stage" ("seqno" BIGINT NOT NULL, "f1" BIGINT, "v" VARCHAR(20))""")
    val merge = SqlDml.mergeIdempotentStmt("tgt", "stage", Seq("f1", "v"), Seq("f1"))

    def stageAndMerge(seqno: Long, v: String): Unit = {
      exec("""DELETE FROM "stage"""")
      exec(s"""INSERT INTO "stage" VALUES ($seqno, 1, '$v')""")
      exec(merge)
    }
    def current(): (Long, String) = {
      val c = DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery("""SELECT "seqno", "v" FROM "tgt"""")
        rs.next(); (rs.getLong(1), rs.getString(2))
      } finally c.close()
    }

    stageAndMerge(10, "first")
    assert(current() == ((10L, "first"))) // NOT MATCHED -> insert
    stageAndMerge(5, "stale")
    assert(current() == ((10L, "first"))) // lower seqno loses
    stageAndMerge(20, "newer")
    assert(current() == ((20L, "newer"))) // higher seqno wins
  }

  test("streaming micro-batches land transactionally") {
    exec("""CREATE TABLE "sink_t2" ("seqno" BIGINT NOT NULL, "v" VARCHAR(50))""")
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    stream.addData((1L, "x"), (2L, "y"))
    val stmts = stream.toDF().toDF("k", "v")
      .select(SqlDml.insertStmt("sink_t2", col("k"),
        Seq(("v", col("v"), true))).as("stmt"))
    val q = JdbcSink.streamTo(stmts, "stmt", url,
      java.nio.file.Files.createTempDirectory("graft-jdbc-ckpt").toString)
    q.awaitTermination()
    assert(spark.read.format("jdbc").option("url", url)
      .option("dbtable", "\"sink_t2\"").load().count() == 2)
  }
}
