package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.changelog.Changelog
import graft.encode.SqlDml
import graft.pipes.JdbcSink

/** The reference's TestBasic shape (/root/reference/main_test.go:490-526)
  * with live databases on both ends: snapshot a source table into a
  * replica via generated DML, replay a changelog (update => delete+insert
  * pair, delete => tombstone) through the same encoders, and assert the
  * replica converges to the mutated source.
  */
class CdcRoundTripSpec extends SparkSuite {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftcdc;create=true"

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { c.createStatement().executeUpdate(sql) } finally c.close()
  }

  private def tableRows(table: String): Set[(Long, String)] = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(s"""SELECT "k", "v" FROM "$table"""")
      val out = scala.collection.mutable.Set.empty[(Long, String)]
      while (rs.next()) out += ((rs.getLong(1), rs.getString(2)))
      out.toSet
    } finally c.close()
  }

  test("snapshot + changelog replay converges replica to source") {
    exec("""CREATE TABLE "src" ("k" BIGINT NOT NULL PRIMARY KEY, "v" VARCHAR(30))""")
    exec("""CREATE TABLE "replica" ("seqno" BIGINT NOT NULL, "k" BIGINT, "v" VARCHAR(30))""")
    (1 to 5).foreach(i => exec(s"""INSERT INTO "src" VALUES ($i, 'v$i')"""))

    // ---- phase 1: snapshot through the JDBC source + DML encode + sink
    val snapshot = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "\"src\"").load()
      .select(col("k"), col("v"))
    val snapStmts = snapshot.select(SqlDml.insertStmt("replica", col("k"),
      Seq(("k", col("k"), false), ("v", col("v"), true))).as("stmt"))
    JdbcSink.executeBatch(snapStmts, "stmt", url)
    assert(tableRows("replica") == tableRows("src"))

    // ---- phase 2: changelog — update k=2, delete k=4, insert k=6
    // apply to the source directly (the "MySQL master")
    exec("""UPDATE "src" SET "v" = 'v2-new' WHERE "k" = 2""")
    exec("""DELETE FROM "src" WHERE "k" = 4""")
    exec("""INSERT INTO "src" VALUES (6, 'v6')""")

    // the same changes as a changelog stream: op + row image + old seqno
    val events = Seq(
      ("update", 2L, "v2-new", 2L, 101L), // (op, k, newV, oldSeqno, newSeqno)
      ("delete", 4L, null, 4L, 102L),
      ("insert", 6L, "v6", 0L, 103L))
      .toDF("op", "k", "v", "old_seqno", "seqno")

    val expanded = Changelog.expandUpdates(events)
    // delete halves target the replica's current row version (old seqno);
    // insert halves carry the event's new seqno
    val stmts = expanded
      .orderBy(col("seqno"), col("half")) // delete-before-insert within a pair
      .select(when(col("op") === "delete",
          SqlDml.deleteStmt("replica", col("old_seqno"), Seq(("k", col("k"), false))))
        .otherwise(SqlDml.insertStmt("replica", col("seqno"),
          Seq(("k", col("k"), false), ("v", col("v"), true)))).as("stmt"))
      .coalesce(1) // preserve statement order through the single txn
    JdbcSink.executeBatch(stmts, "stmt", url)

    // ---- convergence
    assert(tableRows("replica") == tableRows("src"))
    assert(tableRows("src") ==
      Set((1L, "v1"), (2L, "v2-new"), (3L, "v3"), (5L, "v5"), (6L, "v6")))
  }

  test("PK-changing update deletes the OLD key via before-image") {
    // Reference: delete half from Rows[i] (before image), insert half from
    // Rows[i+1] (after image) — changelog/mysql.go:530-538.
    val events = Seq(("update", 20L, "moved", 2L)).toDF("op", "k", "v", "before_k")
    val expanded = Changelog.expandUpdates(events, beforeImage = Map("k" -> "before_k"))
    assert(!expanded.columns.contains("before_k"))
    val out = expanded.select(col("op"), col("half"), col("k"))
      .as[(String, Int, Long)].collect().sortBy(_._2).toSeq
    assert(out == Seq(("delete", 0, 2L), ("insert", 1, 20L)))
  }
}
