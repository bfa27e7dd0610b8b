package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.changelog.Changelog
import graft.encode.SqlDml
import graft.pipes.{JdbcSink, LoopbackPipe}
import graft.sources.BinlogFixture

/** The reference's BUFFERED production topology end-to-end, every stage the
  * native round-2 component:
  *
  *   binlog (GTID-offset DSv2 source) → changelog reader → Kafka-shaped
  *   buffer (loopback pipe, keyed partitioning) → streamer (DSv2 consumer)
  *   → update expansion with before-images → SQL DML → JDBC sink replica
  *
  * and the replica must converge to the source's final state — including a
  * PK-changing update, which only works if the delete half targets the
  * BEFORE image (changelog/mysql.go:530-538).
  */
class NativePipelineSpec extends SparkSuite {

  private val url = "jdbc:derby:memory:graftnative;create=true"

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { c.createStatement().executeUpdate(sql) } finally c.close()
  }

  private def replicaRows(): Set[(Long, String)] = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery("""SELECT "k", "v" FROM "replica"""")
      val out = scala.collection.mutable.Set.empty[(Long, String)]
      while (rs.next()) out += ((rs.getLong(1), rs.getString(2)))
      out.toSet
    } finally c.close()
  }

  // Row images carry their version seqno `s` (the reference's replica rows
  // are seqno-versioned; the delete half's WHERE uses the OLD version).
  private def img(s: Long, k: Long, v: String) = s"""{"s":$s,"k":$k,"v":"$v"}"""

  private val fixtureEvents = Seq(
    BinlogFixture.Event(0, "u1", 1, "insert", "db1", "t", 1000, null, img(0, 1, "a")),
    BinlogFixture.Event(1, "u1", 2, "insert", "db1", "t", 1001, null, img(1, 2, "b")),
    BinlogFixture.Event(2, "u1", 3, "update", "db1", "t", 1002, img(1, 2, "b"), img(2, 2, "b2")),
    BinlogFixture.Event(3, "u1", 4, "insert", "db1", "t", 1003, null, img(3, 3, "c")),
    // delete events carry the row being deleted as their payload
    BinlogFixture.Event(4, "u1", 5, "delete", "db1", "t", 1004, null, img(3, 3, "c")),
    // PK-changing update: k=1 becomes k=10
    BinlogFixture.Event(5, "u1", 6, "update", "db1", "t", 1005, img(0, 1, "a"), img(5, 10, "a-moved")))

  test("binlog -> kafka buffer -> streamer -> sql sink: replica converges") {
    exec("""CREATE TABLE "replica" ("seqno" BIGINT NOT NULL, "k" BIGINT, "v" VARCHAR(30))""")
    val root = Files.createTempDirectory("graft-native-pipe")
    val binlogPath = root.toString + "/binlog.jsonl"
    val topicDir = root.toString + "/topic"
    BinlogFixture.write(binlogPath, fixtureEvents)

    // ---- stage 1: changelog reader — tail the binlog, buffer into the
    // Kafka-shaped pipe keyed by row key (pipe partitioning contract)
    val s1 = spark.readStream.format("graft-binlog")
      .option("path", binlogPath)
      .option("maxEventsPerTrigger", "2") // several micro-batches
      .load()
      .writeStream
      .option("checkpointLocation", root.toString + "/ckpt-reader")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val msgs = batch.select(
          col("seq").as("ord"),
          get_json_object(col("payload"), "$.k").as("key"),
          to_json(struct(col("seq"), col("op"), col("before"), col("payload"))).as("value"))
        LoopbackPipe.produce(msgs, topicDir, numPartitions = 3, col("ord"))
        ()
      }.start()
    s1.awaitTermination()

    // ---- stage 2: streamer — consume the buffer, expand updates using
    // the BEFORE image, emit ordered DML into the replica
    val s2 = spark.readStream.format("graft-kafka")
      .option("path", topicDir)
      .option("maxOffsetsPerTrigger", "3")
      .load()
      .writeStream
      .option("checkpointLocation", root.toString + "/ckpt-streamer")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // payload/before are nested JSON STRINGS in the envelope — unwrap
        // the string first, then extract its fields
        val parsed = batch
          .withColumn("_pl", get_json_object(col("value"), "$.payload"))
          .withColumn("_bf", get_json_object(col("value"), "$.before"))
          .select(
            get_json_object(col("value"), "$.seq").cast("long").as("seq"),
            get_json_object(col("value"), "$.op").as("op"),
            get_json_object(col("_pl"), "$.s").cast("long").as("s"),
            get_json_object(col("_pl"), "$.k").cast("long").as("k"),
            get_json_object(col("_pl"), "$.v").as("v"),
            get_json_object(col("_bf"), "$.s").cast("long").as("before_s"),
            get_json_object(col("_bf"), "$.k").cast("long").as("before_k"),
            get_json_object(col("_bf"), "$.v").as("before_v"))
        val expanded = Changelog.expandUpdates(parsed,
          beforeImage = Map("s" -> "before_s", "k" -> "before_k", "v" -> "before_v"))
        val stmts = expanded
          .orderBy(col("seq"), col("half")) // source order; delete before insert
          .select(when(col("op") === "delete",
              SqlDml.deleteStmt("replica", col("s"), Seq(("k", col("k"), false))))
            .otherwise(SqlDml.insertStmt("replica", col("s"),
              Seq(("k", col("k"), false), ("v", col("v"), true)))).as("stmt"))
          .coalesce(1)
        JdbcSink.executeBatch(stmts, "stmt", url)
        ()
      }.start()
    s2.awaitTermination()

    // source final state: e2 updated k2, e4 deleted k3, e5 moved k1 -> k10
    assert(replicaRows() == Set((2L, "b2"), (10L, "a-moved")))
  }
}
