package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.Schema.{ColumnSchema, TableSchema}
import graft.sources.BinlogFixture
import graft.state.StateStore
import graft.stream.{SchemaFlow, SchemaRestartLoop}

/** The automated stop → re-pull → relaunch loop around DDL: a changelog
  * with an ALTER in the middle is fully processed across two query
  * incarnations; rows after the DDL see the new schema; the failed batch
  * replays without duplicating committed rows.
  */
class SchemaRestartLoopSpec extends SparkSuite {

  private val v1 = TableSchema("db1", "t", Seq(
    ColumnSchema("k", 1, isNullable = false, "bigint", key = "PRI"),
    ColumnSchema("v", 2, isNullable = true, "varchar")))

  private val events = Seq(
    BinlogFixture.Event(0, "u1", 1, "insert", "db1", "t", 1000, null, """{"k":1,"v":"a"}"""),
    BinlogFixture.Event(1, "u1", 2, "insert", "db1", "t", 1001, null, """{"k":2,"v":"b"}"""),
    BinlogFixture.Event(2, "u1", 3, "ddl", "db1", "t", 1002, null,
      "ALTER TABLE db1.t ADD f2 int"),
    BinlogFixture.Event(3, "u1", 4, "insert", "db1", "t", 1003, null,
      """{"k":3,"v":"c","f2":30}"""))

  test("DDL mid-stream: query restarts once, new column applies after") {
    val root = Files.createTempDirectory("graft-restart-loop")
    val path = root.toString + "/binlog.jsonl"
    val ckpt = root.toString + "/ckpt"
    BinlogFixture.write(path, events)

    val state = new StateStore(root.toString + "/state")
    // (schemaVersionColumns, rowJson) per committed row, across incarnations
    val out = mutable.ArrayBuffer.empty[(Int, String)]
    var launches = 0

    val loop = new SchemaRestartLoop(repull = () => fail("no repull expected"))
    val (finalSchema, restarts) = loop.run(v1, (schema, signal) => {
      launches += 1
      val nCols = schema.columns.length
      spark.readStream.format("graft-binlog")
        .option("path", path)
        .option("maxEventsPerTrigger", "1")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("seq", "op", "payload").orderBy("seq").collect().foreach { r =>
            r.getAs[String]("op") match {
              case "ddl" =>
                SchemaFlow.onQueryEvent(state, schema, r.getAs[String]("payload"),
                  gtid = "u1:3", seqNo = r.getAs[Long]("seq")) match {
                  case SchemaFlow.SchemaChanged(next, _) => signal.schemaChanged(next)
                  case SchemaFlow.NeedsRepull(reason) => signal.needsRepull(reason)
                  case SchemaFlow.AlreadyApplied => () // replayed DDL after restart
                  case SchemaFlow.NotSchemaRelated => ()
                }
              case _ => out += ((nCols, r.getAs[String]("payload")))
            }
          }
          ()
        }.start()
    })

    assert(restarts == 1 && launches == 2)
    assert(finalSchema.columns.map(_.name) == Seq("k", "v", "f2"))
    // state store carries the new version
    assert(state.currentSchema("db1", "t").get.fieldNames.toSeq == Seq("k", "v", "f2"))
    // rows 1-2 processed under v1 (2 cols); row 3 under v2 (3 cols);
    // no duplicates despite the aborted DDL batch replaying
    assert(out.toList == List(
      (2, """{"k":1,"v":"a"}"""),
      (2, """{"k":2,"v":"b"}"""),
      (3, """{"k":3,"v":"c","f2":30}""")))
  }

  test("RENAME triggers repull path") {
    val root = Files.createTempDirectory("graft-restart-rename")
    val path = root.toString + "/binlog.jsonl"
    BinlogFixture.write(path, Seq(
      BinlogFixture.Event(0, "u1", 1, "ddl", "db1", "t", 1000, null,
        "RENAME TABLE db1.t TO db1.t_new")))
    val state = new StateStore(root.toString + "/state")
    var repulled = false
    val v2 = v1.copy(table = "t_new")
    val loop = new SchemaRestartLoop(repull = () => { repulled = true; v2 })
    val (finalSchema, restarts) = loop.run(v1, (schema, signal) => {
      spark.readStream.format("graft-binlog").option("path", path).load()
        .writeStream
        .option("checkpointLocation", root.toString + s"/ckpt-${schema.table}")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach { r =>
            if (r.getAs[String]("op") == "ddl" && schema.table == "t")
              SchemaFlow.onQueryEvent(state, schema, r.getAs[String]("payload"),
                "u1:1", 0L) match {
                case SchemaFlow.NeedsRepull(reason) => signal.needsRepull(reason)
                case other => fail(s"expected NeedsRepull, got $other")
              }
          }
          ()
        }.start()
    })
    assert(restarts == 1 && repulled)
    assert(finalSchema.table == "t_new")
  }
}
