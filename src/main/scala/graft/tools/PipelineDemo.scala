package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.state.StateStore
import graft.state.StateStore.Registration
import graft.stream.{Coordinator, Streamer}

/** End-to-end pipeline drive (dev): register a table, snapshot the
  * lineitem fixture, replay the events fixture as a changelog stream,
  * emit CF-JSON through the file pipe, print the `_DONE` manifests and the
  * resolved latest state.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val work = Files.createTempDirectory("graft-pipeline").toString
    val state = new StateStore(s"$work/state")
    val reg = Registration("svc", "cl1", "fixtures", "events_state", "mysql", "file", "json")
    state.register(reg)
    println(s"registered: ${state.listRegistrations.map(_.key).mkString(", ")}")

    val dir = "/root/testdata/sf0.001"
    // "snapshot": latest value per user before the fence
    val fenceMs = 1705276800000L
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("value"), unix_millis(col("ts")).as("tms"), col("event_id"))
    val snapshot = Streamer.resolveLatest(
        ev.filter(col("tms") < fenceMs)
          .withColumn("op", lit("insert")).withColumn("seqno", col("event_id")),
        Seq("user_id"), Seq("seqno"))
      .select(col("user_id"), col("value"))

    // "changelog": events after the fence replayed through a file stream
    val logDir = s"$work/cdc-in"
    Tables.events(spark, dir).filter(unix_millis(col("ts")) >= fenceMs)
      .withColumn("op",
        when(col("event_type") === "signup", "insert")
          .when(col("event_type") === "error", "delete").otherwise("update"))
      .select(col("op"), col("user_id"), col("value"), col("event_id"))
      .write.mode("overwrite").parquet(logDir)
    val changelog = spark.readStream
      .schema("op string, user_id bigint, value double, event_id bigint")
      .option("maxFilesPerTrigger", "1")
      .parquet(logDir)

    val coordinator = new Coordinator(spark, state, s"$work/out")
    val manifests = coordinator.runTask(reg, snapshot, changelog,
      pkCols = Seq("user_id"), orderCols = Seq("event_id"), checkpoint = s"$work/ckpt")

    println(s"manifests: ${manifests.size} files, ${manifests.map(_.numRecs).sum} records")
    println(s"synced: ${state.listRegistrations.head.state}")

    // show sink contents
    val outBase = s"$work/out/cl1.fixtures.events_state.v0"
    val snapOut = spark.read.json(s"$outBase/snapshot")
    val logOut = spark.read.json(s"$outBase/log/*")
    println(s"snapshot events: ${snapOut.count()}, log events: ${logOut.count()}")
    snapOut.show(2, 120)
    logOut.orderBy(col("SeqNo").desc).show(3, 120)
    println("DONE manifest (snapshot): " +
      new String(Files.readAllBytes(java.nio.file.Paths.get(s"$outBase/snapshot/_DONE"))).take(200))
    spark.stop()
  }
}
