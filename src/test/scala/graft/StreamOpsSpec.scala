package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.Tables
import graft.stream.StreamOps

/** Streaming/batch parity: the same operator definition over the same
  * fixture must produce identical results through the streaming engine
  * (complete/append modes) and the batch engine.
  */
class StreamOpsSpec extends SparkSuite {

  private def replayEvents(): (String, org.apache.spark.sql.DataFrame) = {
    val src = Files.createTempDirectory("graft-stream-src").toString
    Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema("event_id bigint, ts timestamp, user_id bigint, event_type string, value double")
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
    (src, stream)
  }

  test("streaming windowed agg equals batch windowed agg") {
    val (_, stream) = replayEvents()
    val q = StreamOps.windowedCounts(stream, "ts", "1 hour", "10 minutes", Seq("event_type"))
      .writeStream.format("memory").queryName("win_out").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streaming = spark.table("win_out")
    val batch = StreamOps.windowedCounts(
      Tables.events(spark, sf0001), "ts", "1 hour", "10 minutes", Seq("event_type"))
    assert(streaming.count() > 0)
    assert(streaming.exceptAll(batch).isEmpty && batch.exceptAll(streaming).isEmpty)
  }

  test("streaming session windows equal batch session windows") {
    val (_, stream) = replayEvents()
    val q = StreamOps.sessionWindows(stream, "ts", "user_id", "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sess_out").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streaming = spark.table("sess_out")
    val batch = StreamOps.sessionWindows(
      Tables.events(spark, sf0001), "ts", "user_id", "30 minutes", "10 minutes")
    assert(streaming.count() > 0)
    assert(streaming.exceptAll(batch).isEmpty && batch.exceptAll(streaming).isEmpty)
  }
}
