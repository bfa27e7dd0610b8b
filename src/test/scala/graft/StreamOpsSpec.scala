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

  test("retraction MV survives a stop/restart: checkpointed state folds late data") {
    // the incremental-MV aggregate (signed deltas per CDC op) stopped
    // after the first half of the changelog and restarted from the same
    // checkpoint over the full input must equal the one-shot aggregate —
    // i.e. the maintained state, not a reread, carries the first half
    val src = Files.createTempDirectory("graft-retract-src").toString
    val ckpt = Files.createTempDirectory("graft-retract-ckpt").toString
    val ev = Tables.events(spark, sf0001)
      .filter(col("event_type").isin("signup", "click", "error"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        org.apache.spark.sql.functions.round(col("value") * 100)
          .cast("long").as("cents"))
    def deltas(df: org.apache.spark.sql.DataFrame) = df.select(col("user_id"),
      when(col("event_type") === "signup", 1L)
        .when(col("event_type") === "click", 0L).otherwise(-1L).as("d_rows"),
      when(col("event_type") === "signup", col("cents"))
        .when(col("event_type") === "click", lit(1L))
        .otherwise(-col("cents")).as("d_cents"))
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("event_id bigint, user_id bigint, event_type string, cents bigint")
        .parquet(src)
      val q = deltas(stream).groupBy(col("user_id"))
        .agg(sum(col("d_rows")).as("n_live"), sum(col("d_cents")).as("net_cents"))
        .writeStream.format("memory").queryName("retract_out")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    ev.filter(col("event_id") % 2 === 0).write.mode("append").parquet(src)
    runOnce() // first half committed to the checkpoint
    ev.filter(col("event_id") % 2 === 1).write.mode("append").parquet(src)
    runOnce() // restart: only the new files replay, state folds them in
    val got = spark.table("retract_out")
    val want = deltas(ev).groupBy(col("user_id"))
      .agg(sum(col("d_rows")).as("n_live"), sum(col("d_cents")).as("net_cents"))
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming LSH near-dup equals batch first-in-bucket; hits cross batches") {
    val out = SparkEntry.queries("q_stream_neardup")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // batch recompute with the same banding machinery
    val bands = graft.analytics.Dedup.lshBandKeys(
      Tables.documents(spark, sf0001), "doc_id", col("text"), k = 8,
      numHashes = 8, rowsPerBand = 4)
    val want = bands.as("b")
      .join(bands.groupBy(col("band"), col("band_key"))
        .agg(min(col("doc_id")).as("first_doc")), Seq("band", "band_key"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("doc_id") > col("first_doc"), 1L).otherwise(0L)).as("n_hit"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == want, "streaming band state must equal batch first-in-bucket")
    // the replay is range-split by doc_id: at least one hit must involve a
    // bucket whose first occupant arrived in the earlier micro-batch
    // (otherwise the state store was never actually exercised across batches)
    val split = Tables.documents(spark, sf0001).agg(
      (max(col("doc_id")) / 2).cast("long")).collect()(0).getLong(0)
    assert(out.exists { case (id, hits) => hits > 0 && id > split },
      "no cross-batch state hit — replay split did not exercise the store")
  }

  test("streaming LSH fold: hit logic, timeout re-arm, and timed-out eviction (TestGroupState)") {
    import org.apache.spark.sql.streaming.TestGroupState
    import graft.stream.StreamingLsh.{BandRow, BandHit, foldGroup}
    // NOTE: Optional.ofNullable(null: java.lang.Long) silently unboxes to
    // Some(0) through the scala.Long type parameter — build the empty
    // case explicitly
    def fresh(timeoutMs: Long, init: Option[Long]) = TestGroupState.create[Long](
      optionalState = init.map(v => org.apache.spark.api.java.Optional.of(v))
        .getOrElse(org.apache.spark.api.java.Optional.empty[Long]()),
      timeoutConf = if (timeoutMs > 0)
        org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout
      else org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
      hasTimedOut = false)

    // empty state: first doc is no hit, later docs in the batch hit; min kept
    val s1 = fresh(3600000L, None)
    val out1 = foldGroup(Iterator(BandRow(0, "k", 12L), BandRow(0, "k", 10L)),
      s1, 3600000L).toList
    assert(out1 == List(BandHit(10L, 0, hit = false), BandHit(12L, 0, hit = true)))
    assert(s1.get == 10L && s1.isUpdated)
    // re-arm happened: a timeout is registered on every invocation
    assert(s1.getTimeoutTimestampMs.isPresent)

    // existing state: every larger doc hits, min preserved
    val s2 = fresh(0L, Some(5L))
    val out2 = foldGroup(Iterator(BandRow(1, "k", 7L)), s2, 0L).toList
    assert(out2 == List(BandHit(7L, 1, hit = true)) && s2.get == 5L)

    // timed-out invocation: state evicted, nothing emitted
    val s3 = TestGroupState.create[Long](
      optionalState = org.apache.spark.api.java.Optional.of(Long.box(5L)),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
      hasTimedOut = true)
    assert(foldGroup(Iterator.empty, s3, 3600000L).isEmpty)
    assert(s3.isRemoved)
  }
}
