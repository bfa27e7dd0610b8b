package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.metrics.{Metrics, MetricsListeners}

class MetricsSpec extends SparkSuite {
  import spark.implicits._

  private def eventually[A](timeoutMs: Long = 20000)(f: => A): A = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var last: Throwable = null
    while (System.currentTimeMillis() < deadline) {
      try return f
      catch { case t: Throwable => last = t; Thread.sleep(200) }
    }
    throw last
  }

  test("counter/timer registry and scoped names") {
    Metrics.reset()
    val s = Metrics.scope("pipe1").subScope("kafka")
    s.counter("file_pipe_bytes_written").update(100)
    s.counter("file_pipe_bytes_written").update(23)
    assert(Metrics.snapshot()("pipe1.kafka.file_pipe_bytes_written") == 123L)
    val t = Metrics.timer("state_sync_duration")
    t.record(5); t.record(11)
    val snap = Metrics.snapshot()
    assert(snap("state_sync_duration.count") == 2L)
    assert(snap("state_sync_duration.total_ms") == 16L)
    assert(snap("state_sync_duration.max_ms") == 11L)
  }

  test("batch pipeline feeds the snapshot counter family from task metrics") {
    val listeners = MetricsListeners.install(spark)
    try {
      Metrics.reset()
      val out = Files.createTempDirectory("graft-metrics-out").toString
      spark.range(0, 5000).selectExpr("id", "id % 7 AS k")
        .write.mode("overwrite").parquet(out)
      val n = spark.read.parquet(out).count()
      assert(n == 5000)
      eventually() {
        val snap = Metrics.snapshot()
        // the write job counted 5000 records out; the read counted them in
        assert(snap("snapshot_events_written") == 5000L, snap)
        assert(snap("snapshot_events_read") >= 5000L, snap)
        assert(snap("snapshot_bytes_written") > 0L, snap)
        assert(snap("snapshot_read_latency.count") > 0L, snap)
      }
    } finally MetricsListeners.uninstall(spark, listeners)
  }

  test("streaming query feeds the streamer counter family per micro-batch") {
    val listeners = MetricsListeners.install(spark)
    try {
      Metrics.reset()
      implicit val sql = spark.sqlContext
      val input = MemoryStream[Long]
      input.addData(1L to 400L)
      val q = input.toDF().writeStream.format("memory").queryName("metrics_sink")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      eventually() {
        val snap = Metrics.snapshot()
        assert(snap("streamer_events_read") == 400L, snap)
        assert(snap("streamer_events_written") == 400L, snap)
        assert(snap("streamer_batches") >= 1L, snap)
        assert(snap("streamer_produce_latency.count") >= 1L, snap)
        assert(snap("num_streamer_workers") == 0L, snap) // started then terminated
      }
    } finally MetricsListeners.uninstall(spark, listeners)
  }
}
