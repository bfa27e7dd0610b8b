package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.metrics.{Metrics, MetricsListeners}
import graft.state.StateStore
import graft.state.StateStore.Registration
import graft.stream.{ClusterLimiter, Coordinator, Streamer}

/** Integrated worker-loop proof (O1 + O11 + metrics): a full registration
  * processed through the Coordinator inside a cluster-limiter slot with
  * the metrics listeners installed — manifests written, state synced,
  * counters populated from Spark's own instrumentation.
  */
class CoordinatorSpec extends SparkSuite {

  private def eventually[A](timeoutMs: Long = 20000)(f: => A): A = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var last: Throwable = null
    while (System.currentTimeMillis() < deadline) {
      try return f
      catch { case t: Throwable => last = t; Thread.sleep(200) }
    }
    throw last
  }

  test("coordinator runs a registration end-to-end under limiter + metrics") {
    val listeners = MetricsListeners.install(spark)
    try {
      Metrics.reset()
      val work = Files.createTempDirectory("graft-coord").toString
      val state = new StateStore(s"$work/state")
      val reg = Registration("svc", "cl1", "fixtures", "events_state", "mysql", "file", "json")
      state.register(reg)

      val fenceMs = 1705276800000L
      val ev = Tables.events(spark, sf0001)
        .select(col("user_id"), col("value"), unix_millis(col("ts")).as("tms"), col("event_id"))
      val snapshot = Streamer.resolveLatest(
          ev.filter(col("tms") < fenceMs)
            .withColumn("op", lit("insert")).withColumn("seqno", col("event_id")),
          Seq("user_id"), Seq("seqno"))
        .select(col("user_id"), col("value"))

      val logDir = s"$work/cdc-in"
      Tables.events(spark, sf0001).filter(unix_millis(col("ts")) >= fenceMs)
        .withColumn("op",
          when(col("event_type") === "signup", "insert")
            .when(col("event_type") === "error", "delete").otherwise("update"))
        .select(col("op"), col("user_id"), col("value"), col("event_id"))
        .write.mode("overwrite").parquet(logDir)
      val changelog = spark.readStream
        .schema("op string, user_id bigint, value double, event_id bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(logDir)

      val limiter = new ClusterLimiter(1)
      val coordinator = new Coordinator(spark, state, s"$work/out")
      val manifests = limiter.withSlot(spark, reg.cluster) {
        coordinator.runTask(reg, snapshot, changelog,
          pkCols = Seq("user_id"), orderCols = Seq("event_id"),
          checkpoint = s"$work/ckpt")
      }

      // pipeline output: manifests on disk, registration synced
      assert(manifests.nonEmpty && manifests.forall(_.hash.length == 64))
      assert(state.listRegistrations.head.state == "synced")
      val outBase = s"$work/out/cl1.fixtures.events_state.v0"
      val written = spark.read.json(s"$outBase/snapshot").count() +
        spark.read.json(s"$outBase/log/*").count()
      assert(written == manifests.map(_.numRecs).sum)

      // metrics populated by the run itself
      eventually() {
        val snap = Metrics.snapshot()
        assert(snap("snapshot_events_written") >= written, snap)
        assert(snap("streamer_events_read") > 0L, snap)
        assert(snap("streamer_batches") >= 1L, snap)
      }
      assert(limiter.running(reg.cluster) == 0)
    } finally MetricsListeners.uninstall(spark, listeners)
  }
}
