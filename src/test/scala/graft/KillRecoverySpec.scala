package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Mid-micro-batch crash-recovery gates for the streaming-state family
  * (r13 verdict task 2).
  *
  * CoordinatorSoakSpec kills a worker BETWEEN jobs; these tests kill a
  * stream MID-micro-batch — after the batch's offsets are in the offset
  * log (and, for stateful plans, after the crashed attempt may already
  * have committed its state-store version) but before the commit log
  * records the batch — and prove that resuming from the checkpoint
  * produces output identical to an uninterrupted run. That is exactly
  * the contract RocksDB-state + checkpointing claims to survive, and the
  * reference's own recovery discipline: offsets persist only after the
  * buffer commit (`/root/reference/streamer/buffer.go:199-204`), and the
  * file sink stages then atomically publishes
  * (`/root/reference/pipe/file.go:545-572`).
  *
  * Crash mechanics: the foreachBatch sink writes only HALF of the target
  * micro-batch's rows and then throws (one-shot). That models the worst
  * crash point — partial sink output AND (for stateful plans) a state
  * version committed by the failed attempt. Recovery must (a) re-deliver
  * the SAME batch (offset log, not commit log, decides), (b) reload the
  * state as of the END OF THE PRIOR batch (not the crashed attempt's
  * version), and (c) heal the partial output (per-batch overwrite dirs —
  * the idempotent-sink discipline; for WAP, the publish fence makes the
  * replayed batch a no-op instead).
  *
  * Both runs execute the IDENTICAL catalog plan builders
  * ([[QueriesCdc.streamJoinPlan]], [[QueriesCdc.streamDedupPlan]],
  * [[QueriesLayout.wapBatchOrFail]]) — this suite adds only the sink
  * harness and the crash. Default leg runs at sf0.1; set
  * GRAFT_KILL_SF1=1 (with the ScaleUp fixture at /tmp/graft_sf1) to run
  * the 10x leg the round gate records.
  */
class KillRecoverySpec extends SparkSuite with CrashSinkHarness {

  private val sfDir = "/root/testdata/sf0.1"
  private val sf1Dir = "/tmp/graft_sf1"
  private def sf1Enabled: Boolean =
    sys.env.get("GRAFT_KILL_SF1").contains("1") &&
      new java.io.File(sf1Dir, "events.parquet").exists()

  private def killRecoverCase(tag: String, dir: String,
      statePartitions: Int, crashBatch: Long)(plan: => DataFrame): Unit = {
    QueriesCdc.withStatePartitions(spark, statePartitions) {
      QueriesCdc.withRocksDbState(spark) {
        val control = image(runWithSink(spark, plan,
          freshDir(s"$tag-ctl-out"), freshDir(s"$tag-ctl-ckpt"), None))
        val recovered = image(runWithSink(spark, plan,
          freshDir(s"$tag-crash-out"), freshDir(s"$tag-crash-ckpt"),
          Some(crashBatch)))
        assert(control.nonEmpty, s"$tag: control run produced no rows")
        assert(recovered == control,
          s"$tag: post-crash resume diverged from the uninterrupted run " +
            s"(${recovered.size} vs ${control.size} rows)")
      }
    }
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
  }

  // ------------------------------------------------------------ join

  /** Crash during micro-batch 1 of 2: batch 0's join state (views
    * awaiting purchases) must survive into the re-delivered batch 1 —
    * lost state drops cross-batch pairs, doubled state cannot happen
    * (the re-run overwrites the crashed attempt's version).
    */
  private def joinCase(dir: String): Unit = {
    val src = QueriesCdc.streamJoinSource(spark, dir)
    killRecoverCase("sjoin", dir, statePartitions = 4, crashBatch = 1L) {
      QueriesCdc.streamJoinPlan(spark, src)
    }
  }

  test("q_stream_join: mid-batch crash + resume matches uninterrupted run (sf0.1)") {
    joinCase(sfDir)
  }

  test("q_stream_join: mid-batch crash + resume at sf1 (10x)") {
    assume(sf1Enabled, "GRAFT_KILL_SF1=1 with /tmp/graft_sf1 required")
    joinCase(sf1Dir)
  }

  // ------------------------------------------------------------ dedup

  /** Crash during micro-batch 1 of 3: users first seen in batch 0 must
    * stay suppressed after recovery (state restored), and users first
    * seen in the crashed batch must emit EXACTLY once (the re-run, not
    * the crashed attempt, decides).
    */
  private def dedupCase(dir: String): Unit = {
    val src = freshDir("sdedup-src")
    graft.core.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        round(col("value") * 100).cast("long").as("value_cents"))
      .repartition(3)
      .write.mode("overwrite").parquet(src)
    killRecoverCase("sdedup", dir, statePartitions = 8, crashBatch = 1L) {
      QueriesCdc.streamDedupPlan(spark, src, maxFilesPerTrigger = Some(1))
    }
  }

  test("q_stream_dedup: mid-batch crash + resume matches uninterrupted run (sf0.1)") {
    dedupCase(sfDir)
  }

  test("q_stream_dedup: mid-batch crash + resume at sf1 (10x)") {
    assume(sf1Enabled, "GRAFT_KILL_SF1=1 with /tmp/graft_sf1 required")
    dedupCase(sf1Dir)
  }

  // ------------------------------------------------------------ WAP

  /** The WAP fence leg: crash AFTER batch 2 published its version but
    * before the checkpoint committed the batch. The resume re-delivers
    * batch 2; the fence must turn the replay into a no-op (no duplicate
    * version content) — q_stream_wap's exactly-once claim under the
    * exact crash window it exists for.
    */
  private def wapCase(dir: String): Unit = {
    def run(crash: Boolean): Seq[String] = {
      val base = freshDir(if (crash) "swap-crash" else "swap-ctl")
      val src = s"$base/src"
      graft.core.Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"),
          round(col("value") * 100).cast("long").as("cents"))
        .repartition(4).write.mode("overwrite").parquet(src)
      val ckpt = freshDir(if (crash) "swap-crash-ckpt" else "swap-ctl-ckpt")
      val armed = new java.util.concurrent.atomic.AtomicBoolean(crash)
      def drain(): Unit =
        spark.readStream.schema("event_id bigint, user_id bigint, cents bigint")
          .option("maxFilesPerTrigger", "1").parquet(src)
          .writeStream
          .foreachBatch { (b: DataFrame, id: Long) =>
            QueriesLayout.wapBatchOrFail(spark, b, id, base, "event_id", "cents")
            if (id == 2L && armed.getAndSet(false))
              throw new RuntimeException("injected crash after publish")
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start().awaitTermination()
      if (crash) {
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](drain())
        assert(e.getMessage.contains("injected crash") ||
          Option(e.getCause).exists(_.getMessage.contains("injected crash")))
        // v2 is already published; the resume re-delivers batch 2 and the
        // fence must skip it
        assert(new java.io.File(s"$base/v2", "_PUBLISHED").isFile,
          "crash was injected after publish; v2 must carry its marker")
        drain()
      } else drain()
      val agg = spark.read.parquet(QueriesLayout.publishedVersions(base): _*)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("cents"),
          min(col("event_id")).as("first_event"), max(col("event_id")).as("last_event"))
      image(agg)
    }
    val control = run(crash = false)
    val recovered = run(crash = true)
    assert(control.nonEmpty, "wap control run produced no rows")
    assert(recovered == control,
      s"wap: post-crash resume diverged (${recovered.size} vs ${control.size} rows)")
  }

  test("q_stream_wap: crash between publish and checkpoint commit; fence makes the replay a no-op (sf0.1)") {
    wapCase(sfDir)
  }

  test("q_stream_wap: publish/commit crash window at sf1 (10x)") {
    assume(sf1Enabled, "GRAFT_KILL_SF1=1 with /tmp/graft_sf1 required")
    wapCase(sf1Dir)
  }

  // --------------------------------------------- delta-merge monitors

  /** The stateless delta-merge family (q_stream_ks, q_stream_hitters):
    * their exactly-once story is NOT a state store but the
    * per-batchId-overwrite sink — a crashed batch leaves a PARTIAL
    * delta directory, and the resume's overwrite of that same directory
    * must heal it so the merged statistic still equals the batch
    * formula. The crash here writes HALF the delta rows then dies —
    * the exact torn-write the overwrite discipline exists for.
    */
  private def ksDeltaCase(dir: String): Unit = {
    val src = freshDir("sks-src")
    graft.core.Tables.events(spark, dir).filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id"), col("value"))
      .repartition(3).write.mode("overwrite").parquet(src)
    val out = freshDir("sks-out")
    val ckpt = freshDir("sks-ckpt")
    val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
    def drain(): Unit =
      spark.readStream.schema("event_type string, user_id bigint, value double")
        .option("maxFilesPerTrigger", "1").parquet(src)
        .writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          val delta = QueriesQuality.cohortHistogram(b)
          if (id == 1L && armed.getAndSet(false)) {
            delta.limit((delta.count() / 2).toInt)
              .write.mode("overwrite").parquet(s"$out/b$id")
            throw new RuntimeException("injected crash mid-batch 1")
          }
          delta.write.mode("overwrite").parquet(s"$out/b$id")
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](drain())
    assert(e.getMessage.contains("injected crash") ||
      Option(e.getCause).exists(_.getMessage.contains("injected crash")))
    drain()
    val merged = image(QueriesQuality.ksMergeDeltas(spark, out))
    val batch = image(QueriesQuality.ksDrift(spark, dir))
    assert(batch.nonEmpty && merged == batch,
      "healed delta merge must equal the batch KS formula")
  }

  test("q_stream_ks: torn delta dir healed by the per-batch overwrite (sf0.1)") {
    ksDeltaCase(sfDir)
  }

  test("q_stream_ks: torn-delta crash window at sf1 (10x)") {
    assume(sf1Enabled, "GRAFT_KILL_SF1=1 with /tmp/graft_sf1 required")
    ksDeltaCase(sf1Dir)
  }

  /** Same torn-write crash for the CMS monitor — the crash lands after
    * the cells delta wrote PARTIALLY and before the terms delta wrote at
    * all (both halves of the batch's delta must heal together).
    */
  private def hittersDeltaCase(dir: String): Unit = {
    val src = freshDir("shh-src")
    graft.core.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .repartition(3).write.mode("overwrite").parquet(src)
    val out = freshDir("shh-out")
    val ckpt = freshDir("shh-ckpt")
    val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
    def drain(): Unit =
      spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1").parquet(src)
        .writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          val terms = b.select(explode(split(col("text"), " ")).as("term"))
            .filter(col("term") =!= "")
          val cells = QueriesExtra.cmsCells(terms)
          if (id == 1L && armed.getAndSet(false)) {
            cells.limit((cells.count() / 2).toInt)
              .write.mode("overwrite").parquet(s"$out/cells/b$id")
            throw new RuntimeException("injected crash mid-batch 1")
          }
          cells.write.mode("overwrite").parquet(s"$out/cells/b$id")
          terms.groupBy(col("term")).agg(count(lit(1)).as("exact_n"))
            .write.mode("overwrite").parquet(s"$out/terms/b$id")
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](drain())
    assert(e.getMessage.contains("injected crash") ||
      Option(e.getCause).exists(_.getMessage.contains("injected crash")))
    drain()
    val merged = image(QueriesExtra.hittersMergeDeltas(spark, out))
    val batch = image(QueriesExtra.heavyHitters(spark, dir))
    assert(batch.nonEmpty && merged == batch,
      "healed delta merge must equal the batch CMS report")
  }

  test("q_stream_hitters: torn cells delta healed; terms delta re-delivered (sf0.1)") {
    hittersDeltaCase(sfDir)
  }

  test("q_stream_hitters: torn-delta crash window at sf1 (10x)") {
    assume(sf1Enabled && new java.io.File(sf1Dir, "documents.parquet").exists(),
      "GRAFT_KILL_SF1=1 with /tmp/graft_sf1 required")
    hittersDeltaCase(sf1Dir)
  }
}
