package graft

import java.nio.file.Files
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, Executors, TimeUnit}

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.Schema.{ColumnSchema, TableSchema}
import graft.pipes.FileSink
import graft.sources.BinlogFixture
import graft.state.{Lease, StateStore}
import graft.state.StateStore.Registration
import graft.stream.{ClusterLimiter, Coordinator, SchemaFlow, SchemaRestartLoop, Streamer}

/** Multi-table coordinator SOAK — the reference's worker pool
  * (/root/reference/main.go:57-66) composed as one e2e instead of the
  * solo proofs each lifecycle piece already has:
  *
  *  - 8 tables (slices of `events`) registered, each processed
  *    register → snapshot → handoff → changelog by a pool of 3
  *    concurrent workers, every task lease-claimed from one shared
  *    lease DB and run inside a [[ClusterLimiter]] slot;
  *  - one MID-RUN WORKER KILL: table t3's lease is held by a worker
  *    that wrote partial garbage and died (no release, no heartbeat);
  *    a pool worker must steal it after expiry and re-run from scratch
  *    (overwrite semantics), and the zombie's later heartbeat must
  *    return false;
  *  - one MID-RUN ALTER: table t5's changelog carries a DDL event —
  *    its worker runs the real [[SchemaRestartLoop]]: the first query
  *    incarnation dies on the schema change, the second resumes from
  *    the same checkpoint under the widened schema with no duplicate
  *    rows;
  *  - per-table output is HASH-GATED: every table's `_DONE` manifest
  *    signature (numRecs, sha256) must be byte-identical to a control
  *    run by a single healthy sequential worker.
  */
class CoordinatorSoakSpec extends SparkSuite {

  private val NTables = 8
  private val FenceMs = 1705276800000L

  /** Deterministic single-file frames so content hashes are comparable
    * across the soak run and the sequential control run.
    */
  private def snapshotFor(i: Int) = {
    val ev = core.Tables.events(spark, sf0001)
      .filter(col("user_id") % NTables === i)
      .select(col("user_id"), col("value"), unix_millis(col("ts")).as("tms"), col("event_id"))
    Streamer.resolveLatest(
        ev.filter(col("tms") < FenceMs)
          .withColumn("op", lit("insert")).withColumn("seqno", col("event_id")),
        Seq("user_id"), Seq("seqno"))
      .select(col("user_id"), col("value"))
      .repartition(1).sortWithinPartitions("user_id")
  }

  private def writeChangelog(i: Int, dir: String): Unit =
    core.Tables.events(spark, sf0001)
      .filter(col("user_id") % NTables === i && unix_millis(col("ts")) >= FenceMs)
      .withColumn("op",
        when(col("event_type") === "signup", "insert")
          .when(col("event_type") === "error", "delete").otherwise("update"))
      .select(col("op"), col("user_id"), col("value"), col("event_id"))
      .repartition(1).sortWithinPartitions("event_id")
      .write.mode("overwrite").parquet(dir)

  private def changelogStream(dir: String) =
    spark.readStream
      .schema("op string, user_id bigint, value double, event_id bigint")
      .parquet(dir)

  private def signature(ms: Seq[FileSink.Manifest]): Seq[(Long, String)] =
    ms.map(m => (m.numRecs, m.hash)).sorted

  // ---- the ALTER table (t5): binlog-fixture changelog with a mid-stream
  // DDL, processed through the real restart loop; output via FileSink so
  // it hash-gates like every other table
  private val alterSchemaV1 = TableSchema("soak", "t5", Seq(
    ColumnSchema("k", 1, isNullable = false, "bigint", key = "PRI"),
    ColumnSchema("v", 2, isNullable = true, "varchar")))

  private val alterEvents = Seq(
    BinlogFixture.Event(0, "u5", 1, "insert", "soak", "t5", 1000, null, """{"k":1,"v":"a"}"""),
    BinlogFixture.Event(1, "u5", 2, "insert", "soak", "t5", 1001, null, """{"k":2,"v":"b"}"""),
    BinlogFixture.Event(2, "u5", 3, "ddl", "soak", "t5", 1002, null,
      "ALTER TABLE soak.t5 ADD f2 int"),
    BinlogFixture.Event(3, "u5", 4, "insert", "soak", "t5", 1003, null,
      """{"k":3,"v":"c","f2":30}"""))

  /** Run t5 through the restart loop; returns (manifests, restarts). */
  private def runAlterTable(work: String, state: StateStore,
      outDir: String): (Seq[FileSink.Manifest], Int) = {
    val path = s"$work/t5-binlog.jsonl"
    if (!new java.io.File(path).isFile) BinlogFixture.write(path, alterEvents)
    val ckpt = s"$work/t5-ckpt"
    val rows = mutable.ArrayBuffer.empty[(Int, String)]
    val loop = new SchemaRestartLoop(repull = () => fail("no repull expected"))
    val (_, restarts) = loop.run(alterSchemaV1, (schema, signal) => {
      val nCols = schema.columns.length
      spark.readStream.format("graft-binlog")
        .option("path", path).option("maxEventsPerTrigger", "1").load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("seq", "op", "payload").orderBy("seq").collect().foreach { r =>
            r.getAs[String]("op") match {
              case "ddl" =>
                SchemaFlow.onQueryEvent(state, schema, r.getAs[String]("payload"),
                  gtid = "u5:3", seqNo = r.getAs[Long]("seq")) match {
                  case SchemaFlow.SchemaChanged(next, _) => signal.schemaChanged(next)
                  case SchemaFlow.NeedsRepull(reason) => signal.needsRepull(reason)
                  case _ => ()
                }
              case _ => rows += ((nCols, r.getAs[String]("payload")))
            }
          }
          ()
        }.start()
    })
    // rows 1-2 under v1, row 3 under the widened schema, no duplicates
    // despite the aborted DDL batch replaying from the checkpoint
    assert(rows.toList == List(
      (2, """{"k":1,"v":"a"}"""), (2, """{"k":2,"v":"b"}"""),
      (3, """{"k":3,"v":"c","f2":30}""")), s"t5 rows: $rows")
    import spark.implicits._
    val out = rows.toSeq.toDF("n_cols", "payload")
      .repartition(1).sortWithinPartitions("payload")
      .select(to_json(struct(col("n_cols"), col("payload"))).as("value"))
    (FileSink.write(out, outDir, "json"), restarts)
  }

  test("8-table worker pool: lease-claimed concurrent lifecycle, one worker kill, one ALTER, per-table hashes match a sequential control") {
    val work = Files.createTempDirectory("graft-soak").toString
    val url = "jdbc:derby:memory:graftsoak;create=true"
    Lease.ensureTable(url)
    val state = new StateStore(s"$work/state")
    val regs = (0 until NTables).map { i =>
      val r = Registration("svc", s"cl${i % 2}", "soak", s"t$i", "mysql", "file", "json")
      state.register(r)
      Lease.register(url, s"t$i")
      r
    }
    (0 until NTables).filter(_ != 5).foreach(i => writeChangelog(i, s"$work/cdc-$i"))

    // ---------- control: one healthy worker, sequential, own output root
    val controlState = new StateStore(s"$work/control-state")
    regs.foreach(controlState.register)
    val controlCoord = new Coordinator(spark, controlState, s"$work/control-out")
    val controlSig: Map[Int, Seq[(Long, String)]] = (0 until NTables).map { i =>
      if (i == 5) {
        val (ms, _) = runAlterTable(s"$work/control", controlState, s"$work/control-out/t5")
        i -> signature(ms)
      } else {
        val ms = controlCoord.runTask(regs(i), snapshotFor(i), changelogStream(s"$work/cdc-$i"),
          pkCols = Seq("user_id"), orderCols = Seq("event_id"),
          checkpoint = s"$work/control-ckpt-$i")
        i -> signature(ms)
      }
    }.toMap

    // ---------- the kill: a zombie claims t3, writes garbage, dies
    val timeoutSec = 2L
    assert(Lease.acquireOne(url, "t3", "workerDead", timeoutSec))
    val garbageDir = s"$work/out/cl1.soak.t3.v0/snapshot"
    new java.io.File(garbageDir).mkdirs()
    Files.writeString(new java.io.File(garbageDir, "part-garbage.json").toPath,
      """{"partial":"zombie"}""")

    // ---------- the pool: 3 workers, lease-claimed tasks, limiter slots
    val coordinator = new Coordinator(spark, state, s"$work/out")
    val limiter = new ClusterLimiter(2)
    // Integer, not Int: poll() on an empty queue returns null, which a
    // primitive element type would silently unbox to 0
    val queue = new ConcurrentLinkedQueue[Integer]()
    (0 until NTables).foreach(i => queue.add(Int.box(i)))
    val manifests = new java.util.concurrent.ConcurrentHashMap[Int, Seq[FileSink.Manifest]]()
    val restartsSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val failures = new ConcurrentLinkedQueue[Throwable]()
    val pool = Executors.newFixedThreadPool(3)
    val done = new CountDownLatch(NTables)
    def worker(wid: String): Runnable = () => {
      var next: Integer = queue.poll()
      while (next != null) {
        val i = next.intValue()
        try {
          if (!Lease.acquireOne(url, s"t$i", wid, timeoutSec)) {
            // held by someone (the zombie, until expiry): back off, retry
            info(s"soak: $wid acquire-miss t$i, requeue")
            Thread.sleep(300)
            queue.add(i)
          } else {
            val ms = limiter.withSlot(spark, regs(i).cluster) {
              if (i == 5) {
                val (m, r) = runAlterTable(work, state, s"$work/out/t5")
                restartsSeen.addAndGet(r)
                state.markSynced(regs(i).key)
                m
              } else
                coordinator.runTask(regs(i), snapshotFor(i), changelogStream(s"$work/cdc-$i"),
                  pkCols = Seq("user_id"), orderCols = Seq("event_id"),
                  checkpoint = s"$work/ckpt-$i")
            }
            manifests.put(i, ms)
            Lease.release(url, s"t$i", wid)
            info(s"soak: $wid completed t$i")
            done.countDown()
          }
        } catch { case t: Throwable =>
          info(s"soak: $wid FAILED t${i}: $t")
          failures.add(t); done.countDown()
        }
        next = queue.poll()
      }
    }
    Seq("workerA", "workerB", "workerC").foreach(w => pool.execute(worker(w)))
    assert(done.await(300, TimeUnit.SECONDS), "soak timed out")
    pool.shutdown()
    assert(failures.isEmpty, s"worker failures: ${failures.toArray.mkString("; ")}")

    // every table ran, every registration synced, the ALTER restarted once
    assert(manifests.size == NTables)
    assert(state.listRegistrations.forall(_.state == "synced"))
    assert(restartsSeen.get() == 1, s"expected exactly one DDL restart")

    // the zombie's heartbeat after the steal must be rejected
    assert(!Lease.refresh(url, "t3", "workerDead"),
      "zombie heartbeat must fail after the lease was stolen")

    // per-table hash gate: soak output content == sequential control
    (0 until NTables).foreach { i =>
      assert(signature(manifests.get(i)) == controlSig(i),
        s"table t$i soak output diverged from the control run")
    }
    // the zombie's partial garbage did not survive the re-run
    val t3Files = new java.io.File(garbageDir).listFiles().map(_.getName)
    assert(!t3Files.contains("part-garbage.json"),
      s"zombie partial output must be overwritten, saw: ${t3Files.mkString(",")}")
    assert(limiter.running("cl0") == 0 && limiter.running("cl1") == 0)
  }
}
