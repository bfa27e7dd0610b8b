package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipes.FileSink
import graft.state.Lease

/** Multi-worker lease FAILOVER end-to-end — the reference's crash-steal
  * contract (state/lock.go:31-169 + the RefreshTableLock refresh-abandon
  * protocol) driven through two concurrent coordinators sharing one state
  * database and a real [[FileSink]] task:
  *
  *  - worker A claims the task, writes PARTIAL sink output, and dies
  *    (no release, heartbeats stop);
  *  - worker B's coordinator loop polls, steals the lease once it
  *    expires, re-runs the task from scratch, and completes it;
  *  - A's later heartbeat returns false (the abandon signal — a zombie
  *    holder must NOT keep writing);
  *  - the final sink content (per-file SHA-256 from the `_DONE`
  *    manifest) is byte-identical to a control run by one healthy
  *    worker, and A's partial garbage is gone.
  *
  * The task is idempotent-by-restart (overwrite semantics), which is the
  * reference's model too: a stolen task re-runs from its checkpoint; the
  * sink's commit protocol guarantees no partial output survives.
  */
class LeaseFailoverSpec extends SparkSuite {

  private def taskFrame = {
    // deterministic content AND order: one sorted partition
    spark.range(0, 1000)
      .selectExpr("id", "(id * 7) % 13 AS v")
      .repartition(1).sortWithinPartitions("id")
      .select(to_json(struct(col("id"), col("v"))).as("value"))
  }

  /** Content signature: (numRecs, sha256) per file, name-independent
    * (Spark part-file names embed a task UUID, so byte-identity is
    * asserted on the hashed content the manifest records).
    */
  private def signature(ms: Seq[FileSink.Manifest]): Seq[(Long, String)] =
    ms.map(m => (m.numRecs, m.hash)).sorted

  test("worker dies mid-task; peer steals after expiry; output byte-identical") {
    val url = "jdbc:derby:memory:graftfailover;create=true"
    Lease.ensureTable(url)
    Lease.register(url, "export")
    val root = Files.createTempDirectory("graft-failover")

    // control: one healthy worker runs the task to completion
    val control = FileSink.write(taskFrame, s"$root/control", "json")

    val outDir = s"$root/out"
    val timeoutSec = 2L

    // worker A: claims, emits partial output, dies without releasing
    val claimedA = Lease.acquire(url, "workerA", timeoutSec)
    assert(claimedA.contains("export"))
    Files.createDirectories(java.nio.file.Paths.get(outDir))
    Files.write(java.nio.file.Paths.get(outDir, "part-00000-partial.json"),
      "{\"id\":0,\"v\":0}\n{\"id\":1,\"TRUNCATED".getBytes("UTF-8"))
    // (A's thread is gone here — no release, no further refresh)

    // worker B: coordinator loop — poll until the expired lease is stealable
    @volatile var stolen: Option[String] = None
    @volatile var manifestB: Seq[FileSink.Manifest] = Nil
    val b = new Thread(() => {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (stolen.isEmpty && System.nanoTime() < deadline) {
        stolen = Lease.acquire(url, "workerB", timeoutSec)
        if (stolen.isEmpty) Thread.sleep(250)
      }
      stolen.foreach { task =>
        assert(task == "export")
        // re-run from scratch; overwrite clears A's partial file
        manifestB = FileSink.write(taskFrame, outDir, "json")
        assert(Lease.refresh(url, task, "workerB"), "holder heartbeat must succeed")
        Lease.release(url, task, "workerB")
      }
    }, "graft-failover-workerB")
    b.start()
    b.join(60000)
    assert(!b.isAlive, "worker B did not finish")

    // the steal happened, and A's zombie heartbeat gets the abandon signal
    assert(stolen.contains("export"), "worker B never stole the expired lease")
    assert(!Lease.refresh(url, "export", "workerA"),
      "dead worker's refresh must fail after the steal")

    // sink content is byte-identical to the healthy run; partial is gone
    assert(signature(manifestB) == signature(control))
    val leftover = new java.io.File(outDir).listFiles().map(_.getName)
      .filter(_.contains("partial"))
    assert(leftover.isEmpty, s"partial output survived the restart: ${leftover.toSeq}")
    // _DONE marker present (K6): downstream consumers see a completed task
    assert(new java.io.File(outDir, "_DONE").isFile)
  }
}
