package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** sf1/sf10 scale probe for the streaming-state family (r13 verdict
  * task 3): q_stream_join / q_stream_neardup / q_stream_dsir replayed at
  * two scale factors with PER-BATCH evidence, so the r13 RocksDB trade
  * ("per-batch commit constants amortize over real batch sizes") is
  * proven with data instead of narrated.
  *
  * A session-level [[StreamingQueryListener]] captures every
  * micro-batch's progress while the CATALOG functions run their own
  * streams — the probe measures exactly the shipped plans. Per batch it
  * records input rows, total batch duration, addBatch, the state-store
  * commit time (sum over operators of the RocksDB commit latency custom
  * metric), and the state size (rows + memory/sst bytes). If the commit
  * constant is per-BATCH, its per-batch value should stay ~flat while
  * rows/batch grow 10x, and state size should track live keys.
  *
  * Usage: runMain graft.tools.StreamProf [sfDir ...] [q_name,...]
  * Defaults: /tmp/graft_sf1 /tmp/graft_sf10 over the three verdict rows.
  * Output: one JSON line per (dir, query) with the per-batch table.
  */
object StreamProf {

  case class BatchRow(batchId: Long, inputRows: Long, batchMs: Long,
    addBatchMs: Long, commitLatencyMs: Long, stateRows: Long,
    stateRowsUpdated: Long, stateBytes: Long)

  def main(args: Array[String]): Unit = {
    val (dirs0, queries0) = args.partition(a => !a.startsWith("q_"))
    val dirs = if (dirs0.nonEmpty) dirs0.toSeq
      else Seq("/tmp/graft_sf1", "/tmp/graft_sf10")
    val queries = if (queries0.nonEmpty) queries0.flatMap(_.split(",")).toSeq
      else Seq("q_stream_join", "q_stream_neardup", "q_stream_dsir")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-streamprof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val batches = new java.util.concurrent.ConcurrentLinkedQueue[BatchRow]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        def d(k: String): Long = Option(dur.get(k)).map(_.longValue()).getOrElse(0L)
        val ops = Option(p.stateOperators).getOrElse(Array.empty)
        // commitTimeMs is the engine's own per-operator state commit time,
        // summed over every store instance in the batch — exactly the
        // "RocksDB per-batch commit constant" under adjudication.
        // numRowsTotal reads 0 under trackTotalNumberOfRows=false (the
        // shipped conf), so numRowsUpdated carries the per-batch churn and
        // memory/sst bytes carry the size curve.
        val commit = ops.map(_.commitTimeMs).sum
        val sstBytes = ops.map { o =>
          val sst = Option(o.customMetrics.get("rocksdbSstFileSize"))
            .map(_.longValue()).getOrElse(0L)
          if (sst > 0) sst else o.memoryUsedBytes
        }.sum
        batches.add(BatchRow(p.batchId, p.numInputRows, d("triggerExecution"),
          d("addBatch"), commit, ops.map(_.numRowsTotal).sum,
          ops.map(_.numRowsUpdated).sum, sstBytes))
        ()
      }
    }
    spark.streams.addListener(listener)

    def j(rows: Seq[BatchRow]): String = rows.sortBy(_.batchId).map { b =>
      s"""{"batch":${b.batchId},"rows":${b.inputRows},"batch_ms":${b.batchMs},"add_batch_ms":${b.addBatchMs},"state_commit_ms":${b.commitLatencyMs},"state_rows":${b.stateRows},"state_rows_updated":${b.stateRowsUpdated},"state_bytes":${b.stateBytes}}"""
    }.mkString("[", ",", "]")

    // `q_stream_join@N` runs the SAME catalog join plan with N state
    // partitions instead of the catalog row's fixture-tuned 4 — the
    // production knob (state partitioning is chosen at first job launch,
    // sized to executor width) isolated so the sf10 curve can be
    // attributed to partitioning vs the plan itself.
    def runJoinAt(dir: String, n: Int): Unit = {
      val src = graft.QueriesCdc.streamJoinSource(spark, dir)
      graft.QueriesCdc.withStatePartitions(spark, n) {
        graft.QueriesCdc.withRocksDbState(spark) {
          val ckpt = graft.core.Tmp.scratchDir("graft-sprof-ckpt")
          try graft.QueriesCdc.streamJoinPlan(spark, src)
            .writeStream.format("noop")
            .option("checkpointLocation", ckpt.toString)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start().awaitTermination()
          finally graft.core.Tmp.deleteRecursively(ckpt)
        }
      }
    }

    for (dir <- dirs; q <- queries) {
      batches.clear()
      val t0 = System.nanoTime()
      val ok = try {
        if (q.startsWith("q_stream_join@")) runJoinAt(dir, q.split("@")(1).toInt)
        else graft.SparkEntry.queries(q)(spark, dir)
          .write.mode("overwrite").format("noop").save()
        true
      } catch { case e: Throwable =>
        System.err.println(s"[streamprof] $q @ $dir failed: ${e.getMessage}"); false
      }
      val wallS = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val rows = batches.asScala.toSeq.filter(_.inputRows > 0)
      val constMs = if (rows.nonEmpty)
        rows.map(b => b.batchMs - b.addBatchMs).sorted.apply(rows.size / 2) else -1L
      println(String.format(java.util.Locale.ROOT,
        """{"query":"%s","dir":"%s","ok":%s,"wall_s":%.2f,"n_batches":%d,"median_noncompute_ms":%d,"batches":%s}""",
        q, dir, String.valueOf(ok), Double.box(wallS),
        Int.box(rows.size), Long.box(constMs), j(rows)))
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      graft.core.CacheRegistry.releaseAll()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.streams.removeListener(listener)
    spark.stop()
  }
}
