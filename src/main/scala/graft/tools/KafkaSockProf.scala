package graft.tools

import org.apache.spark.sql.functions._

/** Phase-level timing probe for q_kafka_socket: reproduces the query's
  * phases (driver split-point agg, wire produce ×2, checkpointed
  * AvailableNow drain ×2, read-back) with per-phase wall timers, to find
  * the dominant cost before optimizing. Dev diagnostic only.
  */
object KafkaSockProf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .appName("kafka-sock-prof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"PHASE $name%-14s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    s.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        System.err.println(s"  batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs}")
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    })
    val nParts = 8
    val kp = pmod(col("user_id"), lit(nParts))
    val base = graft.core.Tables.events(s, dir)
      .filter(col("event_type").isin("purchase", "view"))
      .select(
        col("event_id").as("ord"),
        col("user_id").cast("string").as("key"),
        col("user_id"),
        to_json(struct(col("event_id"),
          round(col("value") * 100).cast("long").as("value_cents"))).as("value"))

    (1 to 3).foreach { round =>
      System.err.println(s"== round $round ==")
      val (mid, total) = timed("split-agg") {
        val r = base.agg(min(col("ord")), max(col("ord")), count(lit(1))).first()
        ((r.getLong(0) + r.getLong(1)) / 2, r.getLong(2))
      }
      val broker = new graft.pipes.KafkaWire.Broker(nParts)
      try {
        val url = broker.url
        val topic = "graft_events"
        def produceWire(dfName: String, half: org.apache.spark.sql.DataFrame): Unit =
          timed(dfName) {
            half.repartition(nParts, kp)
              .sortWithinPartitions(kp, col("ord"))
              .select(kp.cast("int").as("kpart"), col("key"), col("value"))
              .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
                val buf = scala.collection.mutable.ArrayBuffer
                  .empty[(Array[Byte], Array[Byte], Long)]
                var cur = -1
                def flush(): Unit = if (buf.nonEmpty) {
                  graft.pipes.KafkaWire.produce(url, topic, cur, buf.toSeq)
                  buf.clear()
                }
                it.foreach { r =>
                  val p = r.getInt(0)
                  if (p != cur || buf.size >= 4000) { flush(); cur = p }
                  buf += ((r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8),
                    r.getString(2).getBytes(java.nio.charset.StandardCharsets.UTF_8), 0L))
                }
                flush()
              }
          }
        val outDir = s"${graft.core.Tmp.scratchRoot}/graft_ksock_prof_out"
        org.apache.hadoop.fs.FileSystem.getLocal(s.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(outDir), true)
        def consume(name: String, ckpt: String): Unit = timed(name) {
          s.readStream.format("graft-kafka")
            .option("path", s"$url/$topic")
            .option("maxOffsetsPerTrigger", math.max(4096L, total / 4 + 1))
            .load()
            .writeStream.format("parquet")
            .option("path", outDir)
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
            .awaitTermination()
        }
        val ckptDir = graft.core.Tmp.scratchDir("graft-ksock-prof-ckpt")
        try {
          produceWire("produce-1", base.filter(col("ord") <= mid))
          consume("consume-1", ckptDir.toString)
          produceWire("produce-2", base.filter(col("ord") > mid))
          consume("consume-2", ckptDir.toString)
        } finally graft.core.Tmp.deleteRecursively(ckptDir)
        timed("read-back") {
          val n = s.read.parquet(outDir)
            .select(col("partition").cast("long").as("partition"), col("offset"),
              col("key").cast("long").as("user_id"),
              get_json_object(col("value"), "$.event_id").cast("long").as("event_id"),
              get_json_object(col("value"), "$.value_cents").cast("long").as("value_cents"))
            .count()
          System.err.println(s"  rows=$n")
        }
      } finally broker.close()
    }
    s.stop()
  }
}
