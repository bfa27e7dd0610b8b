package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batch-level profile of q_stream_join: replicates the catalog body but
  * prints every micro-batch's QueryProgress (durationMs breakdown, state
  * rows/memory) to locate where the wall time goes.
  *
  * FINDINGS (r11, idle machine): warm runs 2.9-3.4 s, matching the r10
  * record. The 5-19 s samples that prompted this probe had TWO causes:
  * ambient load below the 1.5x calibration flag, and — the reproducible
  * part — dead state-store providers from earlier catalog queries doing
  * lazy maintenance against deleted checkpoints while this query was
  * being measured (fixed: Bench.onceClean now calls StateStore.stop()
  * between queries; q_stream_join inside a heavy 15-query set went
  * 5.6 -> 2.9 s and the full catalog 155 -> 127 s with every floor and
  * ceiling green). Cost split per warm run: state-store commits dominate
  * (8 partitions x 4 join stores x 3 batches incl. the 0-row
  * watermark-finalize batch); the double scan (two readStream sources
  * over the same files) is NOT the bottleneck — the ALT single-source
  * self-join shape below measures the same wall time, so the catalog
  * keeps the clearer two-source form.
  */
object SJoinProf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-sjoinprof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[sjoin] batch=${p.batchId} rows=${p.numInputRows} durations=${p.durationMs} state=${p.stateOperators.map(s0 => s"rows=${s0.numRowsTotal} mem=${s0.memoryUsedBytes} commit=${s0.commitTimeMs}").mkString(";")}")
      }
    }
    spark.streams.addListener(listener)
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
    def run(name: String): Unit = {
      val g0 = gcMs; val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      if (sys.env.get("SJOIN_STATESTOP").contains("1"))
        org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      println(f"[sjoin] $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s  gc=${gcMs - g0} ms")
    }
    (1 to 3).foreach(_ => run("q_stream_join"))
    // heavy batch residue, then the stream join again
    Seq("q_pagerank", "q_multimodal_resize", "q_multimodal_video", "q_dedup_pipeline",
      "q_semdedup_prune", "q_knn_classify", "q_simhash_pairs", "q_ngram_lm").foreach(run)
    (1 to 3).foreach(_ => run("q_stream_join"))
    // ALT shape: single source, self-join (one scan instead of two)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = altSelfJoin(spark, dir)
      println(f"[sjoin] ALT $i total ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }

  def altSelfJoin(s: SparkSession, dir: String): Long = {
    val src = graft.QueriesCdc.fixturePath("sjoin_src", dir)
    val one = s.readStream
      .schema("event_id bigint, ts timestamp, user_id bigint, event_type string")
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
    val views = one.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", "12 hours")
    val purchases = one.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "12 hours")
    val joined = views.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("view_ts") &&
          col("p_ts") <= col("view_ts") + expr("interval 12 hours"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (unix_millis(col("p_ts")) - unix_millis(col("view_ts"))).as("lag_ms"))
    val old = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    val ckpt = graft.core.Tmp.scratchDir("sjoin-alt-ckpt")
    try {
      joined.writeStream.format("memory").queryName("sjoin_alt")
        .outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", old)
      graft.core.Tmp.deleteRecursively(ckpt)
    }
    s.table("sjoin_alt").count()
  }
}
