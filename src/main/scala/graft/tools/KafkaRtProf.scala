package graft.tools

import org.apache.spark.sql.functions._

/** Phase-level timing probe for q_kafka_roundtrip (loopback pipe):
  * produce into the segmented topic log vs AvailableNow drain vs final
  * read-back projection, each timed separately. Dev diagnostic only.
  */
object KafkaRtProf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .appName("kafka-rt-prof")
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
    (1 to 3).foreach { iter =>
      System.err.println(s"== round $iter ==")
      val nParts = 8
      val base = graft.core.Tables.events(s, dir)
        .filter(col("event_type").isin("purchase", "view"))
        .select(
          col("event_id").as("ord"),
          col("user_id").cast("string").as("key"),
          col("user_id"),
          to_json(struct(col("event_id"),
            round(col("value") * 100).cast("long").as("value_cents"))).as("value"))
      val topicDir = s"${System.getProperty("java.io.tmpdir")}/graft_kafka_prof"
      org.apache.hadoop.fs.FileSystem.getLocal(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(topicDir), true)
      val produced = timed("produce") {
        graft.pipes.LoopbackPipe.produce(base, topicDir, nParts, col("ord"),
          partitionCol = Some(pmod(col("user_id"), lit(nParts))))
      }
      val ckptRoot = java.nio.file.Files.createTempDirectory("graft-kafka-prof-ckpt")
      timed("drain") {
        val q = s.readStream.format("graft-kafka")
          .option("path", topicDir)
          .option("maxOffsetsPerTrigger", math.max(4096L, produced / 4 + 1))
          .load()
          .writeStream.format("memory").queryName(s"graft_kafka_prof_$iter")
          .option("checkpointLocation", ckptRoot.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val n = timed("readback") {
        s.table(s"graft_kafka_prof_$iter")
          .select(col("partition").cast("long"), col("offset"),
            col("key").cast("long").as("user_id"),
            get_json_object(col("value"), "$.event_id").cast("long").as("event_id"))
          .count()
      }
      System.err.println(s"rows=$n produced=$produced")
      org.apache.commons.io.FileUtils.deleteQuietly(ckptRoot.toFile)
    }
    s.stop()
  }
}
