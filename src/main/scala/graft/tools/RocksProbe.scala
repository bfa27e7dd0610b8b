package graft.tools

object RocksProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("graft-rocks")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val qs = Seq("q_stream_join", "q_stream_window", "q_stream_dedup",
      "q_stream_session", "q_stream_neardup")
    def run(label: String): Unit = {
      // warm
      graft.SparkEntry.queries("q_stream_window")(s, sf).write.format("noop").mode("overwrite").save()
      qs.foreach { q =>
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(q)(s, sf).write.format("noop").mode("overwrite").save()
          org.apache.spark.sql.execution.streaming.state.StateStore.stop()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"[rocks] $label $q%-20s median=${ts(1)}%.2f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    run("hdfs")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    run("rocksdb")
    s.stop()
  }
}
