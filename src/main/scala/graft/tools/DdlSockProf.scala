package graft.tools

/** Phase profiler for q_ddl_socket: runs the row N times and prints
  * coarse wall times so restart-loop optimizations are measured, not
  * guessed. Dev scaffolding only.
  */
object DdlSockProf {
  def main(args: Array[String]): Unit = {
    sys.props("graft.ddl.prof") = "1"
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("graft-ddlprof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // warm: fixture build + parse caches
    graft.SparkEntry.queries("q_ddl_socket")(s, sf).count()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries("q_ddl_socket")(s, sf)
      val t1 = System.nanoTime()
      val n = df.count()
      val t2 = System.nanoTime()
      println(f"run$i: build=${(t1 - t0) / 1e9}%.3f count=${(t2 - t1) / 1e9}%.3f s  rows=$n")
    }
    s.stop()
  }
}
