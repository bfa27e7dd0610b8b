package graft.tools
// scratch: measure candidate calibration job
object CalibProbe {
  def main(a: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    (1 to 5).foreach { i =>
      val t0 = System.nanoTime()
      val r = s.range(0, 600000000L, 1, 32).selectExpr("pmod(xxhash64(id), 1048576) AS h")
        .agg(org.apache.spark.sql.functions.sum("h")).collect()(0).getLong(0)
      println(f"calib $i: ${(System.nanoTime()-t0)/1e9}%.3f s (sum=$r)")
    }
    s.stop()
  }
}
