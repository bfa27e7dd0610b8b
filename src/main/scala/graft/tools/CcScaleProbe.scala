package graft.tools

/** Third-decade probe for q_dedup_clusters (r16 verdict task 1): times
  * the full candidate-pair → components plan at a fixture dir and prints
  * which CC path ran — the DriverBudget union-find fallback must NOT
  * engage at sf100 (3.3M directed edges > the 1M driver cap), so the
  * probe makes the taken path part of the recorded evidence instead of
  * an inference from timing.
  */
object CcScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("graft-cc-scale")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    graft.SparkEntry.queries("q_dedup_clusters")(spark, dir)
      .write.mode("overwrite").format("noop").save()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"CC_PROBE dir=$dir sec=$sec%.1f driver_path=${graft.analytics.Dedup.lastPathDriver}")
    spark.stop()
  }
}
