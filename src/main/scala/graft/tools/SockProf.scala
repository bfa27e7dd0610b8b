package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleave probe for the q_changelog_native / q_changelog_socket
  * interaction: alternating runs in one JVM, per-run wall times printed,
  * to attribute the bench's "socket is slow only when native precedes it
  * in the pass" signal to a shared-JVM mechanism (cache eviction, GC,
  * listener growth) vs scheduling noise.
  */
object SockProf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-sockprof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      t
    }
    val plan = Seq("q_changelog_socket", "q_changelog_socket", "q_changelog_native",
      "q_changelog_socket", "q_changelog_native", "q_changelog_socket",
      "q_changelog_socket", "q_changelog_native", "q_changelog_socket")
    plan.foreach { n => val t = run(n); println(f"[sockprof] $n%-22s ${t}%6.2f s") }
    spark.stop()
  }
}
