package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every catalog query at the given scale factor,
  * one JSON line on stdout.
  *
  * Methodology: `noop` write forces full materialization of every column
  * (a bare `count()` would let Catalyst prune the computed columns away);
  * one small warmup query amortizes JVM/codegen startup so per-query
  * numbers measure the plan, not first-run compilation.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // warmup: JVM + codegen + parquet footer/page caches for every input
    try {
      graft.core.Tables.all.foreach(t =>
        graft.core.Tables.load(spark, sfDir, t).write.mode("overwrite").format("noop").save())
      SparkEntry.queries("q1_agg")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    } catch { case _: Throwable => () }

    // dev loop: SPARK_GRAFT_ONLY=q_a,q_b restricts the run to a subset
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val results = names.map(n => n -> materialize(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
