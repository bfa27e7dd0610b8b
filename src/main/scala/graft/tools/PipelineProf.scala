package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.analytics.Dedup

/** Stage-level timing of q_dedup_pipeline at an arbitrary SF dir — which
  * stage owns the sf1 wall time (band keys, candidate pairs, n-gram
  * Jaccard verify, or CC)?
  */
object PipelineProf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pipeprof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val d = Tables.documents(spark, dir)
    d.count() // warmup
    val bands = Dedup.lshBandKeys(d, "doc_id", col("text"), k = 8, numHashes = 8, rowsPerBand = 4)
    time("bandKeys")(bands.write.format("noop").mode("overwrite").save())
    val pairs = Dedup.lshCandidatePairs(bands, "doc_id")
    val nPairs = time("candidatePairs count")(pairs.count())
    println(s"[pipeprof] nPairs=$nPairs")
    val jac = Dedup.ngramJaccard(pairs, d, "doc_id", col("text"), k = 8)
    time("ngramJaccard")(jac.write.format("noop").mode("overwrite").save())
    val verified = jac.filter(col("jaccard") >= 0.5).select(col("doc_a"), col("doc_b"))
    val nVer = time("verified count")(verified.count())
    println(s"[pipeprof] nVerified=$nVer")
    time("dupClusters")(Dedup.dupClusters(verified).write.format("noop").mode("overwrite").save())
    time("FULL pipeline")(graft.QueriesAnalytics.dedupPipeline(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
