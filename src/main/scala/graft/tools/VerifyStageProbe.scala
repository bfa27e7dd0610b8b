package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analytics.Dedup
import graft.core.Tables

/** Sub-plan decomposition of the fused LSH verify at an arbitrary SF dir —
  * which internal stage owns the wall/memory at sf100: the bucket-count
  * window, the sorted shingle-set aggregation, or the bucket self-join +
  * merge? Each sub-plan drains through an aggregate (no driver collect).
  * Usage: runMain graft.tools.VerifyStageProbe <dir> [stages]
  * honors SPARK_GRAFT_SHUFFLE like OneRun.
  */
object VerifyStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val stages: Set[String] =
      if (args.length > 1) args(1).split(",").toSet
      else Set("window", "sets", "verify")
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-verify-stage-probe")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled",
        sys.env.get("SPARK_GRAFT_NOCOALESCE").fold("true")(_ => "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_LOGLEVEL", "WARN"))
    println(s"[probe] shuffle.partitions=" +
      spark.conf.get("spark.sql.shuffle.partitions"))
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.1f s  $r")
      r
    }
    val d = Tables.documents(spark, dir)
    val bandKeys = Dedup.lshBandKeys(d, "doc_id", col("text"),
      k = 8, numHashes = 8, rowsPerBand = 4)
    val shareable = bandKeys
      .withColumn("_n", count(lit(1)).over(
        Window.partitionBy(col("band"), col("band_key"))))
      .filter(col("_n") >= 2 && col("_n") <= 1000)
      .drop("_n")
    if (stages("window"))
      time("window+shareable")(shareable.groupBy().count().head().getLong(0))
    if (stages("sets")) {
      val candIds = shareable.select(col("doc_id")).distinct()
      val sets = Dedup.shingles(
          d.join(broadcast(candIds), Seq("doc_id"), "left_semi"),
          "doc_id", col("text"), 8)
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_set(xxhash64(col("shingle")))).as("ss"))
      time("sets agg")(sets.agg(count(lit(1)), max(size(col("ss"))),
        sum(size(col("ss")))).head().toString)
    }
    if (stages("verify"))
      time("full verify")(
        Dedup.lshVerifiedPairs(bandKeys, d, "doc_id", col("text"), 8)
          .agg(count(lit(1))).head().getLong(0))
    spark.stop()
  }
}
