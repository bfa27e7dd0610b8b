package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.analytics.Dedup

/** Dump the LSH CANDIDATE pair list (what q_dedup_clusters clusters —
  * pre-verify, unlike DensityProbe's verified dump) for offline graph
  * structure analysis: component count/size/diameter drive the CC loop's
  * round bound. Diagnostic only.
  */
object CandPairsDump {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_cand_pairs"
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-cand-dump")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = graft.core.Tables.documents(spark, dir)
    Dedup.lshCandidatePairs(
      Dedup.lshBandKeys(d, "doc_id", col("text"), k = 8, numHashes = 8,
        rowsPerBand = 4), "doc_id")
      .write.mode("overwrite").parquet(out)
    println(s"dumped ${spark.read.parquet(out).count()} candidate pairs to $out")
    spark.stop()
  }
}
