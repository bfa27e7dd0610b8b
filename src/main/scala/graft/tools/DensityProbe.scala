package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.analytics.Dedup

/** Dump the LSH candidate/verified pair list for a fixture dir to
  * parquet so the scaled-fixture dup DENSITY (pairs/doc and its decade
  * growth; ScaleUp's r16 salted-substitution contract) can be broken
  * down by id lineage in DuckDB. Diagnostic only — not a catalog query.
  */
object DensityProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_density"
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-density")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = graft.core.Tables.documents(spark, dir)
    val pairs = Dedup.lshVerifiedPairs(
      Dedup.lshBandKeys(d, "doc_id", col("text"), k = 8, numHashes = 8,
        rowsPerBand = 4),
      d, "doc_id", col("text"), 8)
    pairs.write.mode("overwrite").parquet(out)
    println(s"dumped ${spark.read.parquet(out).count()} pairs to $out")
    spark.stop()
  }
}
