package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analytics.Dedup

/** Dev A/B for the LSH exact-verify stage (r15 sorted-merge kernel):
  * times, on the same fixture and in one JVM,
  *   fused_merge — Dedup.lshVerifiedPairs as shipped (bucket-local
  *                 verify + graft_sorted_intersect_count),
  *   fused_hash  — the identical fused shape with the pre-r15
  *                 size(array_intersect(...)) per-pair hash rebuild,
  *   pair_join   — the pre-fusion join-by-pair shape
  *                 (ngramJaccard over lshCandidatePairs; sets ride the
  *                 joins at pair multiplicity — the sf100 ENOSPC shape).
  * Each variant drains to a count + a checksum so nothing driver-sized
  * collects. Usage: runMain graft.tools.DedupAbProbe <dir> [variants]
  */
object DedupAbProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val variants: Set[String] =
      if (args.length > 1) args(1).split(",").toSet
      else Set("fused_merge", "fused_hash", "pair_join")
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-dedup-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = graft.core.Tables.documents(spark, dir)
    def bandKeys = Dedup.lshBandKeys(d, "doc_id", col("text"),
      k = 8, numHashes = 8, rowsPerBand = 4)

    // the fused shape with the pre-r15 per-pair hash-set intersect —
    // byte-for-byte the old lshVerifiedPairs body
    def fusedHash: DataFrame = {
      val shareable = bandKeys
        .withColumn("_n", count(lit(1)).over(
          Window.partitionBy(col("band"), col("band_key"))))
        .filter(col("_n") >= 2 && col("_n") <= 1000)
        .drop("_n")
      val candIds = shareable.select(col("doc_id")).distinct()
      val sets = Dedup.shingles(
          d.join(broadcast(candIds), Seq("doc_id"), "left_semi"),
          "doc_id", col("text"), 8)
        .groupBy(col("doc_id"))
        .agg(collect_set(xxhash64(col("shingle"))).as("ss"))
      val banded = shareable.join(sets, Seq("doc_id"))
      def side(outId: String, outSs: String) =
        banded.select(col("band"), col("band_key"),
          col("doc_id").as(outId), col("ss").as(outSs))
      side("doc_a", "ss_a").join(side("doc_b", "ss_b"), Seq("band", "band_key"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("ss_a"), col("ss_b"))).cast("long").as("inter"),
          size(col("ss_a")).cast("long").as("n_a"),
          size(col("ss_b")).cast("long").as("n_b"))
        .distinct()
        .filter(col("inter") > 0)
    }

    def run(name: String, df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = df.agg(count(lit(1)), sum(col("inter") + col("n_a"))).head()
      println(f"$name%-12s ${(System.nanoTime() - t0) / 1e9}%8.1f s  " +
        s"pairs=${r.getLong(0)} checksum=${r.get(1)}")
    }

    if (variants("fused_merge"))
      run("fused_merge",
        Dedup.lshVerifiedPairs(bandKeys, d, "doc_id", col("text"), 8))
    if (variants("fused_hash")) run("fused_hash", fusedHash)
    if (variants("pair_join"))
      run("pair_join", Dedup.ngramJaccard(
        Dedup.lshCandidatePairs(bandKeys, "doc_id"), d, "doc_id", col("text"), 8))
    spark.stop()
  }
}
