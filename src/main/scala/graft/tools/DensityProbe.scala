package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.analytics.Dedup

/** Measure — and GATE — the scaled-fixture dup density (r16 verdict
  * task 5).
  *
  * The salted-substitution fixture chain (ScaleUp, FIXTURES.md) holds
  * VERIFIED pairs/doc flat across decades (0.051→0.062), but LSH
  * CANDIDATES/doc still grows (~×1.8/decade measured r16: 0.055 at sf1 →
  * 0.332 at sf100) because every generation is a near-dup of its source
  * doc at J≈0.2 — chained salting makes ancestor-descendant pairs land in
  * shared bands often enough to be candidates while (correctly) failing
  * the Jaccard≥0.8 verify. That growth is a property of the FIXTURE, not
  * the kernels; left unpinned it could quietly inflate an sf1000-class
  * claim (candidate volume is the dedup pipeline's binding cost). So this
  * probe emits the density row for a fixture dir and, given a bound,
  * exits nonzero when candidates/doc exceeds it — the pinned per-decade
  * ladder lives in FIXTURES.md next to the row-set hashes.
  *
  * Usage: runMain graft.tools.DensityProbe <dir> [maxCandPerDoc]
  *        [outParquet]
  *
  * Same LSH config as the catalog pipeline (k=8, 8 hashes, 4 rows/band,
  * maxBucket=1000) so the numbers gate what the pipeline actually sees.
  */
object DensityProbe {
  // the catalog pipeline's LSH config — the gate must measure what the
  // pipeline actually sees (Dedup.scala call sites use these values)
  val ShingleK = 8
  val NumHashes = 8
  val RowsPerBand = 4

  /** (docs, LSH candidate pairs) for a fixture dir — the cheap half of
    * the density row (no verify pass), shared by this probe's main and
    * ScaleUp's generation-time gate so the two can never measure
    * different configs.
    */
  def candidateDensity(spark: SparkSession, dir: String): (Long, Long) = {
    val d = graft.core.Tables.documents(spark, dir)
    val docs = d.count()
    val bandKeys = Dedup.lshBandKeys(d, "doc_id", col("text"), k = ShingleK,
      numHashes = NumHashes, rowsPerBand = RowsPerBand)
    (docs, Dedup.lshCandidatePairs(bandKeys, "doc_id").count())
  }

  /** Fail-loud bound check, shared verbatim by main and ScaleUp. */
  def checkBound(dir: String, candPerDoc: Double, bound: Double): Boolean = {
    val ok = candPerDoc <= bound
    if (!ok) System.err.println(
      f"DENSITY BOUND EXCEEDED: $candPerDoc%.4f candidates/doc > pinned " +
        f"$bound%.4f for $dir — the fixture's candidate mass drifted; " +
        "re-derive the FIXTURES.md ladder before trusting scale claims on it")
    ok
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val maxCandPerDoc: Option[Double] =
      if (args.length > 1) Some(args(1).toDouble) else None
    val out: Option[String] = if (args.length > 2) Some(args(2)) else None
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-density")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = graft.core.Tables.documents(spark, dir)
    val docs = d.count()
    val bandKeys = Dedup.lshBandKeys(d, "doc_id", col("text"), k = ShingleK,
      numHashes = NumHashes, rowsPerBand = RowsPerBand)
    // band keys are consumed twice (candidates + verify) — same hint the
    // pipeline itself uses, sized at tens of bytes per doc-band
    val bk = bandKeys.persist()
    val candidates = Dedup.lshCandidatePairs(bk, "doc_id").count()
    val verified = Dedup.lshVerifiedPairs(bk, d, "doc_id", col("text"), ShingleK)
    val verifiedCount = out match {
      case Some(p) =>
        verified.write.mode("overwrite").parquet(p)
        spark.read.parquet(p).count()
      case None => verified.count()
    }
    bk.unpersist()
    val candPerDoc = candidates.toDouble / docs
    val verPerDoc = verifiedCount.toDouble / docs
    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    println(s"""{"dir":"$dir","docs":$docs,"candidates":$candidates,""" +
      s""""cand_per_doc":${f(candPerDoc)},"verified":$verifiedCount,""" +
      s""""verified_per_doc":${f(verPerDoc)},""" +
      s""""bound":${maxCandPerDoc.map(f).getOrElse("null")},""" +
      s""""bound_ok":${maxCandPerDoc.forall(candPerDoc <= _)}}""")
    spark.stop()
    if (!maxCandPerDoc.forall(checkBound(dir, candPerDoc, _)))
      sys.exit(1)
  }
}
