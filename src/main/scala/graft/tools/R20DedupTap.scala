package graft.tools

import org.apache.spark.sql.functions._

/** r20 plan documentation tap (the r19 verdict's task 7): the dedup
  * cluster family's catalog plans truncate at connectedComponents'
  * checkpoint leaf (the candidate pipeline executes during plan
  * construction), so the r19 judge had to infer the candidate-stage
  * structure from sibling queries. This dumps `explain("formatted")`
  * of q_dedup_pipeline's candidate stage itself — the pipeline up to
  * `verified` (lshVerifiedPairs → jaccard ≥ 0.5 → pair projection),
  * which IS explainable — to plans/<out>.
  *
  * Usage: runMain graft.tools.R20DedupTap [outFile]
  */
object R20DedupTap {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("plans/r20/q_dedup_pipeline_candidate_stage.txt")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("graft-r20-deduptap")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = graft.core.Tables.documents(s, sf)
    val verified = graft.analytics.Dedup.lshVerifiedPairs(
      graft.analytics.Dedup.lshBandKeys(d, "doc_id", col("text"),
        k = 8, numHashes = 8, rowsPerBand = 4),
      d, "doc_id", col("text"), k = 8)
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
    val txt = verified.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    graft.core.CacheRegistry.releaseAll()
    println(s"wrote $out")
    s.stop()
  }
}
