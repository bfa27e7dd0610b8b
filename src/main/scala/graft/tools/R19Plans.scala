package graft.tools

/** Round-19 optimization evidence: dump `explain("formatted")` for the
  * named queries to <outDir>/<name>_<suffix>.txt — the before/after plan
  * snapshots OPTIMIZATION_r19.md cites. Same session shape as PlansDump
  * (sf0.01, local[4], shuffle width 4) so before/after diffs show plan
  * structure, not partition-count noise.
  *
  * Usage: runMain graft.tools.R19Plans <suffix> <outDir> <q1,q2,...>
  */
object R19Plans {
  def main(args: Array[String]): Unit = {
    val (suffix, outDir, names) = (args(0), args(1), args(2).split(",").toSeq)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("graft-r19-plans")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(s, sf)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // release per-query persisted intermediates (explain does not run
      // the query, but construction may persist — keep the session clean)
      graft.core.CacheRegistry.releaseAll()
      s.catalog.clearCache()
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    s.stop()
  }
}
