package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every catalog query at the given scale factor,
  * one JSON line on stdout.
  *
  * Methodology: `noop` write forces full materialization of every column
  * (a bare `count()` would let Catalyst prune the computed columns away);
  * one small warmup query amortizes JVM/codegen startup so per-query
  * numbers measure the plan, not first-run compilation. Each query runs
  * `SPARK_GRAFT_REPEATS` times (default 3) and reports the per-query
  * MEDIAN — single-run deltas proved to be noise (q_corpus_clean swung
  * 2.7↔4.2 s across rounds with no code change).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = math.max(1, sys.env.get("SPARK_GRAFT_REPEATS").map(_.trim.toInt).getOrElse(3))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // median over `repeats` warm runs; any failed run fails the query.
    // After each query, release every persistent RDD: localCheckpoint()
    // results are pinned in the block manager and never unpersisted by
    // their owner, so a 70-query run otherwise accumulates dead blocks
    // and the resulting memory pressure inflated later queries by 3-8x
    // (q_dedup_minhash measured 7.8 s in the full run vs 0.5 s isolated).
    def materialize(name: String): Double = {
      val runs = Seq.fill(repeats)(once(name))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      if (runs.exists(_ < 0)) -1.0
      else runs.sorted.apply(runs.size / 2)
    }

    // warmup: JVM + codegen + parquet footer/page caches for every input
    try {
      graft.core.Tables.all.foreach(t =>
        graft.core.Tables.load(spark, sfDir, t).write.mode("overwrite").format("noop").save())
      SparkEntry.queries("q1_agg")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    } catch { case _: Throwable => () }

    // dev loop: SPARK_GRAFT_ONLY=q_a,q_b restricts the run to a subset
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { o =>
      val unknown = o.diff(SparkEntry.queries.keySet)
      if (unknown.nonEmpty)
        System.err.println(
          s"WARNING: SPARK_GRAFT_ONLY names match no catalog query: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val results = names.map(n => n -> materialize(n))

    // source-level throughput (rows/s) for the two streaming sources, so
    // source regressions are visible distinctly from planner jitter
    val throughput = Seq("q_changelog_native", "q_kafka_roundtrip")
      .filter(n => names.contains(n))
      .map { n =>
        val sec = results.toMap.apply(n)
        val rows = try SparkEntry.queries(n)(spark, sfDir).count() catch { case _: Throwable => -1L }
        n -> (if (sec > 0 && rows >= 0) math.round(rows / sec).toDouble else -1.0)
      }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val tp = throughput.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"rows_per_sec":$tp,"repeats":$repeats,"sf":"$sfDir"}""")
    spark.stop()
  }
}
