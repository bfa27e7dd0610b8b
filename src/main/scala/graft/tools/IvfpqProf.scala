package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ANN ladder methodology (r16 verdict task 4): time the IVF-PQ BUILD
  * path (ivf train, pq codebook train, index materialize) SEPARATELY
  * from the serving-path PROBE, so the per-decade factors in BASELINE.md
  * measure each path instead of conflating a one-time index build with
  * query latency (q_ivfpq_topk's sf10 median carried a cold build while
  * its min was the warm probe — not interpretable as probe scaling).
  *
  * Usage: runMain graft.tools.IvfpqProf [fixtureDir] — prints per-stage
  * PROF lines plus one machine-readable LADDER json line.
  */
object IvfpqProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val times = scala.collection.mutable.LinkedHashMap[String, Double]()
    def t[T](tag: String)(b: => T): T = {
      val t0 = System.nanoTime(); val r = b
      val s = (System.nanoTime() - t0) / 1e9
      times(tag) = s
      println(f"PROF $tag: $s%.2f s"); r
    }
    spark.range(10).count()
    val e = t("load") { val d = graft.core.Tables.load(spark, dir, "embeddings"); d.count(); d }
    val iv = t("ivf_train") { graft.analytics.Ivf.Model.parse(
      graft.analytics.Ivf.train(e, "vec_id", "embedding", k = 8, iters = 5).serialize) }
    val pq = t("pq_train") { graft.analytics.Pq.trainCached(e, "profkey",
      col("vec_id"), col("embedding"), k = 32, iters = 8) }
    val corpus = e.filter(col("vec_id") =!= 2)
    val path = "/tmp/graft_ivfpq_prof"
    t("materialize") { graft.analytics.Pq.materializeIvfPq(corpus, col("vec_id"), col("embedding"), iv, pq, path) }
    val query = t("queryvec") { e.filter(col("vec_id") === 2)
      .select(graft.analytics.Similarity.quantize(col("embedding")).as("q"))
      .head().getAs[Seq[Long]]("q").toIndexedSeq }
    val n = t("count") { corpus.count().toInt }
    t("probe_cold") { graft.analytics.Pq.probeIvfPq(spark, path, iv, pq, query, 8, n, 15).collect() }
    t("probe_warm") { graft.analytics.Pq.probeIvfPq(spark, path, iv, pq, query, 8, n, 15).collect() }
    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val build = times("ivf_train") + times("pq_train") + times("materialize")
    println(s"""LADDER {"dir":"$dir","build_s":${f(build)},""" +
      times.map { case (k, v) => s""""${k}_s":${f(v)}""" }.mkString(",") + "}")
    spark.stop()
  }
}
