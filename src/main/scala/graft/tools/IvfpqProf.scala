package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object IvfpqProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[T](tag: String)(b: => T): T = {
      val t0 = System.nanoTime(); val r = b
      println(f"PROF $tag: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    spark.range(10).count()
    val e = t("load") { val d = graft.core.Tables.load(spark, dir, "embeddings"); d.count(); d }
    val iv = t("ivf-train") { graft.analytics.Ivf.Model.parse(
      graft.analytics.Ivf.train(e, "vec_id", "embedding", k = 8, iters = 5).serialize) }
    val pq = t("pq-train") { graft.analytics.Pq.trainCached(e, "profkey",
      col("vec_id"), col("embedding"), k = 32, iters = 8) }
    val corpus = e.filter(col("vec_id") =!= 2)
    val path = "/tmp/graft_ivfpq_prof"
    t("materialize") { graft.analytics.Pq.materializeIvfPq(corpus, col("vec_id"), col("embedding"), iv, pq, path) }
    val query = t("queryvec") { e.filter(col("vec_id") === 2)
      .select(graft.analytics.Similarity.quantize(col("embedding")).as("q"))
      .head().getAs[Seq[Long]]("q").toIndexedSeq }
    val n = t("count") { corpus.count().toInt }
    t("probe") { graft.analytics.Pq.probeIvfPq(spark, path, iv, pq, query, 8, n, 15).collect() }
    t("probe2") { graft.analytics.Pq.probeIvfPq(spark, path, iv, pq, query, 8, n, 15).collect() }
    spark.stop()
  }
}
