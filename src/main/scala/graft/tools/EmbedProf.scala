package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object EmbedProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-28s ${(System.nanoTime()-t0)/1e9}%.2f s  ($n rows)")
    }
    time("warm")(graft.core.Tables.embeddings(spark, dir).count())
    time("neardup pairs")(graft.QueriesExtra.embedNeardup(spark, dir).count())
    time("neardup pairs again")(graft.QueriesExtra.embedNeardup(spark, dir).count())
    val pairs = graft.QueriesExtra.embedNeardup(spark, dir)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    time("CC + clusters")(graft.analytics.Dedup.dupClusters(pairs).count())
    time("full q_embed_clusters")(
      graft.QueriesExtra.queries("q_embed_clusters")(spark, dir).count())
    time("full q_semdedup_prune")(
      graft.QueriesTraining.semdedupPrune(spark, dir).count())
    spark.stop()
  }
}
