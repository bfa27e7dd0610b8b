package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object EmbedClusterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val t0 = System.nanoTime()
    val pairs = graft.QueriesExtra.embedNeardup(spark, dir)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val n = pairs.persist().count()
    println(s"pairs: $n in ${(System.nanoTime()-t0)/1e9}s")
    val t1 = System.nanoTime()
    val cc = graft.analytics.Dedup.connectedComponents(pairs)
    val comps = cc.groupBy("component").count()
    println(s"components: ${comps.count()}, max size: ${comps.agg(max("count")).head().getLong(0)}")
    println(s"cc time: ${(System.nanoTime()-t1)/1e9}s")
    spark.stop()
  }
}
