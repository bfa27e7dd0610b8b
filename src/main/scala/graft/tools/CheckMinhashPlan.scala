package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CheckMinhashPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val df = graft.analytics.Dedup.minhashWideNative(docs, "doc_id", col("text"), 8, 8)
    val plan = df.queryExecution.optimizedPlan.toString
    val evals = "(?i)minhash".r.findAllIn(plan).length
    println(s"MINHASH_EVALS_IN_PLAN=$evals")
    spark.stop()
  }
}
