package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SimhashDebug {
  def main(args: Array[String]): Unit = {
    implicit val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val edge = Seq((1L, ""), (2L, "a  b"), (3L, "a b "), (4L, "x")).toDF("doc_id", "text")
    edge.select(col("doc_id"), graft.functions.SimHash.column(col("text"), 16).as("native")).show()
    graft.analytics.Dedup.simhash(edge, "doc_id", col("text"), 16).show()
    edge.select(col("doc_id"), split(col("text"), " ").as("toks")).show(false)
    spark.stop()
  }
}
