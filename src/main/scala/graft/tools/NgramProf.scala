package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object NgramProf {
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
    val docs = graft.core.Tables.documents(spark, dir)
    time("warm scan")(docs.count())
    def gramsOf(ws: org.apache.spark.sql.Column) =
      when(size(ws) >= 2, transform(sequence(lit(1), size(ws) - 1),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
        .otherwise(array().cast("array<string>"))
    // A: split inline (current shape)
    val a = docs.select(col("doc_id"), explode(gramsOf(split(col("text"), " "))).as("gram"))
    time("A inline split")(a.count())
    time("A inline split (warm)")(a.count())
    // B: split materialized in a prior projection
    val b = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), explode(gramsOf(col("ws"))).as("gram"))
    time("B projected split")(b.count())
    time("B projected split (warm)")(b.count())
    spark.stop()
  }
}
