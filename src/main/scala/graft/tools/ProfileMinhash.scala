package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.analytics.Dedup

object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(s"$name: ${(System.nanoTime() - t0) / 1e9}")
    }
    val d = Tables.documents(spark, dir)
    // warmup
    d.count()
    time("docs count")(d.count())
    val sh = Dedup.shingles(d, "doc_id", col("text"), 8)
    time("shingles count")(sh.write.format("noop").mode("overwrite").save())
    time("shingles+md5")(sh.select(col("doc_id"), md5(col("shingle")).as("h"))
      .write.format("noop").mode("overwrite").save())
    time("group 1 min")(sh.select(col("doc_id"), md5(col("shingle")).as("h"))
      .groupBy("doc_id").agg(min(col("h"))).write.format("noop").mode("overwrite").save())
    time("full wide")(Dedup.minhashWide(d, "doc_id", col("text"), 8, 8)
      .write.format("noop").mode("overwrite").save())
    time("full wide 2nd")(Dedup.minhashWide(d, "doc_id", col("text"), 8, 8)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
