package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.analytics.{Pq, Similarity}
import graft.core.Tables

/** Debug probe: PQ candidate recall vs exact top-k. */
object PqDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("pq-debug").config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val e = Tables.embeddings(spark, dir)
    val m = Pq.train(e, col("vec_id"), col("embedding"), k = 32, iters = 8)
    val corpus = e.filter(col("vec_id") =!= 1)
    val codes = Pq.encode(corpus, col("vec_id"), col("embedding"), m)
    val query = e.filter(col("vec_id") === 1)
      .select(Similarity.quantize(col("embedding")).as("q"))
      .collect()(0).getAs[Seq[Long]]("q").toIndexedSeq
    val exact = corpus.select(col("vec_id"),
        Similarity.dotQ(Similarity.quantize(col("embedding")), typedLit(query))(spark).as("dot"))
      .orderBy(col("dot").desc, col("vec_id")).limit(12)
    println("EXACT top-12:"); exact.collect().foreach(println)
    val n = codes.count().toInt
    val full = Pq.searchTopK(corpus, col("vec_id"), col("embedding"), codes, m, query, n, 12)
    println(s"PQ candidates=$n:"); full.collect().foreach(println)
    val half = Pq.searchTopK(corpus, col("vec_id"), col("embedding"), codes, m, query, n / 2, 12)
    println(s"PQ candidates=${n / 2}:"); half.collect().foreach(println)
    val adc = Pq.adcCandidates(codes, m, query, n / 2).select(col("vec_id"))
    println("exact-top-12 MISSING from ADC half-candidates:")
    exact.select(col("vec_id")).join(adc, Seq("vec_id"), "left_anti").collect().foreach(println)
    spark.stop()
  }
}
