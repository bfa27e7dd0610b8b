package graft

import org.apache.spark.sql.functions._

import graft.analytics.Dedup

class MinHashNativeSpec extends SparkSuite {

  test("native expression signatures equal the composed-pipeline signatures") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    val native = Dedup.minhashWideNative(docs, "doc_id", col("text"), 8, 8)
    val composed = Dedup.minhashWide(docs, "doc_id", col("text"), 8, 8)
    assert(native.count() == composed.count())
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
  }

  test("short documents (len < k) hash the whole text, like the SQL") {
    import spark.implicits._
    val tiny = Seq((1L, "abc")).toDF("doc_id", "text")
    val native = Dedup.minhashWideNative(tiny, "doc_id", col("text"), 8, 2).head()
    val composed = Dedup.minhashWide(tiny, "doc_id", col("text"), 8, 2).head()
    assert(native.getString(1) == composed.getString(1))
    assert(native.getString(2) == composed.getString(2))
  }
}
