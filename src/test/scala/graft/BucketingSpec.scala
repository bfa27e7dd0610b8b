package graft


import org.apache.spark.sql.functions._

import graft.core.Tables

/** Bucketing: the co-located-join story at 100 TB — two fact tables
  * bucketed on the join key join WITHOUT a shuffle (no Exchange in the
  * plan), because bucket layout IS the partitioning. The one-time
  * bucketed write replaces a per-query shuffle for every downstream join
  * on that key.
  */
class BucketingSpec extends SparkSuite {

  /** DROP TABLE alone misses the case where a previous run died between
    * metastore wipe and warehouse cleanup: the catalog entry is gone but
    * the location survives, and CTAS then fails LOCATION_ALREADY_EXISTS.
    */
  private def dropHard(names: String*): Unit = names.foreach { n =>
    spark.sql(s"DROP TABLE IF EXISTS $n")
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), n)
    if (wh.exists())
      org.apache.commons.io.FileUtils.deleteDirectory(wh)
  }

  test("bucketed fact-fact join plans with zero exchanges") {
    dropHard("li_bucketed", "ord_bucketed")

    Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey"))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    // AQE would inject a broadcast at this tiny scale, masking what the
    // bucketed layout buys; disable both so the test observes the
    // shuffle-join plan shape that 100 TB facts would take.
    withSQLConf(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
      val physical = joined.queryExecution.executedPlan.toString
      val joinExchanges = physical.linesIterator
        .takeWhile(!_.contains("HashAggregate")) // up to the join output
        .count(_.contains("Exchange hashpartitioning"))
      // the JOIN itself needs no exchange (bucket-pruned); only the final
      // groupBy on o_custkey may shuffle
      assert(!planJoinHasShuffle(physical), physical)
      assert(joined.count() > 0)

      // control: the same join over unbucketed parquet DOES shuffle
      val plain = Tables.lineitem(spark, sf0001)
        .select(col("l_orderkey"), col("l_extendedprice"))
        .join(Tables.orders(spark, sf0001).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(planJoinHasShuffle(plainPlan), plainPlan)
    }
    dropHard("li_bucketed", "ord_bucketed")
  }

  /** Does any Exchange feed the SortMergeJoin's inputs? (Scan-side
    * exchanges appear between the scan and the join in the plan text.)
    */
  private def planJoinHasShuffle(plan: String): Boolean = {
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected a SortMergeJoin in:\n$plan")
    plan.substring(joinIdx).contains("Exchange hashpartitioning")
  }

  private def withSQLConf[A](pairs: (String, String)*)(f: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
