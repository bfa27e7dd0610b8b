package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.{SkewJoin, TopKAggregator}
import graft.stream.StatefulDedup
import graft.stream.StatefulDedup.Keyed

class SkewJoinSpec extends SparkSuite {
  import spark.implicits._

  test("salted join produces identical results to a plain join under skew") {
    // 90% of fact rows share one hot key
    val fact = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, s"p$i")).toDF("k", "payload")
    val dim = Seq((1L, "hot"), (950L, "cold")).toDF("k", "name")
    val plain = fact.join(dim, "k").select("k", "payload", "name")
    val salted = SkewJoin.saltedJoin(fact, dim, "k", salt = 8).select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("key histogram surfaces the hot key") {
    val fact = (1 to 100).map(i => (if (i <= 90) 1L else i.toLong, i)).toDF("k", "v")
    val top = SkewJoin.keyHistogram(fact, col("k")).head()
    assert(top.getLong(0) == 1L && top.getLong(1) == 90L)
  }

  test("planned salt (one-row stats table) equals the fixed-salt join for any factor") {
    val fact = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, s"p$i")).toDF("k", "payload")
    val dim = Seq((1L, "hot"), (950L, "cold")).toDF("k", "name")
    val plain = fact.join(dim, "k").select("k", "payload", "name")
    for (f <- Seq(1, 3, 64)) {
      val saltRow = spark.range(1).select(lit(f).as("_saltf"))
      val planned = SkewJoin.saltedJoin(fact, dim, "k", saltRow)
        .select("k", "payload", "name")
      assert(planned.exceptAll(plain).isEmpty && plain.exceptAll(planned).isEmpty,
        s"salt factor $f diverged from the plain join")
    }
  }
}

class RangeJoinSpec extends SparkSuite {
  import spark.implicits._
  import graft.ops.RangeJoin

  test("banded range join equals the theta join and plans as a hash join") {
    val points = (0L until 500L).map(i => (i, i * 37L % 1000L)).toDF("id", "ts")
    val ranges = Seq((1L, 0L, 99L), (2L, 250L, 260L), (3L, 255L, 900L), (4L, 990L, 999L))
      .toDF("range_id", "lo", "hi")
    val banded = RangeJoin.bucketed(points, "ts", ranges, "lo", "hi", bucketWidth = 100L)
      .select("id", "range_id")
    val theta = points.join(ranges, col("ts") >= col("lo") && col("ts") <= col("hi"))
      .select("id", "range_id")
    assert(banded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      theta.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    // each match found exactly once (no dedup pass needed)
    assert(banded.count() == banded.distinct().count())
    // plan shape: equi hash join, NOT BroadcastNestedLoop/cartesian
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    val thetaPlan = theta.queryExecution.executedPlan.toString
    assert(thetaPlan.contains("BroadcastNestedLoopJoin") ||
      thetaPlan.contains("CartesianProduct")) // the trap the banding avoids
  }
}

class TopKAggregatorSpec extends SparkSuite {
  import spark.implicits._

  test("typed bounded top-k matches window-function top-k") {
    val data = (1 to 10000).map(i => (s"g${i % 5}", (i * 2654435761L % 99991).toDouble, i.toLong))
    val ds = data.toDF("g", "score", "id").as[(String, Double, Long)]
    val agg = new TopKAggregator(3).toColumn
    val typed = ds.groupByKey(_._1)
      .mapValues { case (_, s, id) => (s, id) }
      .agg(agg.name("topk"))
      .collect().map { case (g, hits) => g -> hits.toList }.toMap

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"score".desc, $"id")
    val viaWindow = data.toDF("g", "score", "id")
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.sortBy(r => (-r.getDouble(1), r.getLong(2)))
        .map(r => (r.getDouble(1), r.getLong(2))).toList).toMap

    assert(typed == viaWindow)
  }
}

class StatefulDedupSpec extends SparkSuite {
  import spark.implicits._

  test("ordered variant emits the lowest-ord row regardless of arrival order") {
    import graft.stream.StatefulDedup.Ordered
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ordered]
    val ckpt = Files.createTempDirectory("graft-dedup-ord-ckpt").toString
    val q = StatefulDedup.firstSeenOnlyOrdered(spark, stream.toDS(), idleTimeoutMs = 0)
      .writeStream.format("memory").queryName("dedup_ord_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      // batch 1: 'a' arrives out of order -> ord 1 must win
      stream.addData(Ordered("a", 9, "late"), Ordered("a", 1, "first"), Ordered("b", 5, "b5"))
      q.processAllAvailable()
      val got = spark.table("dedup_ord_out").as[Ordered].collect()
        .map(r => r.key -> r.ord).toMap
      assert(got == Map("a" -> 1L, "b" -> 5L))
      // batch 2: even a LOWER ord for 'a' is suppressed (first batch won)
      stream.addData(Ordered("a", 0, "earlier-but-late"))
      q.processAllAvailable()
      assert(spark.table("dedup_ord_out").count() == 2)
    } finally q.stop()
  }

  test("streaming first-seen-only dedup across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Keyed]
    val ckpt = Files.createTempDirectory("graft-dedup-ckpt").toString

    val q = StatefulDedup.firstSeenOnly(spark, stream.toDS(), idleTimeoutMs = 0)
      .writeStream.format("memory").queryName("dedup_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      stream.addData(Keyed("a", "1"), Keyed("b", "2"), Keyed("a", "3"))
      q.processAllAvailable()
      val batch1 = spark.table("dedup_out").as[Keyed].collect()
      assert(batch1.map(_.key).sorted.toSeq == Seq("a", "b"))
      assert(batch1.find(_.key == "a").get.payload == "1") // first occurrence wins

      // second micro-batch: repeats of 'a'/'b' suppressed by state, 'c' passes
      stream.addData(Keyed("a", "4"), Keyed("c", "5"), Keyed("b", "6"))
      q.processAllAvailable()
      val all = spark.table("dedup_out").as[Keyed].collect()
      assert(all.map(_.key).sorted.toSeq == Seq("a", "b", "c"))
      assert(all.find(_.key == "c").get.payload == "5")
    } finally q.stop()
  }
}
