package graft.tools

import org.apache.spark.sql.functions._

object PrPlanProbe {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("prplan")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def aqeOff[T](f: => T): T = {
      s.conf.set("spark.sql.adaptive.enabled", "false")
      try f finally s.conf.set("spark.sql.adaptive.enabled", "true")
    }
    val pairs = Seq.tabulate(200)(i => (i.toLong % 20, i.toLong % 7 + 100)).toDF("c", "p")
    val edges = aqeOff {
      pairs.select(col("c").as("src"), col("p").as("dst"))
        .unionAll(pairs.select(col("p").as("src"), col("c").as("dst")))
        .repartition(col("src")).sortWithinPartitions(col("src"))
        .localCheckpoint()
    }
    // mimic a round output: agg by node then checkpoint
    val ranks0 = aqeOff {
      edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
        .withColumn("base", lit(1000L)).withColumn("r", lit(10000L))
        .localCheckpoint()
    }
    val round = graft.QueriesGraph.pagerankRound(ranks0, edges)
    val p = round.queryExecution.executedPlan.toString
    val ex = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    val so = p.linesIterator.count(_.contains("Sort ["))
    println(s"round1: exchanges=$ex sorts=$so")
    val ranks1 = aqeOff { round.localCheckpoint() }
    val round2 = graft.QueriesGraph.pagerankRound(ranks1, edges)
    val p2 = round2.queryExecution.executedPlan.toString
    val ex2 = p2.linesIterator.count(_.contains("Exchange hashpartitioning"))
    val so2 = p2.linesIterator.count(_.contains("Sort ["))
    println(s"round2: exchanges=$ex2 sorts=$so2")
    println(p2)
    s.stop()
  }
}
