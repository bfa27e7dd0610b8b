package graft.tools

import org.apache.spark.sql.functions._

/** Does the CC propagate round re-shuffle the persisted edge table?
  * (The pagerank AQE-checkpoint partitioning trap, checked for the cache
  * path.) Dev scaffolding.
  */
object CcPlanProbe {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("ccplan")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val pairs = Seq.tabulate(500)(i => (i.toLong, (i + 1).toLong)).toDF("doc_a", "doc_b")
    val edges = pairs
      .select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(col("src"))
      .sortWithinPartitions(col("src"))
      .persist()
    edges.count()
    val labels = edges.groupBy(col("src").as("doc_id"))
      .agg(least(min(col("dst")), first(col("src"))).as("component"))
      .persist()
    labels.count()
    val prop = edges
      .join(labels.withColumnRenamed("doc_id", "src")
        .withColumnRenamed("component", "lab"), "src")
      .select(col("dst").as("doc_id"), col("lab"), lit(false).as("own"))
      .union(labels.select(col("doc_id"), col("component").as("lab"),
        lit(true).as("own")))
      .groupBy(col("doc_id"))
      .agg(min(col("lab")).as("half"), max(when(col("own"), col("lab"))).as("_old"))
    val p = prop.queryExecution.executedPlan.toString
    val ex = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    println(s"propagate-round exchanges=$ex")
    println(p)
    s.stop()
  }
}
