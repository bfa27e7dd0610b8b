package graft.tools

object OneExplain {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    println(graft.SparkEntry.queries(q)(s, sf).queryExecution.executedPlan.toString)
    s.stop()
  }
}
