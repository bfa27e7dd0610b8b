package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev: drive GraftExtensions through a real session + SQL surface. */
object SqlDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("lineitem")
    spark.sql("""
      SELECT l_orderkey, l_linenumber,
             graft_row_key(cast(l_orderkey as string), cast(l_linenumber as string)) AS rk
      FROM lineitem LIMIT 3""").show(false)
    println("extension function resolved: " +
      spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_row_key")))
    spark.stop()
  }
}
