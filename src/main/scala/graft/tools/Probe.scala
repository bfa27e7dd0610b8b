package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print fixture schemas as Spark sees them. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- graft.core.Tables.all) {
      try {
        val df = graft.core.Tables.load(spark, "/root/testdata/sf0.001", t)
        println(s"== $t: ${df.schema.map(f => f.name + ":" + f.dataType.simpleString).mkString(", ")}")
        if (t == "events" || t == "lineitem" || t == "embeddings") df.show(2, 60, vertical = false)
      } catch { case e: Throwable => println(s"== $t FAILED: ${e.getMessage.take(300)}") }
    }
    spark.stop()
  }
}
