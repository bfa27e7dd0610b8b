package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session across all suites (JVM-wide, lazily built). */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSuite extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  lazy val spark: SparkSession = SharedSpark.spark
  val sf0001 = "/root/testdata/sf0.001"

  // Library-level pins (cappedPairs, lshVerifiedPairs, ngramJaccard, …)
  // register persisted handles at plan-construction time and rely on the
  // harness calling releaseAll after each query; test sessions get the
  // same hygiene here so a long suite run doesn't accumulate dead cached
  // handles until JVM exit (r19 ADVICE item 4).
  override def afterAll(): Unit = {
    try graft.core.CacheRegistry.releaseAll() finally super.afterAll()
  }
}
