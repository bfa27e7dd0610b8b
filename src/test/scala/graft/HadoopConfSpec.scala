package graft

import graft.core.HadoopConf

/** The credential-preservation contract behind every task-side FileSystem
  * access: programmatic session settings must survive the ship → rebuild
  * round-trip (a bare `new Configuration()` on an executor drops them).
  */
class HadoopConfSpec extends SparkSuite {

  test("programmatic session settings survive ship -> rebuild") {
    val hc = spark.sparkContext.hadoopConfiguration
    val key = "graft.test.fs.secret"
    hc.set(key, "s3cr3t-value")
    try {
      val entries = HadoopConf.ship(spark)
      assert(entries.exists(_._1 == key))
      val rebuilt = HadoopConf.rebuild(entries)
      assert(rebuilt.get(key) == "s3cr3t-value")
      // a bare Configuration would NOT have it — that's the bug class
      assert(new org.apache.hadoop.conf.Configuration().get(key) == null)
      // shipActive resolves through the active session
      assert(HadoopConf.shipActive().exists(_._1 == key))
      assert(HadoopConf.active().get(key) == "s3cr3t-value")
    } finally hc.unset(key)
  }
}
