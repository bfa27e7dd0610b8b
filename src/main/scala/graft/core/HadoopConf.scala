package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** Ship the session's Hadoop configuration into tasks.
  *
  * `Configuration` is not serializable, and a bare `new Configuration()`
  * on an executor silently drops everything set programmatically on the
  * session (s3a credentials, kerberos settings, endpoint overrides) —
  * the job then authenticates differently on driver and executors. Every
  * pipe stage and DSv2 source therefore captures [[ship]] on the driver
  * and calls [[rebuild]] inside the task.
  */
object HadoopConf {

  /** Driver side: flatten the session's Hadoop conf to serializable
    * entries for the task closure / input partition.
    */
  def ship(spark: SparkSession): Seq[(String, String)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val it = conf.iterator()
    val b = Seq.newBuilder[(String, String)]
    while (it.hasNext) { val e = it.next(); b += ((e.getKey, e.getValue)) }
    b.result()
  }

  /** Driver side, for code without a session handle (DSv2 planning). */
  def shipActive(): Seq[(String, String)] =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(ship).getOrElse(Seq.empty)

  /** Task side: rebuild a Configuration from shipped entries. */
  def rebuild(entries: Seq[(String, String)]): Configuration = {
    val conf = new Configuration(false)
    entries.foreach { case (k, v) => conf.set(k, v) }
    conf
  }

  /** Driver-side convenience when a live Configuration is needed and a
    * session may or may not exist (falls back to defaults).
    */
  def active(): Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration).getOrElse(new Configuration())
}
