package graft.stream

import java.util.concurrent.Semaphore
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Cluster concurrency limiter (O11): the reference caps how many
  * snapshot/streamer tasks may hit one source cluster at a time
  * (`lock`/`pool` cluster locks, /root/reference/lock/lock.go +
  * config `cluster_concurrency`). On Spark the driver owns all jobs, so
  * the cap is a per-cluster semaphore around job submission, and each
  * cluster's jobs are tagged into their own scheduler pool
  * (`spark.scheduler.pool` local property) so a saturated cluster's
  * queued work cannot starve other clusters under the FAIR scheduler.
  *
  * Scale note: the semaphore bounds DRIVER-side job submission per source
  * cluster — that is the resource being protected (source DB connections),
  * not Spark executor slots, which the scheduler pools arbitrate.
  */
final class ClusterLimiter(maxConcurrentPerCluster: Int) {
  require(maxConcurrentPerCluster > 0)

  private val slots = TrieMap.empty[String, Semaphore]
  private val active = TrieMap.empty[String, AtomicInteger]

  private def sem(cluster: String): Semaphore =
    slots.getOrElseUpdate(cluster, new Semaphore(maxConcurrentPerCluster, true))

  /** Currently running tasks for a cluster. */
  def running(cluster: String): Int =
    active.get(cluster).map(_.get()).getOrElse(0)

  /** Run `f` holding one of the cluster's slots; blocks while the cluster
    * is at its cap. Inside, Spark jobs land in the `cluster-<name>` FAIR
    * pool; the pool property is restored on exit so unrelated work on the
    * same thread is unaffected.
    */
  def withSlot[A](spark: SparkSession, cluster: String)(f: => A): A = {
    val s = sem(cluster)
    s.acquire()
    val counter = active.getOrElseUpdate(cluster, new AtomicInteger())
    counter.incrementAndGet()
    val prevPool = spark.sparkContext.getLocalProperty("spark.scheduler.pool")
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"cluster-$cluster")
    try f
    finally {
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", prevPool)
      counter.decrementAndGet()
      s.release()
    }
  }
}
