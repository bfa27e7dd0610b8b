package graft.stream

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Liveness watchdog (O12).
  *
  * The reference kills the changelog reader when no event or heartbeat
  * arrives within `ChangelogWatchdogInterval` (300 s —
  * /root/reference/changelog/mysql.go:885-908). On Spark the signal is
  * `StreamingQueryListener` progress events; a driver health loop calls
  * `stalled()` and restarts (or alerts on) the listed queries.
  */
class Watchdog(stallAfterMs: Long = 300 * 1000L) extends StreamingQueryListener {

  private val lastProgress = new ConcurrentHashMap[java.util.UUID, Long]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    lastProgress.put(e.id, System.currentTimeMillis())

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
    lastProgress.put(e.progress.id, System.currentTimeMillis())

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    lastProgress.remove(e.id)

  /** Query ids with no progress within the stall window. */
  def stalled(nowMs: Long = System.currentTimeMillis()): Seq[java.util.UUID] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[java.util.UUID]
    lastProgress.forEach { (id, at) =>
      if (nowMs - at > stallAfterMs) out += id
    }
    out.toSeq
  }
}
