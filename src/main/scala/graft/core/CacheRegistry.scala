package graft.core

import org.apache.spark.sql.DataFrame

/** Harness-side cleanup for per-query persisted intermediates.
  *
  * Some catalog queries persist a corpus-sized intermediate (e.g.
  * dsirSelect's DISK_ONLY gram stream) that must stay cached until the
  * caller materializes the returned DataFrame — so the query itself
  * cannot unpersist. Without cleanup, a long-lived session running the
  * catalog repeatedly accumulates dead cached blocks on executor disk.
  * Queries register such handles here; Verify/Bench release them after
  * each query's result is written.
  */
object CacheRegistry {
  private val handles = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  def register(df: DataFrame): DataFrame = { handles.add(df); df }

  /** Unpersist every registered handle (non-blocking) and clear. */
  def releaseAll(): Unit = {
    var df = handles.poll()
    while (df != null) {
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () }
      df = handles.poll()
    }
  }
}
