package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Per-invocation scoping for RELIABLE (checkpoint-dir) checkpoints.
  *
  * Iterative operators (PageRank, connected components) truncate lineage
  * every round; with a checkpoint dir configured each invocation writes
  * ~a dozen rdd-N trees that outlive the job unless the GC-driven
  * `spark.cleaner.referenceTracking.cleanCheckpoints` happens to fire — a
  * long-lived driver invoking them repeatedly leaks checkpoint storage
  * without bound. [[scoped]] bounds it to zero: the body checkpoints into
  * a fresh scope subdir, the result is pinned OUT of the scope into the
  * block-manager cache (replicated — tolerates a single executor loss),
  * and the whole scope is deleted before returning.
  *
  * The trade, stated plainly: after the scope is deleted the result's
  * lineage is unrecoverable, so a multi-executor-loss event fails the
  * consuming job instead of recomputing. A real pipeline consumes the
  * returned frame into a sink promptly, which is also the durable answer;
  * callers that instead hold the frame across a long gap should skip the
  * scope and manage the checkpoint dir themselves.
  */
object Checkpoints {

  /** Serializes scoped sections PER SparkContext: the checkpoint dir is a
    * context-global setting, so two concurrent scoped bodies on one
    * context would checkpoint into (and then delete) each other's scope —
    * but bodies on different contexts (multi-session tests, two apps in
    * one JVM) are independent and must not serialize against each other.
    */
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.SparkContext, Object]

  /** `setCheckpointDir` appends a fresh UUID level to whatever path it is
    * given, so "restore by re-setting" would nest one level deeper per
    * invocation; remember the first-seen resolved dir per context and
    * always scope/restore against that (the residue is one empty UUID dir
    * per restore under the user's base, not unbounded nesting).
    */
  private val firstBase =
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.SparkContext, String]

  /** First `scoped` call per context installs a listener that drops both
    * map entries when the context stops — without it a long-lived JVM
    * cycling many sessions/contexts (multi-session suites) would leak a
    * lock Object plus a SparkContext strong reference per context.
    */
  private def lockFor(sc: org.apache.spark.SparkContext): Object =
    locks.computeIfAbsent(sc, _ => {
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          locks.remove(sc); firstBase.remove(sc); ()
        }
      })
      new Object
    })

  def scoped(s: SparkSession)(body: => DataFrame): DataFrame = {
    val sc = s.sparkContext
    sc.getCheckpointDir match {
      case None => body // local dev shape: body falls back to localCheckpoint
      case Some(current) => lockFor(sc).synchronized {
        val base = firstBase.computeIfAbsent(sc, _ => current)
        val scope = new org.apache.hadoop.fs.Path(
          base, s"graft-scope-${java.util.UUID.randomUUID()}")
        sc.setCheckpointDir(scope.toString)
        try {
          val out = body
          // pin every partition into the (replicated) cache BEFORE the
          // scope backing the final round's files is deleted
          val stable = out.persist(StorageLevel.MEMORY_AND_DISK_2)
          stable.count()
          stable
        } finally {
          sc.setCheckpointDir(base)
          try {
            val fs = scope.getFileSystem(sc.hadoopConfiguration)
            fs.delete(scope, true); ()
          } catch { case _: java.io.IOException => () }
        }
      }
    }
  }
}
