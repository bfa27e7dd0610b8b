package graft.stream

import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryException}

import graft.core.Schema.TableSchema

/** Automated stop → re-pull → relaunch around DDL (O9 orchestration):
  * Structured Streaming plans are schema-static, so when the changelog
  * carries a DDL the reference would refresh its codec in place
  * (changelog/mysql.go:566-623) and Spark must instead RESTART the query
  * with the new schema from the same checkpoint.
  *
  * Protocol: the stage's `foreachBatch` processes rows up to the DDL
  * marker, resolves the new schema via [[SchemaFlow.onQueryEvent]], calls
  * [[RestartSignal.schemaChanged]] / [[RestartSignal.needsRepull]] and
  * throws [[SchemaRestartLoop.RestartRequested]]. The loop catches the
  * failure, resolves the next schema (re-pulling from the source catalog
  * on [[SchemaFlow.NeedsRepull]] — information_schema in the reference),
  * and relaunches. The failed micro-batch did not commit, so its rows
  * replay under the NEW schema — at-least-once, like every sink here.
  */
final class SchemaRestartLoop(repull: () => TableSchema, maxRestarts: Int = 32) {

  import SchemaRestartLoop._

  /** Drive `launch` to completion under schema restarts. Returns the
    * schema in effect at the end and the number of restarts taken.
    */
  def run(initial: TableSchema,
          launch: (TableSchema, RestartSignal) => StreamingQuery): (TableSchema, Int) = {
    var schema = initial
    var restarts = 0
    var done = false
    while (!done) {
      val signal = new RestartSignal
      val q = launch(schema, signal)
      try {
        q.awaitTermination()
        done = true
      } catch {
        case e: StreamingQueryException if isRestart(e) =>
          restarts += 1
          if (restarts > maxRestarts)
            throw new IllegalStateException(s"schema restart loop exceeded $maxRestarts", e)
          schema = signal.pending match {
            case Some(Right(next)) => next // ALTER applied locally
            case Some(Left(_)) => repull() // rename/unsupported: re-pull
            case None => throw new IllegalStateException("restart without signal", e)
          }
      }
    }
    (schema, restarts)
  }

  private def isRestart(e: Throwable): Boolean =
    e != null && (e.isInstanceOf[RestartRequested] || isRestart(e.getCause))
}

object SchemaRestartLoop {

  /** Thrown by stage code inside foreachBatch to abort the current query
    * at a DDL boundary (the in-flight micro-batch does not commit).
    */
  final class RestartRequested(reason: String) extends RuntimeException(reason)

  /** One restart's out-of-band channel from the stage to the loop. */
  final class RestartSignal {
    @volatile private[stream] var pending: Option[Either[String, TableSchema]] = None

    /** ALTER applied locally: restart with `next`. */
    def schemaChanged(next: TableSchema): Nothing = {
      pending = Some(Right(next))
      throw new RestartRequested(s"schema changed: ${next.db}.${next.table}")
    }

    /** Schema can't be derived locally (RENAME, unsupported clause):
      * restart after a catalog re-pull.
      */
    def needsRepull(reason: String): Nothing = {
      pending = Some(Left(reason))
      throw new RestartRequested(s"repull: $reason")
    }
  }
}
