package graft.stream

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming dedup: emit each key's row only the first time it is
  * seen, tracked with `flatMapGroupsWithState` (SURVEY §2.6 — the
  * reference has no stateful streaming; this is the north-star extension
  * point for exactly-once-per-key pipelines).
  *
  * State per key is a single Boolean with an idle timeout, so the state
  * store holds one bit per distinct key seen within the retention window —
  * the streaming analogue of exact dedup, bounded by timeout rather than
  * corpus size.
  */
object StatefulDedup {

  final case class Keyed(key: String, payload: String)

  final case class Ordered(key: String, ord: Long, payload: String)

  /** Deterministic variant: per key, emit the LOWEST-`ord` row of the
    * first micro-batch in which the key appears (later batches emit
    * nothing). Iterator order inside a batch no longer matters, so the
    * output is reproducible — which also makes it oracle-checkable when
    * the whole input arrives in one batch (then it's exactly
    * "row_number() over (partition by key order by ord) = 1").
    */
  def firstSeenOnlyOrdered(spark: SparkSession, ds: Dataset[Ordered],
                           idleTimeoutMs: Long = 3600 * 1000L): Dataset[Ordered] = {
    import spark.implicits._
    val timeout =
      if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Boolean, Ordered](OutputMode.Append, timeout) {
        (_: String, rows: Iterator[Ordered], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            Iterator.empty
          } else {
            state.update(true)
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            Iterator.single(rows.minBy(_.ord))
          }
      }
  }

  /** @param idleTimeoutMs state retention; <= 0 disables the timeout
    *                      (unbounded state — fine for tests/small key
    *                      spaces; production sets a retention window so a
    *                      micro-batch keeps firing to expire idle keys)
    */
  def firstSeenOnly(spark: SparkSession, ds: Dataset[Keyed],
                    idleTimeoutMs: Long = 3600 * 1000L): Dataset[Keyed] = {
    import spark.implicits._
    val timeout =
      if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Boolean, Keyed](OutputMode.Append, timeout) {
        (key: String, rows: Iterator[Keyed], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            // GroupState cancels the previously-set timeout on every
            // invocation — re-arm it or the key's state lives forever
            // (also gives sliding idle-timeout semantics)
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            Iterator.empty // key already emitted
          } else {
            state.update(true)
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            rows.take(1) // first occurrence only, even within a batch
          }
      }
  }
}
