package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming analytics operators (north-star extensions; the reference has
  * ordering+fencing but no event-time semantics — SURVEY §2.6).
  *
  * Each operator is defined once and works in BOTH batch and streaming
  * mode (same DataFrame expressions), which is how the specs verify them:
  * replay the fixture through MemoryStream/file-source and assert the
  * streaming result equals the batch result.
  *
  * Scale: windowed aggregation state is bounded by the watermark — late
  * data past `delay` is dropped and state evicted; at 1000 executors the
  * state store partitions on the grouping key like any shuffle.
  */
object StreamOps {

  /** Tumbling event-time window aggregation with watermark. */
  def windowedCounts(events: DataFrame, tsCol: String, width: String,
                     delay: String, extraKeys: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy((window(col(tsCol), width) +: extraKeys.map(col)): _*)
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select((Seq(unix_millis(col("window.start")).as("win_start_ms")) ++
        extraKeys.map(col) ++ Seq(col("n"), col("value_cents"))): _*)

  /** Event-time session windows (gap-based) per user — the streaming form
    * of graft.ops.Sessionize.
    */
  def sessionWindows(events: DataFrame, tsCol: String, userCol: String,
                     gap: String, delay: String): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("first_event"))
      .select(col(userCol),
        unix_millis(col("session_window.start")).as("sess_start_ms"),
        col("n_events"), col("first_event"))
}
