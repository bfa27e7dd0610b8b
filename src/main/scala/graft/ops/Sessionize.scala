package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: a new session starts when the gap to the
  * previous event of the same user exceeds `gapMs`.
  *
  * One shuffle on the user key; both windows share the same partitioning so
  * Spark reuses the exchange. Streaming equivalent: `session_window()` in
  * Structured Streaming (graft.stream).
  */
object Sessionize {

  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 idCol: String, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col("tms"), col(idCol))
    events
      .withColumn("tms", unix_millis(col(tsCol)))
      .withColumn("prev", lag(col("tms"), 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("tms") - col("prev") > gapMs, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Per-session rollup: event count and first event id. */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   idCol: String, gapMs: Long): DataFrame =
    sessionize(events, userCol, tsCol, idCol, gapMs)
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"), min(col(idCol)).as("first_event"))
}
