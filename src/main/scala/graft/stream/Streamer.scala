package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.changelog.Changelog

/** Snapshot-then-stream orchestration (O3/O4/O6).
  *
  * Reference protocol (/root/reference/streamer/streamer.go:183-310):
  *  1. the changelog consumer is created BEFORE snapshotting (":196-199 —
  *     Consumer MUST be created before snapshotting the table") so no event
  *     in (fence, now] is lost;
  *  2. the snapshot waits until the source replica has caught up to the
  *     binlog reader's start GTID (waitForGtid :105-157), then scans;
  *  3. snapshot rows carry a sentinel seqno (snapshot/mysql.go:301), log
  *     rows carry the monotone per-cluster seqno; readers resolve conflicts
  *     latest-seqno-wins.
  *
  * Spark mapping: phase 1+2 collapse to "record the streaming source's
  * starting offset (checkpoint) before running the batch snapshot"; the
  * replay of buffered events comes free from micro-batch replay. Seqnos
  * are `(epochId << 32) | rowIndex` — monotone across restarts because
  * epochId is checkpointed (vs. the reference persisting the counter every
  * SeqnoSaveInterval and skipping forward — changelog/mysql.go:394-417).
  */
object Streamer {

  val SnapshotSeqno = 0L // sentinel: any log event outranks snapshot state

  /** Phase 1: batch snapshot with sentinel seqno. */
  def snapshotPhase(snapshot: DataFrame): DataFrame =
    snapshot
      .withColumn("seqno", lit(SnapshotSeqno))
      .withColumn("op", lit("insert"))
      .withColumn("half", lit(1))

  /** Phase 2: continuous changelog with expansion + durable seqnos,
    * `foreachBatch` so each micro-batch gets its epoch-scoped seqnos and
    * any pipe (file/JDBC/Kafka) can sit at the end.
    *
    * @param changelog streaming DataFrame with an `op` column
    *                  (insert/update/delete) and arbitrary payload columns
    * @param orderCols intra-batch ordering, typically (ts, event_id)
    * @param sink      called once per micro-batch with expanded rows
    */
  def changelogPhase(changelog: DataFrame, orderCols: Seq[String],
                     checkpoint: String, sink: (DataFrame, Long) => Unit): StreamingQuery =
    changelog.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val expanded = Changelog.expandUpdates(batch)
        // row index within the batch: window over the natural order cols;
        // partition-less window is fine at micro-batch scale (bounded by
        // maxOffsetsPerTrigger), NOT at table scale.
        val w = org.apache.spark.sql.expressions.Window
          .orderBy((orderCols.map(col) :+ col("half")).map(_.asc): _*)
        val withSeqno = expanded.withColumn("seqno",
          Changelog.epochSeqno(epochId + 1, row_number().over(w).cast("long")))
        sink(withSeqno, epochId)
      }
      .start()

  /** Latest-state resolution: one row per key, highest seqno wins; delete
    * tombstones drop the key (idempotent-sink semantics,
    * encoder/sql.go:133-148 last-writer-wins).
    */
  def resolveLatest(all: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col(_).desc): _*)
    all.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col("op") =!= "delete")
      .drop("_rn")
  }
}
