package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.RowKey
import graft.encode.CommonFormatJson
import graft.pipes.FileSink
import graft.state.StateStore

/** Driver-side coordinator: the Spark equivalent of the reference's worker
  * loop (O1, /root/reference/main.go:57-66) + streamer start
  * (/root/reference/streamer/streamer.go:224-310).
  *
  * For each unsynced registration: run the snapshot phase (batch), then the
  * changelog phase (Structured Streaming), encode to the registered output
  * format, write through the pipe, mark synced. Task leases (O2) are not
  * needed — one driver owns all queries; `ClusterConcurrency` (O11) is
  * [[ClusterLimiter]]: wrap `runTask` in `limiter.withSlot(spark, cluster)`
  * to cap concurrent tasks per source cluster and tag their jobs into a
  * per-cluster FAIR pool.
  */
class Coordinator(spark: SparkSession, state: StateStore, outRoot: String) {

  /** Process one registration end-to-end over fixture data:
    * snapshot → seqno-sentinel rows → changelog expansion with epoch
    * seqnos → CF-JSON → file pipe with `_DONE` manifest.
    *
    * @param snapshot  the consistent-snapshot DataFrame (JDBC or parquet)
    * @param changelog streaming DataFrame with `op` + payload columns
    * @param pkCols    primary key column names (row-key source)
    */
  def runTask(reg: StateStore.Registration, snapshot: DataFrame,
              changelog: DataFrame, pkCols: Seq[String], orderCols: Seq[String],
              checkpoint: String): Seq[FileSink.Manifest] = {
    val payloadCols = snapshot.columns.toSeq
    val outDir = s"$outRoot/${reg.cluster}.${reg.db}.${reg.table}.v${reg.version}"

    // Phase 1: snapshot with sentinel seqno (snapshot/mysql.go:301)
    val snapRows = Streamer.snapshotPhase(snapshot)
    val snapEncoded = encodeCf(snapRows, pkCols, payloadCols)
    val snapManifest = FileSink.write(snapEncoded, s"$outDir/snapshot", "json")

    // Phase 2: changelog (consumer offsets start from checkpoint created
    // before/with the snapshot — micro-batch replay covers the fence gap)
    val logManifest = scala.collection.mutable.ArrayBuffer.empty[FileSink.Manifest]
    val q = Streamer.changelogPhase(changelog, orderCols, checkpoint, (batch, epoch) => {
      val enc = encodeCf(batch, pkCols, payloadCols)
      logManifest ++= FileSink.write(enc, s"$outDir/log/epoch=$epoch", "json")
    })
    q.awaitTermination()

    state.markSynced(reg.key)
    snapManifest ++ logManifest
  }

  private def encodeCf(df: DataFrame, pkCols: Seq[String], payloadCols: Seq[String]): DataFrame =
    df.select(CommonFormatJson.encodeRows(df, pkCols, payloadCols).as("value"))
}
