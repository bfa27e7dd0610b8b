package graft.stream

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash-LSH index maintenance: band-bucket state tracks the
  * lowest doc id ever seen per (band, band_key); each arriving document
  * is flagged per band when its bucket already held an earlier document.
  * This is the streaming twin of the batch signature store
  * (`QueriesLayout.incrIndex`) — the index stays current per micro-batch
  * at per-delta cost, the property that makes near-dup gating viable on
  * an ingest stream.
  *
  * State is ONE long per occupied bucket (no member lists), so the store
  * grows with distinct buckets, not corpus size; production bounds it
  * with a retention timeout exactly like [[StatefulDedup]].
  *
  * Determinism: rows are folded in doc-id order within each group and
  * the replay is range-split by doc id, so "an earlier document" means
  * the same thing on every batch boundary — the streaming output equals
  * the batch first-in-bucket computation bit-for-bit (the DuckDB oracle
  * for q_stream_neardup).
  */
object StreamingLsh {

  final case class BandRow(band: Int, bandKey: String, docId: Long)

  final case class BandHit(docId: Long, band: Int, hit: Boolean)

  /** @param idleTimeoutMs bucket-state retention; <= 0 disables the
    *                      timeout (unbounded state — right for bounded
    *                      replays and tests; production sets a retention
    *                      window, same contract as [[StatefulDedup]],
    *                      so buckets idle past the window are evicted
    *                      and the store tracks the ACTIVE corpus)
    */
  /** The per-group fold, exposed for direct unit testing with
    * `TestGroupState` (the timed-out branch cannot be driven
    * deterministically through a live stream).
    */
  private[graft] def foldGroup(rows: Iterator[BandRow], state: GroupState[Long],
                               idleTimeoutMs: Long): Iterator[BandHit] =
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      var minSeen = state.getOption.getOrElse(Long.MaxValue)
      val out = rows.toSeq.sortBy(_.docId).map { r =>
        val hit = minSeen < r.docId
        if (r.docId < minSeen) minSeen = r.docId
        BandHit(r.docId, r.band, hit)
      }
      state.update(minSeen)
      // GroupState cancels the previously-set timeout on every
      // invocation — re-arm for sliding idle-window semantics
      if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
      out.iterator
    }

  def firstInBucket(spark: SparkSession, ds: Dataset[BandRow],
                    idleTimeoutMs: Long = 0L): Dataset[BandHit] = {
    import spark.implicits._
    val timeout =
      if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(r => r.band + ":" + r.bandKey)
      .flatMapGroupsWithState[Long, BandHit](OutputMode.Append, timeout) {
        (_: String, rows: Iterator[BandRow], state: GroupState[Long]) =>
          foldGroup(rows, state, idleTimeoutMs)
      }
  }
}
