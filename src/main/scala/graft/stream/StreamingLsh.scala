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

  def firstInBucket(spark: SparkSession, ds: Dataset[BandRow]): Dataset[BandHit] = {
    import spark.implicits._
    ds.groupByKey(r => r.band + ":" + r.bandKey)
      .flatMapGroupsWithState[Long, BandHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[BandRow], state: GroupState[Long]) =>
          var minSeen = state.getOption.getOrElse(Long.MaxValue)
          val out = rows.toSeq.sortBy(_.docId).map { r =>
            val hit = minSeen < r.docId
            if (r.docId < minSeen) minSeen = r.docId
            BandHit(r.docId, r.band, hit)
          }
          state.update(minSeen)
          out.iterator
      }
  }
}
