package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range (interval) join: `points` rows whose `ts` falls inside a
  * `ranges` row's `[start, end]` interval.
  *
  * Spark plans a bare `ts BETWEEN start AND end` predicate as a
  * BroadcastNestedLoopJoin (or a cartesian when neither side fits in
  * memory) — the classic interval-join trap at scale. The banding trick
  * makes it a HASH join: explode each range over the fixed-width buckets
  * it spans, bucket each point once, equi-join on the bucket id, then
  * re-check the exact predicate. Each (point, range) match is found in
  * exactly one bucket — the point's — so no dedup pass is needed.
  *
  * Scale: shuffle keys are bucket ids; range fan-out is
  * ceil(len/width)+1, so pick `bucketWidth` near the TYPICAL range
  * length (fan-out stays small while buckets stay selective). Skewed hot
  * buckets fall to AQE skew-split like any hash join.
  */
object RangeJoin {

  /** @param points      rows with a numeric/long `tsCol`
    * @param ranges      rows with numeric `startCol`/`endCol` (inclusive)
    * @param bucketWidth band width in the same units as `tsCol`
    */
  def bucketed(points: DataFrame, tsCol: String,
               ranges: DataFrame, startCol: String, endCol: String,
               bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val rangeBuckets = ranges
      .withColumn("_bucket", explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        floor(col(endCol) / bucketWidth).cast("long"))))
    val pointBuckets = points
      .withColumn("_bucket", floor(col(tsCol) / bucketWidth).cast("long"))
    pointBuckets.join(rangeBuckets, Seq("_bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bucket")
  }
}
