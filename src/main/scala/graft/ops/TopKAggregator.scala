package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregator: keeps only k (score, id) pairs per
  * group in the aggregation buffer.
  *
  * The window-function top-k (`row_number <= k`) sorts every partition of
  * every group; this `Aggregator` carries at most k elements per partial
  * buffer through the map-side combine, so a billion-row group costs
  * O(n log k) and ships k rows per partition — the shape a 100 TB top-k
  * needs. Used as a `TypedColumn` on `KeyValueGroupedDataset.agg`.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  override def zero: List[(Double, Long)] = Nil

  private def trim(xs: List[(Double, Long)]): List[(Double, Long)] =
    xs.sortBy { case (s, id) => (-s, id) }.take(k)

  override def reduce(buf: List[(Double, Long)], in: (Double, Long)): List[(Double, Long)] =
    // cheap guard: skip the sort when the candidate can't enter a full buffer
    if (buf.lengthCompare(k) >= 0 && in._1 <= buf.last._1) buf
    else trim(in :: buf)

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
