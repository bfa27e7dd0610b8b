package graft.sources

import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}

/** DataSource-V2 custom metrics for the wire sources — the Spark-native
  * surface for the counters the reference's pipes export through its
  * metrics package (events/bytes per consumer, fetch round trips):
  * declared on the `Scan` via `supportedCustomMetrics`, emitted per task
  * from `PartitionReader.currentMetricsValues`, summed by the engine and
  * shown in the SQL UI per stage — no side channel, no driver
  * aggregation code.
  */
object SourceMetrics {

  final class RowsEmitted extends CustomSumMetric {
    override def name(): String = "graftRowsEmitted"
    override def description(): String = "rows emitted by the source reader"
  }

  final class BytesRead extends CustomSumMetric {
    override def name(): String = "graftBytesRead"
    override def description(): String = "payload bytes decoded by the source reader"
  }

  final class WireRequests extends CustomSumMetric {
    override def name(): String = "graftWireRequests"
    override def description(): String = "wire round trips (dumps / fetches) issued"
  }

  final case class Task(metricName: String, current: () => Long) extends CustomTaskMetric {
    override def name(): String = metricName
    override def value(): Long = current()
  }

  val supported: Array[CustomMetric] =
    Array(new RowsEmitted, new BytesRead, new WireRequests)
}
