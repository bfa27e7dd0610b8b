package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.changelog.GtidSet
import graft.pipes.KafkaWire
import graft.sources.{BinlogFixture, BinlogPartitionReader, KafkaPipeInputPartition, KafkaPipePartitionReader, SourceMetrics}

/** DSv2 custom metrics on the wire sources: the names a Scan declares
  * must be exactly what its readers emit (Spark joins them by name for
  * the SQL UI), and the per-task values must reflect the actual work —
  * rows emitted, payload bytes, wire round trips.
  */
class SourceMetricsSpec extends AnyFunSuite {

  private def b(s: String) = s.getBytes("UTF-8")

  test("declared metric names match the task metrics both readers emit") {
    val declared = SourceMetrics.supported.map(_.name()).toSet
    assert(declared == Set("graftRowsEmitted", "graftBytesRead", "graftWireRequests"))
  }

  test("kafka reader counts rows, bytes, and wire fetches") {
    val broker = new KafkaWire.Broker(partitionsPerTopic = 1)
    try {
      KafkaWire.produce(broker.url, "t", 0,
        (1 to 5).map(i => (b(s"k$i"), b(s"value-$i"), i.toLong)))
      val reader = new KafkaPipePartitionReader(
        KafkaPipeInputPartition(s"${broker.url}/t", 0, 0L, 5L, Seq.empty))
      var n = 0
      while (reader.next()) { reader.get(); n += 1 }
      assert(n == 5)
      val m = reader.currentMetricsValues().map(tm => tm.name() -> tm.value()).toMap
      assert(m("graftRowsEmitted") == 5L)
      assert(m("graftBytesRead") == (1 to 5).map(i => s"k$i".length + s"value-$i".length).sum)
      assert(m("graftWireRequests") >= 1L)
      assert(m.keySet.subsetOf(SourceMetrics.supported.map(_.name()).toSet),
        "task metrics must be declared on the scan or Spark drops them")
    } finally broker.close()
  }

  test("binlog reader counts replayed rows and payload bytes") {
    val log = java.nio.file.Files.createTempDirectory("graft-srcmetrics")
      .resolve("fixture.jsonl").toString
    val uuid = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    val events = (1 to 4).map(i =>
      BinlogFixture.Event(i.toLong, uuid, i.toLong, "insert", "db", "t",
        1000L * i, null, s"""{"id":$i}"""))
    BinlogFixture.write(log, events)
    val reader = new BinlogPartitionReader(log, GtidSet.empty,
      GtidSet.parse(s"$uuid:1-4"), Seq.empty)
    var n = 0
    while (reader.next()) { reader.get(); n += 1 }
    assert(n == 4)
    val m = reader.currentMetricsValues().map(tm => tm.name() -> tm.value()).toMap
    assert(m("graftRowsEmitted") == 4L)
    assert(m("graftBytesRead") == events.map(_.payload.length).sum)
    assert(m("graftWireRequests") == 0L, "file path: no socket dial")
  }
}
