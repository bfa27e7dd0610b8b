package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.pipes.KafkaWire

/** The real Kafka wire protocol over a live loopback socket: framing,
  * v1 message CRCs, broker-assigned offsets, produce ACKS, fetch from
  * arbitrary offsets, latest/earliest offsets, and committed group
  * offsets — the broker-side contract the file-backed loopback pipe
  * (/root/reference/pipe/kafka.go:326-577's sarama counterpart) could
  * not exercise.
  */
class KafkaWireSpec extends AnyFunSuite {

  private def b(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)
  private def s(a: Array[Byte]): String = new String(a, StandardCharsets.UTF_8)

  test("v1 message: CRC covers magic..value; a flipped byte fails loudly") {
    val msg = KafkaWire.encodeMessage(b("k"), b("hello"), 1705276800000L)
    val set = KafkaWire.encodeMessageSet(7L, Seq((b("k"), b("hello"), 1705276800000L)))
    val recs = KafkaWire.decodeMessageSet(set)
    assert(recs.map(r => (r.offset, s(r.key), s(r.value), r.ts)) ==
      Vector((7L, "k", "hello", 1705276800000L)))
    // flip one payload byte: decode must reject, not return garbage
    val corrupt = set.clone()
    corrupt(corrupt.length - 1) = (corrupt(corrupt.length - 1) ^ 0x01).toByte
    val ex = intercept[IllegalArgumentException](KafkaWire.decodeMessageSet(corrupt))
    assert(ex.getMessage.contains("CRC"))
    assert(msg.length == 4 + 1 + 1 + 8 + 4 + 1 + 4 + 5) // crc magic attrs ts keyLen key valLen val
  }

  test("ApiVersions and Metadata over the socket") {
    val broker = new KafkaWire.Broker(partitionsPerTopic = 4)
    try {
      val apis = KafkaWire.apiVersions(broker.url).map(_._1).toSet
      assert(Set(0, 1, 2, 3, 8, 9, 18).subsetOf(apis))
      assert(KafkaWire.partitionCount(broker.url, "events") == 4)
    } finally broker.close()
  }

  test("produce is ACKED with broker-assigned base offsets; fetch round-trips") {
    val broker = new KafkaWire.Broker(partitionsPerTopic = 2)
    try {
      val base0 = KafkaWire.produce(broker.url, "t", 0,
        Seq((b("u1"), b("v1"), 1000L), (b("u2"), b("v2"), 2000L)))
      assert(base0 == 0L)
      val base1 = KafkaWire.produce(broker.url, "t", 0, Seq((b("u3"), b("v3"), 3000L)))
      assert(base1 == 2L, "second produce must be acked with the APPEND position")
      assert(broker.acksSent == 2)
      val (recs, hw) = KafkaWire.fetch(broker.url, "t", 0, 0L)
      assert(hw == 3L)
      assert(recs.map(r => (r.offset, s(r.key), s(r.value), r.ts)) ==
        Vector((0L, "u1", "v1", 1000L), (1L, "u2", "v2", 2000L), (2L, "u3", "v3", 3000L)))
      // fetch from a mid offset: absolute offsets, no rebasing
      val (tail, _) = KafkaWire.fetch(broker.url, "t", 0, 2L)
      assert(tail.map(r => (r.offset, s(r.value))) == Vector((2L, "v3")))
      assert(KafkaWire.listOffset(broker.url, "t", 0) == 3L)
      assert(KafkaWire.listOffset(broker.url, "t", 0, ts = -2L) == 0L)
      assert(KafkaWire.listOffset(broker.url, "t", 1) == 0L) // untouched partition
    } finally broker.close()
  }

  test("maxBytes trims whole messages, never splits one") {
    val broker = new KafkaWire.Broker()
    try {
      (1 to 10).foreach(i => KafkaWire.produce(broker.url, "t", 0, Seq((null, b(s"value-$i"), i.toLong))))
      val (recs, hw) = KafkaWire.fetch(broker.url, "t", 0, 0L, maxBytes = 120)
      assert(hw == 10L)
      assert(recs.nonEmpty && recs.size < 10, s"expected a bounded prefix, got ${recs.size}")
      assert(recs.map(_.offset) == recs.indices.map(_.toLong))
    } finally broker.close()
  }

  test("a record larger than the fetch budget escalates maxBytes instead of dropping the range") {
    val broker = new KafkaWire.Broker(partitionsPerTopic = 1)
    try {
      // middle record exceeds the reader's 4 MiB starting budget: a fetch
      // at its offset trims to zero messages, and a reader that treated
      // that as end-of-range would silently drop it and everything after
      val big = new Array[Byte](5 << 20)
      java.util.Arrays.fill(big, 'x'.toByte)
      KafkaWire.produce(broker.url, "t", 0, Seq(
        (b("k0"), b("small"), 1L), (b("k1"), big, 2L), (b("k2"), b("tail"), 3L)))
      val reader = new graft.sources.KafkaPipePartitionReader(
        graft.sources.KafkaPipeInputPartition(s"${broker.url}/t", 0, 0L, 3L, Seq.empty))
      val seen = Iterator.continually(reader)
        .takeWhile(_.next()).map(_.get().getLong(1)).toVector
      assert(seen == Vector(0L, 1L, 2L),
        "all three offsets must come back, including past the oversized record")
    } finally broker.close()
  }

  test("group offsets: commit then fetch (SaveOffset contract over the wire)") {
    val broker = new KafkaWire.Broker()
    try {
      assert(KafkaWire.fetchOffsets(broker.url, "g1", "t", Seq(0, 1)).isEmpty)
      KafkaWire.commitOffsets(broker.url, "g1", "t", Map(0 -> 5L, 1 -> 3L))
      assert(KafkaWire.fetchOffsets(broker.url, "g1", "t", Seq(0, 1, 2)) ==
        Map(0 -> 5L, 1 -> 3L))
      // groups are isolated
      assert(KafkaWire.fetchOffsets(broker.url, "g2", "t", Seq(0, 1)).isEmpty)
      // recommit overwrites
      KafkaWire.commitOffsets(broker.url, "g1", "t", Map(0 -> 9L))
      assert(KafkaWire.fetchOffsets(broker.url, "g1", "t", Seq(0)) == Map(0 -> 9L))
    } finally broker.close()
  }
}
