package graft

import org.apache.spark.sql.connector.read.streaming.ReadLimit

import graft.pipes.TopicGroup
import graft.sources.{KafkaPipeGroupInputPartition, KafkaPipeMicroBatchStream, PartitionOffsets}

/** The DSv2 group mode (q_group_stream) must assign partitions with the
  * SAME contiguous split the live TopicGroup rebalancer uses, and a
  * membership change between triggers must actually re-split ownership
  * — the roundtrip oracle proves rows stay exact, this spec proves the
  * redistribution happened and matched the reference arithmetic.
  */
class KafkaGroupModeSpec extends SparkSuite {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("contiguousSplit: reference partsPerConsumer arithmetic") {
    // 8 partitions / 1 member: all to member 0
    assert(TopicGroup.contiguousSplit(8, 1).toSeq == Seq.fill(8)(0))
    // 8 / 2: contiguous halves
    assert(TopicGroup.contiguousSplit(8, 2).toSeq == Seq(0, 0, 0, 0, 1, 1, 1, 1))
    // 8 / 3: the reference's best-effort split (2, then 3, then 3)
    val s3 = TopicGroup.contiguousSplit(8, 3)
    assert(s3.toSeq.sorted == s3.toSeq, "assignment must be contiguous")
    assert(s3.distinct.length == 3, "every member owns at least one partition")
    // more members than partitions: extras receive nothing, no crash
    val s10 = TopicGroup.contiguousSplit(3, 10)
    assert(s10.length == 3 && s10.forall(m => m >= 0 && m < 10))
    // every partition assigned exactly once by construction (total map)
    assert(TopicGroup.contiguousSplit(13, 4).length == 13)
  }

  test("group-mode planInputPartitions re-splits when the member log changes") {
    // a real loopback topic: 8 partitions, a handful of records each
    val topicDir = java.nio.file.Files.createTempDirectory("graft-gmode-topic").toString
    val base = Seq.tabulate(64)(i => (i.toLong, i.toString, (i % 8).toLong, s"v$i"))
      .toDF("ord", "key", "user_id", "value")
    graft.pipes.LoopbackPipe.produce(base, topicDir, 8, col("ord"),
      partitionCol = Some(pmod(col("user_id"), lit(8))))
    val memberLog = java.nio.file.Files.createTempFile("graft-gmode-members", ".log")
    java.nio.file.Files.write(memberLog, "2\n3\n".getBytes)
    try {
      val stream = new KafkaPipeMicroBatchStream(topicDir, Some(32L),
        groupMembersLog = Some(memberLog.toString))
      val start = PartitionOffsets(Map.empty)
      val mid = stream.latestOffset(start, ReadLimit.maxRows(32L))
      def assignments(s: PartitionOffsets, e: PartitionOffsets): Map[Int, Seq[Int]] =
        stream.planInputPartitions(s, e).toSeq.map {
          case g: KafkaPipeGroupInputPartition => g.member -> g.parts.map(_.partition)
          case other => fail(s"expected group partitions, got $other")
        }.toMap
      // trigger 1: 2 members, contiguous halves of the 8 partitions
      val t1 = assignments(start, mid.asInstanceOf[PartitionOffsets])
      assert(t1.keySet == Set(0, 1), t1.toString)
      assert(t1(0) == Seq(0, 1, 2, 3) && t1(1) == Seq(4, 5, 6, 7), t1.toString)
      // trigger 2: a member joined — the SAME offsets re-split 3 ways
      val end = stream.latestOffset(mid, ReadLimit.maxRows(32L))
      val t2 = assignments(mid.asInstanceOf[PartitionOffsets],
        end.asInstanceOf[PartitionOffsets])
      assert(t2.keySet == Set(0, 1, 2), t2.toString)
      val split3 = TopicGroup.contiguousSplit(8, 3)
      val expected = (0 until 8).groupBy(split3(_)).map { case (m, ps) => m -> ps.toSeq }
      assert(t2 == expected,
        s"trigger-2 assignment must match TopicGroup.contiguousSplit: $t2 vs $expected")
      // the union of ranges is identical either way: re-splitting changes
      // WHO reads a partition, never WHAT is read
      val allParts = t2.values.flatten.toSeq.sorted
      assert(allParts == (0 until 8), allParts.toString)
    } finally java.nio.file.Files.deleteIfExists(memberLog)
  }

  test("group mode is transport-agnostic: same split over the kafka:// wire") {
    // the group split happens at planInputPartitions, above the
    // transport — prove it against a REAL wire broker, not just the
    // loopback topic dir
    val broker = new graft.pipes.KafkaWire.Broker(partitionsPerTopic = 6)
    val memberLog = java.nio.file.Files.createTempFile("graft-gmode-wire", ".log")
    java.nio.file.Files.write(memberLog, "2\n".getBytes)
    try {
      for (p <- 0 until 6)
        graft.pipes.KafkaWire.produce(s"${broker.url}/events", "events", p,
          Seq((s"k$p".getBytes, s"v$p".getBytes, 1000L)))
      val stream = new KafkaPipeMicroBatchStream(s"${broker.url}/events", None,
        groupMembersLog = Some(memberLog.toString))
      val end = stream.latestOffset(PartitionOffsets(Map.empty),
        ReadLimit.allAvailable())
      val groups = stream.planInputPartitions(PartitionOffsets(Map.empty), end)
        .toSeq.map {
          case g: KafkaPipeGroupInputPartition => g.member -> g.parts.map(_.partition)
          case other => fail(s"expected group partitions, got $other")
        }.toMap
      assert(groups.keySet == Set(0, 1), groups.toString)
      assert(groups(0) == Seq(0, 1, 2) && groups(1) == Seq(3, 4, 5), groups.toString)
    } finally {
      broker.close()
      java.nio.file.Files.deleteIfExists(memberLog)
    }
  }
}
