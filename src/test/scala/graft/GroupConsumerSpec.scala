package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._

import graft.pipes.{LoopbackPipe, TopicGroup}

/** In-process consumer-group redistribution (the reference's own
  * rebalance model — pipe/kafka.go:226-292 redistributeConsumers):
  * partitions of a topic split contiguously among registered consumers,
  * re-split live on every join/leave, offsets persisted out-of-band.
  * Proven under real thread concurrency: consumers join and leave while
  * pumps are mid-flight; the union of everything consumed must be the
  * exact produced set.
  */
class GroupConsumerSpec extends SparkSuite {
  import spark.implicits._

  private val conf = new Configuration()

  private def mkTopic(n: Int, nParts: Int): String = {
    val dir = Files.createTempDirectory("graft-group-topic").toString
    val df = (0 until n).map(i => (i.toLong, s"k$i", s"""{"seq":$i}"""))
      .toDF("ord", "key", "value")
    LoopbackPipe.produce(df, dir, nParts, col("ord"),
      partitionCol = Some(pmod(col("ord"), lit(nParts))))
    dir
  }

  private def drainInto(c: TopicGroup#GroupConsumer,
                        sink: ConcurrentLinkedQueue[(Int, Long)],
                        upTo: Int): Thread = {
    val t = new Thread(() => {
      var got = 0
      var idle = 0
      while (got < upTo && idle < 50) {
        c.poll(100) match {
          case Some(r) => sink.add((r.partition, r.offset)); got += 1; idle = 0
          case None => idle += 1
        }
      }
    })
    t.setDaemon(true)
    t.start()
    t
  }

  test("contiguous split arithmetic matches the reference shape") {
    // 8 partitions over 3 consumers: the kafka.go:245-289 loop yields
    // sizes that differ by at most 1 and cover every partition once
    val topic = mkTopic(80, 8)
    val g = new TopicGroup(topic, "g-split", conf)
    try {
      val sinks = (1 to 3).map { _ =>
        val q = new ConcurrentLinkedQueue[(Int, Long)]()
        val c = g.newConsumer()
        (c, q)
      }
      val threads = sinks.map { case (c, q) => drainInto(c, q, 80) }
      threads.foreach(_.join(15000))
      val perConsumer = sinks.map(_._2.size)
      assert(perConsumer.sum == 80, s"all records consumed, got $perConsumer")
      // every consumer owns at least one partition's worth
      assert(perConsumer.forall(_ > 0), s"empty consumer in $perConsumer")
      val all = sinks.flatMap(_._2.toArray.map(_.asInstanceOf[(Int, Long)]))
      assert(all.toSet.size == 80, "no duplicates")
    } finally g.close()
  }

  test("live join and graceful leave: no loss, no duplicates") {
    val n = 4000
    val topic = mkTopic(n, 8)
    val g = new TopicGroup(topic, "g-live", conf)
    try {
      val seen = new ConcurrentLinkedQueue[(Int, Long)]()
      val c1 = g.newConsumer()
      val c2 = g.newConsumer()
      val t1 = drainInto(c1, seen, n)
      val t2 = drainInto(c2, seen, n)
      // let the first pair make progress, then join a third mid-flight
      Thread.sleep(150)
      val c3 = g.newConsumer()
      val t3 = drainInto(c3, seen, n)
      Thread.sleep(150)
      // c2 leaves GRACEFULLY mid-flight: its partitions move with exact
      // next offsets — the hand-off must not lose the in-flight record
      c2.close()
      Seq(t1, t3).foreach(_.join(20000))
      t2.join(2000)
      val all = seen.toArray.map(_.asInstanceOf[(Int, Long)]).toVector
      assert(all.size == all.toSet.size,
        s"graceful rebalance duplicated ${all.size - all.toSet.size} records")
      assert(all.toSet.size == n, s"lost ${n - all.toSet.size} of $n records")
      // per-partition coverage is gapless
      all.groupBy(_._1).foreach { case (p, rs) =>
        val offs = rs.map(_._2).sorted
        assert(offs == (0L until offs.size.toLong).toVector,
          s"partition $p offsets not gapless: ${offs.take(5)}...")
      }
    } finally g.close()
  }

  test("crash (non-graceful leave) re-delivers from the persisted offset: at-least-once, never loss") {
    val n = 2000
    val topic = mkTopic(n, 4)
    // persist every 50 records so the crash rewind window is visible
    val g = new TopicGroup(topic, "g-crash", conf, persistInterval = 50L)
    try {
      val seen = new ConcurrentLinkedQueue[(Int, Long)]()
      val c1 = g.newConsumer()
      val c2 = g.newConsumer()
      val t1 = drainInto(c1, seen, n)
      val t2 = drainInto(c2, seen, n)
      Thread.sleep(200)
      c2.kill() // vanish without committing
      t1.join(20000)
      t2.join(2000)
      // a successor must re-read the uncommitted window: duplicates are
      // allowed (at-least-once), loss is not, and coverage is complete
      val all = seen.toArray.map(_.asInstanceOf[(Int, Long)]).toVector
      assert(all.toSet.size == n, s"crash lost ${n - all.toSet.size} of $n records")
      all.groupBy(_._1).foreach { case (p, rs) =>
        val offs = rs.map(_._2).toSet.toVector.sorted
        assert(offs == (0L until offs.size.toLong).toVector,
          s"partition $p coverage not gapless after crash")
      }
    } finally g.close()
  }

  test("offsets persist to the group store and a new group instance resumes") {
    val n = 600
    val topic = mkTopic(n, 4)
    val g1 = new TopicGroup(topic, "g-resume", conf, persistInterval = 10L)
    val firstSeen = new ConcurrentLinkedQueue[(Int, Long)]()
    try {
      val c = g1.newConsumer()
      val t = drainInto(c, firstSeen, n)
      t.join(20000)
      c.close() // graceful: exact next offsets persisted
    } finally g1.close()
    assert(firstSeen.size == n)
    val committed = LoopbackPipe.committedGroup(topic, "g-resume", conf)
    val ends = LoopbackPipe.endOffsets(topic, conf)
    assert(committed == ends,
      s"graceful close must persist exact end offsets: $committed vs $ends")
    // a NEW group instance (process restart) starts at the committed
    // offsets: nothing is re-delivered from a fully-consumed topic
    val g2 = new TopicGroup(topic, "g-resume", conf)
    try {
      val c2 = g2.newConsumer()
      assert(c2.poll(300).isEmpty, "restart re-delivered committed records")
      c2.close()
    } finally g2.close()
  }
}
