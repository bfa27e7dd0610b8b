package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.changelog.GtidSet
import graft.sources.{BinlogFixture, GtidOffset}

class GtidSetSpec extends SparkSuite {

  test("sequential GNOs extend the last interval (incGTID hot path)") {
    // /root/reference/changelog/mysql.go:718-752: l.Stop++ on sequential
    val s = (1L to 5L).foldLeft(GtidSet.empty)((acc, g) => acc.add("u1", g))
    assert(s.serialize == "u1:1-5")
    assert(s.txnCount == 5)
  }

  test("non-sequential GNO opens a new interval; later fill-in merges") {
    val s = GtidSet.empty.add("u1", 1).add("u1", 2).add("u1", 5)
    assert(s.serialize == "u1:1-2:5")
    val merged = s.add("u1", 3).add("u1", 4)
    assert(merged.serialize == "u1:1-5")
  }

  test("multi-uuid sets serialize sorted (SortedGTIDString parity)") {
    // /root/reference/util/util.go:200-217
    val s = GtidSet.empty.add("bbb", 1).add("aaa", 7).add("aaa", 8)
    assert(s.serialize == "aaa:7-8,bbb:1")
    assert(GtidSet.parse(s.serialize) == s)
  }

  test("parse round-trips single and range intervals; contains/subsetOf") {
    val s = GtidSet.parse("u1:1-3:9,u2:4")
    assert(s.contains("u1", 2) && s.contains("u1", 9) && s.contains("u2", 4))
    assert(!s.contains("u1", 4) && !s.contains("u3", 1))
    assert(GtidSet.parse("u1:2-3").subsetOf(s))
    assert(!s.subsetOf(GtidSet.parse("u1:1-3")))
    assert(s.serialize == "u1:1-3:9,u2:4")
  }

  test("duplicate add is a no-op (replayed transaction)") {
    val s = GtidSet.empty.add("u1", 1).add("u1", 2).add("u1", 1)
    assert(s.serialize == "u1:1-2")
  }
}

class BinlogSourceSpec extends SparkSuite {

  private def fixtureEvents: Seq[BinlogFixture.Event] = {
    // 3 transactions on u1, 2 on u2; txn u1:2 has two row events (update
    // demuxed with before image), plus a DDL event in its own txn
    def ev(seq: Long, uuid: String, gno: Long, op: String, before: String, payload: String) =
      BinlogFixture.Event(seq, uuid, gno, op, "db1", "t1", 1700000000L + seq, before, payload)
    Seq(
      ev(0, "u1", 1, "insert", null, """{"k":1,"v":"a"}"""),
      ev(1, "u2", 1, "insert", null, """{"k":2,"v":"b"}"""),
      ev(2, "u1", 2, "update", """{"k":1,"v":"a"}""", """{"k":1,"v":"a2"}"""),
      ev(3, "u1", 2, "delete", null, """{"k":9,"v":"gone"}"""),
      ev(4, "u2", 2, "ddl", null, "ALTER TABLE t1 ADD f2 INT"),
      ev(5, "u1", 3, "insert", null, """{"k":3,"v":"c"}"""))
  }

  private def writeFixture(): String = {
    val path = Files.createTempDirectory("graft-binlog").toString + "/binlog.jsonl"
    BinlogFixture.write(path, fixtureEvents)
    path
  }

  test("replays the full log through DSv2 with GTID-set offsets") {
    val path = writeFixture()
    val ckpt = Files.createTempDirectory("graft-binlog-ckpt").toString
    val out = spark.readStream.format("graft-binlog").option("path", path).load()
    val q = out.writeStream.format("memory").queryName("binlog_all")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("binlog_all").collect()
    assert(rows.length == 6)
    val bySeq = rows.sortBy(_.getAs[Long]("seq"))
    assert(bySeq.map(_.getAs[String]("op")).toSeq ==
      Seq("insert", "insert", "update", "delete", "ddl", "insert"))
    // update carries its before image; inserts don't
    assert(bySeq(2).getAs[String]("before") == """{"k":1,"v":"a"}""")
    assert(bySeq(0).getAs[String]("before") == null)
  }

  test("maxEventsPerTrigger batches on transaction boundaries") {
    val path = writeFixture()
    val ckpt = Files.createTempDirectory("graft-binlog-ckpt2").toString
    val offsets = scala.collection.mutable.ArrayBuffer.empty[String]
    val out = spark.readStream.format("graft-binlog").option("path", path)
      .option("maxEventsPerTrigger", "2").load()
    val q = out.writeStream.format("memory").queryName("binlog_batched")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("binlog_batched").count() == 6)
    // committed offsets are GTID sets; the final one covers the whole log
    val offsetDir = new java.io.File(ckpt, "offsets")
    val last = offsetDir.listFiles().map(_.getName).filter(_.forall(_.isDigit)).map(_.toInt).max
    val lastJson = new String(Files.readAllBytes(
      new java.io.File(offsetDir, last.toString).toPath))
    val gtidLine = lastJson.linesIterator.toSeq.last
    val set = GtidOffset.fromJson(gtidLine).set
    assert(set.serialize == "u1:1-3,u2:1-2")
    // txn u1:2 has 2 rows; with cap=2 it must land in ONE batch (no split)
    assert(last >= 2, s"expected multiple micro-batches, got ${last + 1}")
  }

  test("empty binlog: stream completes with zero rows") {
    val path = Files.createTempDirectory("graft-binlog-empty").toString + "/binlog.jsonl"
    BinlogFixture.write(path, Seq.empty)
    val ckpt = Files.createTempDirectory("graft-binlog-empty-ckpt").toString
    val q = spark.readStream.format("graft-binlog").option("path", path).load()
      .writeStream.format("memory").queryName("binlog_empty")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("binlog_empty").count() == 0)
  }

  test("gtid set scales: 100k transactions with gaps stay interval-compact") {
    // every 1000th gno missing -> ~100 intervals, not 100k entries
    var s = GtidSet.empty
    (1L to 100000L).foreach(g => if (g % 1000 != 0) s = s.add("u1", g))
    assert(s.txnCount == 100000 - 100)
    assert(s.serialize.count(_ == ':') <= 101) // interval-compressed
    assert(GtidSet.parse(s.serialize) == s)
  }

  test("graceful restart: resumes mid-stream from the checkpointed GTID set") {
    // /root/reference/changelog/mysql_test.go:876 TestGracefulRestart shape:
    // consume a prefix, stop, append more, restart — no loss, no dup.
    val dir = Files.createTempDirectory("graft-binlog-restart")
    val path = dir.toString + "/binlog.jsonl"
    val ckpt = dir.toString + "/ckpt"
    val outDir = dir.toString + "/out"
    val first = fixtureEvents.take(4)
    BinlogFixture.write(path, first)

    def runOnce(): Unit = {
      val out = spark.readStream.format("graft-binlog").option("path", path)
        .option("maxEventsPerTrigger", "3").load()
      val q = out.writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    runOnce()
    assert(spark.read.parquet(outDir).count() == 4)

    // append the rest of the log (the "master kept writing while down")
    BinlogFixture.write(path, fixtureEvents)
    runOnce()
    // the restarted query resumes from the checkpointed GTID set: the
    // final output holds every event exactly once — no loss, no replay
    val all = spark.read.parquet(outDir).collect()
    assert(all.map(_.getAs[Long]("seq")).sorted.toSeq == (0L to 5L))
    assert(all.map(_.getAs[Long]("seq")).distinct.length == 6)
  }
}
