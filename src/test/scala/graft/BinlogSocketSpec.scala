package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.functions._

import graft.changelog.{BinlogWire, GtidSet, MysqlRepl}
import graft.changelog.BinlogWire._
import graft.sources.BinlogFixture

/** The replication SOCKET path: a loopback server speaking the real
  * connection-phase handshake + COM_BINLOG_DUMP_GTID, and the DSv2
  * source consuming it with genuine wire-level GTID resume at every
  * micro-batch boundary — the part of `BinlogSyncer.StartSyncGTID`
  * (/root/reference/changelog/mysql.go:911-968) that file replay could
  * not exercise.
  */
class BinlogSocketSpec extends SparkSuite {

  private val uuidA = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
  private val uuidB = "aaaabbbb-cccc-dddd-eeee-ffff00001111"

  private val table = TableDef("graft", "events", Seq(
    Col("id", T.LONGLONG),
    Col("name", T.VARCHAR, meta = 64)))

  private def img(id: Long): IndexedSeq[Any] =
    IndexedSeq(java.lang.Long.valueOf(id), s"row-$id")

  /** `n` single-row transactions, alternating uuids, gno 1..n/2 each.
    * Deterministic: the first 12 events of logBytes(18) are byte-equal
    * to logBytes(12) — a grown log is a strict append, like a live
    * master's.
    */
  private def logBytes(n: Long = 12L): Array[Byte] = {
    val entries = (1L to n).map { i =>
      val uuid = if (i % 2 == 0) uuidB else uuidA
      Txn(uuid, (i + 1) / 2, 1705276800000L + i * 1000,
        table, Seq(Row("insert", None, Some(img(i)))))
    }
    val bos = new ByteArrayOutputStream()
    BinlogWire.write(bos, entries.iterator)
    bos.toByteArray
  }

  private def ids(evs: Seq[BinlogFixture.Event]): Seq[Long] =
    evs.map(e => com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      .readTree(e.payload).get("id").asLong).sorted

  test("multi-packet framing: >= 16MB-1 payloads split and rejoin, exact multiples terminate empty") {
    // a giant row image in a dump genuinely exceeds the 0xffffff frame
    // limit; the protocol splits into full frames terminated by the first
    // short frame — an EMPTY one when the payload is an exact multiple
    def roundTrip(n: Int): Unit = {
      val payload = Array.tabulate[Byte](n)(i => (i * 31 + 7).toByte)
      val out = new ByteArrayOutputStream()
      MysqlRepl.writePacket(out, 0, payload)
      val framed = out.toByteArray
      val expectFrames = n / 0xffffff + 1
      assert(framed.length == n + 4 * expectFrames, s"n=$n framed=${framed.length}")
      val (seq, back) = MysqlRepl.readPacket(new ByteArrayInputStream(framed))
      assert(seq == expectFrames - 1, "sequence id advances per frame")
      assert(java.util.Arrays.equals(back, payload), s"n=$n corrupted")
    }
    roundTrip(5)                // single short frame
    roundTrip(0xffffff)         // exact multiple: full frame + empty terminator
    roundTrip(0xffffff + 4096)  // full frame + short tail
  }

  test("SID block encode/decode round-trips (exclusive wire ends)") {
    val set = GtidSet.empty.add(uuidA, 1).add(uuidA, 2).add(uuidA, 7)
      .add(uuidB, 3)
    val back = MysqlRepl.decodeGtidSet(MysqlRepl.encodeGtidSet(set), 0)
    assert(back == set)
    assert(MysqlRepl.decodeGtidSet(MysqlRepl.encodeGtidSet(GtidSet.empty), 0) == GtidSet.empty)
  }

  test("full dump over the socket equals the file parse") {
    val bytes = logBytes()
    val srv = new MysqlRepl.Server(bytes)
    try {
      val viaSocket = BinlogWire.parse(new ByteArrayInputStream(
        MysqlRepl.dumpRaw(srv.url, GtidSet.empty)))
      val viaFile = BinlogWire.parse(new ByteArrayInputStream(bytes))
      assert(viaSocket.rows.map(r => (r.uuid, r.gno, r.row)) ==
        viaFile.rows.map(r => (r.uuid, r.gno, r.row)))
      assert(srv.dumpRequests.head.gtids.isEmpty)
    } finally srv.close()
  }

  test("server filters the dump by the client's GTID set (resume semantics)") {
    val srv = new MysqlRepl.Server(logBytes())
    try {
      // client claims uuidA:1-2 and uuidB:1 → rows 1,3 (uuidA gno 1,2)
      // and 2 (uuidB gno 1) must NOT be re-sent
      val after = GtidSet.parse(s"$uuidA:1-2,$uuidB:1")
      val evs = BinlogFixture.readSocket(srv.url, after)
      assert(ids(evs) == Seq(4L, 5L, 6L, 7L, 8L, 9L, 10L, 11L, 12L))
      assert(srv.dumpRequests.last.gtids == after)
    } finally srv.close()
  }

  test("DSv2 stream over the socket: multi-batch replay, wire-level resume per batch") {
    val bytes = logBytes()
    val srv = new MysqlRepl.Server(bytes)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-socket-ckpt")
    try {
      val q = spark.readStream.format("graft-binlog")
        .option("path", srv.url)
        .option("maxEventsPerTrigger", "3") // force >= 4 micro-batches
        .load()
        .writeStream.format("memory").queryName("graft_socket_replay")
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val got = spark.table("graft_socket_replay")
        .select(col("gtid_uuid"), col("gno"),
          get_json_object(col("payload"), "$.id").cast("long").as("id"))
        .collect()
      assert(got.map(_.getLong(2)).sorted.toSeq == (1L to 12L))
      // every micro-batch's partition reader dialed the server anew with
      // its start set: the later dumps must carry NON-empty GTID sets —
      // reconnect + resume on the wire, not a warm in-process iterator
      val dumps = srv.dumpRequests
      assert(dumps.size >= 4, s"expected >= 4 dumps (index read + >=3 batches), got ${dumps.size}")
      assert(dumps.last.gtids.txnCount >= 6,
        s"final batch should resume from most txns, resumed from: ${dumps.last.gtids}")
      assert(dumps.count(!_.gtids.isEmpty) >= 2,
        s"later batches must send their progress: ${dumps.map(_.gtids.serialize)}")
    } finally {
      srv.close()
      graft.core.Tmp.deleteRecursively(ckpt)
    }
  }

  test("a restarted stream resumes from the checkpointed GTID set over the socket") {
    val srv = new MysqlRepl.Server(logBytes())
    val ckpt = java.nio.file.Files.createTempDirectory("graft-socket-restart-ckpt")
    val out = java.nio.file.Files.createTempDirectory("graft-socket-restart-out")
    try {
      // memory sinks cannot recover a checkpoint; the file sink is the
      // restartable shape a real deployment uses
      def run(): Unit = {
        val q = spark.readStream.format("graft-binlog")
          .option("path", srv.url)
          .load()
          .writeStream.format("parquet")
          .option("path", out.toString)
          .option("checkpointLocation", ckpt.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      run() // one batch: everything
      assert(spark.read.parquet(out.toString).count() == 12L)
      // the master commits 6 more transactions; the restarted stream must
      // dump with the CHECKPOINTED set and append only the delta
      srv.log = logBytes(18)
      run()
      assert(spark.read.parquet(out.toString).count() == 18L,
        "restart must append exactly the 6 new rows, no re-replay")
      val resumed = srv.dumpRequests.filter(_.gtids.txnCount == 12)
      assert(resumed.nonEmpty,
        s"a restart dump must carry the checkpointed 12-txn set: ${srv.dumpRequests.map(_.gtids.serialize)}")
    } finally {
      srv.close()
      graft.core.Tmp.deleteRecursively(ckpt)
      graft.core.Tmp.deleteRecursively(out)
    }
  }
}
