package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.changelog.BinlogWire
import graft.changelog.BinlogWire._
import graft.sources.BinlogFixture

/** The fixture layer auto-detects the binary binlog format and yields the
  * same logical [[BinlogFixture.Event]] stream the JSON log produces, so
  * the DSv2 source (offsets, admission, replay) is format-agnostic.
  */
class BinlogBinaryFixtureSpec extends AnyFunSuite {

  private val uuidA = "3e11fa47-71ca-11e1-9e33-c80aa9429562"

  private val table = TableDef("graft", "t1", Seq(
    Col("id", T.LONGLONG),
    Col("name", T.VARCHAR, meta = 64)))

  test("binary log reads back as logical events (auto-detected), JSON log unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft-binfix").toString
    val bin = s"$dir/log.binlog"
    def img(id: Long, name: String): IndexedSeq[Any] =
      IndexedSeq(java.lang.Long.valueOf(id), name)
    BinlogFixture.writeBinary(bin, Iterator(
      Txn(uuidA, 1L, 1700000001000L, table, Seq(Row("insert", None, Some(img(1, "a"))))),
      Txn(uuidA, 2L, 1700000002000L, table, Seq(
        Row("update", Some(img(1, "a")), Some(img(1, "b"))),
        Row("delete", Some(img(2, "x")), None))),
      Ddl(uuidA, 3L, 1700000003000L, "graft", "ALTER TABLE t1 ADD COLUMN c INT")))
    val events = BinlogFixture.read(bin)
    assert(events.map(_.op) === Vector("insert", "update", "delete", "ddl"))
    assert(events.map(_.gno) === Vector(1L, 2L, 2L, 3L))
    assert(events.forall(_.uuid == uuidA))
    // seq = log position: strictly increasing and unique
    assert(events.map(_.seq) === events.map(_.seq).sorted)
    assert(events.map(_.seq).distinct.size === events.size)
    val ins = events(0)
    assert(ins.db === "graft" && ins.tbl === "t1" && ins.ts === 1700000001000L)
    assert(ins.before === null)
    assert(ins.payload === """{"id":1,"name":"a"}""")
    val upd = events(1)
    assert(upd.before === """{"id":1,"name":"a"}""")
    assert(upd.payload === """{"id":1,"name":"b"}""")
    val del = events(2)
    assert(del.before === null)
    assert(del.payload === """{"id":2,"name":"x"}""") // delete carries its image
    val ddl = events(3)
    assert(ddl.payload === "ALTER TABLE t1 ADD COLUMN c INT")
    assert(ddl.tbl === "")
    // index path (offset planning) sees the same (uuid, gno) sequence
    assert(BinlogFixture.readIndex(bin).map(_._2) === Vector(1L, 2L, 2L, 3L))
  }

  test("segmented (rotated) log replays identically to the single-file encode") {
    val root = java.nio.file.Files.createTempDirectory("graft-binfix-seg").toString
    def img(id: Long, name: String): IndexedSeq[Any] =
      IndexedSeq(java.lang.Long.valueOf(id), name)
    val txns = (1L to 9L).map { g =>
      Txn(uuidA, g, 1700000000000L + g * 1000, table,
        Seq(Row("insert", None, Some(img(g, s"n$g")))))
    }
    // single ordered file
    val one = s"$root/one.binlog"
    BinlogFixture.writeBinary(one, txns.iterator)
    // 3 rotated segments, each a complete log with its own FD event;
    // plus one EMPTY segment (a range partition can be empty)
    val segDir = s"$root/segs"
    BinlogFixture.writeBinary(s"$segDir/seg-00000.binlog", txns.take(3).iterator)
    BinlogFixture.writeBinary(s"$segDir/seg-00001.binlog", txns.slice(3, 6).iterator)
    BinlogFixture.writeBinary(s"$segDir/seg-00002.binlog", Iterator.empty)
    BinlogFixture.writeBinary(s"$segDir/seg-00003.binlog", txns.drop(6).iterator)
    val a = BinlogFixture.read(one)
    val b = BinlogFixture.read(segDir)
    // identical logical stream modulo seq (log positions are per-file)
    def key(e: BinlogFixture.Event) = (e.uuid, e.gno, e.op, e.db, e.tbl, e.ts, e.before, e.payload)
    assert(a.map(key) === b.map(key))
    // offset planning sees the identical (uuid, gno) index
    assert(BinlogFixture.readIndex(one) === BinlogFixture.readIndex(segDir))
    // the directory read is cached and invalidated like a file read:
    // rewriting one segment must miss the stale entry
    assert(BinlogFixture.readCached(segDir).size === 9)
    BinlogFixture.writeBinary(s"$segDir/seg-00002.binlog",
      Iterator(Txn(uuidA, 100L, 1700000099000L, table,
        Seq(Row("insert", None, Some(img(100, "late")))))))
    val re = BinlogFixture.readCached(segDir)
    assert(re.size === 10)
    assert(re.map(_.gno).slice(6, 7) === Vector(100L))
  }

  test("JSON fixture path still round-trips (format sniffing does not break it)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-binfix-json").toString
    val p = s"$dir/log.jsonl"
    val e = BinlogFixture.Event(7L, uuidA, 4L, "insert", "d", "t", 123L, null, """{"x":1}""")
    BinlogFixture.write(p, Seq(e))
    assert(BinlogFixture.read(p) === Vector(e))
  }
}
