package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.stream.Streamer

case class Cdc(op: String, ts: Long, id: Long, k: Long, v: String)

class StreamerSpec extends SparkSuite {
  import spark.implicits._

  test("changelog phase: updates expand, seqnos monotone across epochs") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Cdc]
    val results = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val ckpt = Files.createTempDirectory("graft-ckpt").toString

    stream.addData(
      Cdc("insert", 1, 1, 100, "a"),
      Cdc("update", 2, 2, 100, "b"),
      Cdc("delete", 3, 3, 100, null))

    val q = Streamer.changelogPhase(stream.toDF(), Seq("ts", "id"), ckpt,
      (batch, _) => results += batch.cache())
    q.awaitTermination()

    val rows = results.flatMap(_.collect()).sortBy(_.getAs[Long]("seqno"))
    // 1 insert + (delete+insert) + 1 delete = 4 physical events
    assert(rows.map(r => (r.getAs[String]("op"), r.getAs[Long]("id"))).toSeq ==
      Seq(("insert", 1L), ("delete", 2L), ("insert", 2L), ("delete", 3L)))
    // delete-half of the update precedes its insert-half in seqno order
    val seqnos = rows.map(_.getAs[Long]("seqno"))
    assert(seqnos == seqnos.sorted && seqnos.distinct.length == seqnos.length)

    // second batch: epoch increments keep seqnos monotone (restart-safe)
    val stream2Results = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    stream.addData(Cdc("insert", 4, 4, 101, "c"))
    val q2 = Streamer.changelogPhase(stream.toDF(), Seq("ts", "id"), ckpt,
      (batch, _) => stream2Results += batch.cache())
    q2.awaitTermination()
    val laterSeqnos = stream2Results.flatMap(_.collect()).map(_.getAs[Long]("seqno"))
    assert(laterSeqnos.nonEmpty && laterSeqnos.min > seqnos.max)
  }

  test("snapshot + changelog merge resolves latest-by-seqno with tombstones") {
    val snapshot = Streamer.snapshotPhase(
      Seq((100L, "old"), (200L, "keep")).toDF("k", "v"))
    val log = Seq(
      ("insert", 100L, "new", 5L), // overwrites snapshot state
      ("insert", 300L, "born", 6L),
      ("delete", 300L, null, 7L)) // tombstone wins over its insert
      .toDF("op", "k", "v", "seqno").withColumn("half", lit(1))
    val merged = Streamer.resolveLatest(
      snapshot.select("op", "k", "v", "seqno", "half").unionByName(log),
      keyCols = Seq("k"), orderCols = Seq("seqno", "half"))
    val got = merged.select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(100L -> "new", 200L -> "keep"))
  }
}

/** A second FileSystem scheme backed by RawLocalFileSystem — instantiated
  * by Hadoop reflection from `fs.graftfs.impl`, so sink/manifest/crypto
  * stages prove they address storage exclusively through the scheme-
  * resolved Hadoop FS API (the K3/K4 hdfs:///s3a:// shape).
  */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}

class FileSinkSpec extends SparkSuite {
  import spark.implicits._
  import graft.pipes.FileSink

  test("json sink writes _DONE manifest with per-file sha256 + record counts") {
    val dir = Files.createTempDirectory("graft-sink").toString + "/out"
    val df = Seq.tabulate(100)(i => (i.toLong, s"v$i")).toDF("k", "v").repartition(2)
    val manifest = FileSink.write(df, dir, format = "json")
    assert(manifest.nonEmpty)
    assert(manifest.map(_.numRecs).sum == 100)
    // verify a recorded hash against the file on disk
    val m = manifest.head
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(dir, m.fileName))
    val h = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
      .map("%02x".format(_)).mkString
    assert(h == m.hash)
    // _DONE content parses as the reference's [{NumRecs,Hash,FileName}] array
    val done = new String(Files.readAllBytes(java.nio.file.Paths.get(dir, "_DONE")))
    assert(done.startsWith("""[{"NumRecs":"""))
    assert(done.contains(m.fileName))
  }

  test("size rotation: maxRecordsPerFile bounds every output file") {
    // pipe/file.go:598-602 rotates on size; Spark's equivalent knob is
    // maxRecordsPerFile, and the manifest must account for every rotated
    // file with no loss
    val dir = Files.createTempDirectory("graft-sinkrot").toString + "/out"
    val df = Seq.tabulate(1000)(i => (i.toLong, s"v$i")).toDF("k", "v").coalesce(1)
    val manifest = FileSink.write(df, dir, format = "json", maxRecordsPerFile = 100)
    assert(manifest.size >= 10, s"expected rotation, got ${manifest.size} files")
    assert(manifest.forall(_.numRecs <= 100))
    assert(manifest.map(_.numRecs).sum == 1000)
    // every manifest entry names a real file
    manifest.foreach(m =>
      assert(Files.exists(java.nio.file.Paths.get(dir, m.fileName)), m.fileName))
  }

  test("sink + manifest + crypto run against a second FileSystem scheme (K3/K4 path)") {
    // hdfs:// and s3a:// differ from file:// only by which FileSystem impl
    // the scheme resolves to through the (shipped) Hadoop configuration.
    // Registering a custom scheme backed by RawLocalFileSystem exercises
    // exactly that resolution path end-to-end: if any stage bypassed the
    // Hadoop FS API (java.io, hardcoded file:), the graftfs:// run breaks.
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    val crypto = graft.pipes.CryptoStage
    val producer = crypto.generateKeyPair()
    val consumer = crypto.generateKeyPair()
    for (scheme <- Seq("file://", "graftfs://")) {
      val local = Files.createTempDirectory(s"graft-scheme").toString
      val dir = s"$scheme$local/out"
      val df = Seq.tabulate(50)(i => s"""{"k":$i}""").toDF("value").repartition(2)
      val manifest = FileSink.write(df, dir, format = "text")
      assert(manifest.map(_.numRecs).sum == 50, s"$scheme manifest")
      // _DONE landed through the scheme's FileSystem
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.isInstanceOf[GraftTestFs] == (scheme == "graftfs://"), fs.getClass)
      assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "_DONE")), s"$scheme _DONE")
      // crypto stages resolve the same scheme inside executor tasks via
      // the shipped configuration
      val nEnc = crypto.encryptDir(spark, dir, consumer.getPublic, producer.getPrivate)
      assert(nEnc == manifest.size, s"$scheme encrypted $nEnc")
      assert(crypto.decryptDir(spark, dir, consumer.getPrivate, producer.getPublic) == nEnc)
      val back = spark.read.text(dir)
      assert(back.count() == 50, s"$scheme readback")
    }
  }

  test("gzip json sink hashes stored files and round-trips through the reader") {
    val dir = Files.createTempDirectory("graft-sinkgz").toString + "/out"
    val manifest = FileSink.write(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir, format = "json", gzip = true)
    assert(manifest.exists(_.fileName.endsWith(".gz")))
    // NumRecs counts DECOMPRESSED records, not compressed-byte newlines
    assert(manifest.map(_.numRecs).sum == 2)
    // hash is over the stored (compressed) bytes
    val m = manifest.find(_.fileName.endsWith(".gz")).get
    val stored = Files.readAllBytes(java.nio.file.Paths.get(dir, m.fileName))
    val h = java.security.MessageDigest.getInstance("SHA-256").digest(stored)
      .map("%02x".format(_)).mkString
    assert(h == m.hash)
    // S4: the file consumer decompresses natively
    val back = spark.read.json(dir)
    assert(back.count() == 2)
    assert(back.filter(back("k") === 1).head().getAs[String]("v") == "a")
  }
}

class StateStoreSpec extends SparkSuite {
  import graft.state.StateStore
  import graft.state.StateStore.Registration

  test("registration lifecycle: register -> sync -> deregister") {
    val st = new StateStore(Files.createTempDirectory("graft-state").toString)
    val r = Registration("svc", "cl1", "db1", "t1", "mysql", "kafka", "json",
      params = Map("NoDeleteOnUpdate" -> "true"))
    st.register(r)
    assert(st.listRegistrations.map(_.key) == Seq(r.key))
    assert(st.listRegistrations.head.state == "unsynced")
    assert(st.listRegistrations.head.params("NoDeleteOnUpdate") == "true")
    st.markSynced(r.key)
    assert(st.listRegistrations.head.state == "synced")
    // re-register same key replaces, not duplicates (ON DUPLICATE KEY semantics)
    st.register(r.copy(outputFormat = "avro"))
    assert(st.listRegistrations.size == 1)
    assert(st.listRegistrations.head.outputFormat == "avro")
    st.deregister(r.key)
    assert(st.listRegistrations.isEmpty)
  }

  test("params with quotes, commas, colons and newlines round-trip intact") {
    // a RowFilter param is arbitrary SQL — the store must be a real JSON
    // reader, not a regex splitter
    val st = new StateStore(Files.createTempDirectory("graft-state4").toString)
    val hostile = Map(
      "RowFilter" -> """c_name LIKE "O'Brien, \"Jr\"" AND c_id IN (1,2)""",
      "note" -> "line1\nline2\ttabbed",
      "k:v,weird\"key" -> "{\"nested\":\"json\"}")
    val r = Registration("svc", "cl1", "db1", "t1", "mysql", "file", "json",
      params = hostile)
    st.register(r)
    assert(st.listRegistrations.head.params == hostile)
    // gtid/cluster strings with quotes survive the positions log too
    st.savePosition("""cl"1""", 5L, """uuid:1-3,uu"id2:7""")
    assert(st.lastPosition("""cl"1""").map(_.gtid).contains("""uuid:1-3,uu"id2:7"""))
  }

  test("schema versions: latest wins, survives json round-trip") {
    import org.apache.spark.sql.types._
    val st = new StateStore(Files.createTempDirectory("graft-state2").toString)
    val v1 = StructType(Seq(StructField("f1", LongType, nullable = false)))
    val v2 = v1.add(StructField("f2", StringType))
    st.pushSchema("db1", "t1", "gtid:1", v1)
    st.pushSchema("db1", "t1", "gtid:2", v2)
    assert(st.currentSchema("db1", "t1").contains(v2))
    assert(st.currentSchema("db1", "nope").isEmpty)
  }

  test("positions: seqno high-watermark restores monotone") {
    val st = new StateStore(Files.createTempDirectory("graft-state3").toString)
    st.savePosition("cl1", 1000000L, "uuid:1-500")
    st.savePosition("cl1", 2000000L, "uuid:1-900")
    assert(st.lastPosition("cl1").map(_.seqno).contains(2000000L))
    assert(st.lastPosition("cl1").map(_.gtid).contains("uuid:1-900"))
    assert(st.lastPosition("other").isEmpty)
  }
}
