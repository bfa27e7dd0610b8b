package graft

import java.nio.file.Files

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.pipes.S3Server

/** The S3 wire path (K4): [[graft.pipes.S3FileSystem]] speaking the
  * public S3 REST protocol to a loopback [[S3Server]] — streaming
  * multipart boundaries, ranged reads, Hadoop rename-as-copy, recursive
  * delete, and the reference's small-object single-PUT degradation
  * (pipe/s3.go:44-268).
  */
class S3WireSpec extends SparkSuite {

  private val partSize = 64 * 1024 // shrink so small fixtures cross parts

  private def withFs(body: (S3Server, FileSystem) => Unit): Unit = {
    val backing = Files.createTempDirectory("graft-s3-spec").toFile
    val srv = new S3Server(backing)
    try {
      val conf = new org.apache.hadoop.conf.Configuration(false)
      conf.set("fs.gs3.impl", "graft.pipes.S3FileSystem")
      conf.setInt("fs.gs3.multipart.size", partSize)
      conf.setBoolean("fs.gs3.impl.disable.cache", true)
      val fs = FileSystem.get(new java.net.URI(s"gs3://127.0.0.1:${srv.port}/"), conf)
      try body(srv, fs) finally fs.close()
    } finally srv.close()
  }

  private def writeBytes(fs: FileSystem, p: Path, data: Array[Byte]): Unit = {
    val out = fs.create(p, true)
    try out.write(data) finally out.close()
  }

  private def readBytes(fs: FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val b = new Array[Byte](8192)
      var r = in.read(b)
      while (r >= 0) { if (r > 0) buf.write(b, 0, r); r = in.read(b) }
      buf.toByteArray
    } finally in.close()
  }

  private def pattern(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 31 + 7) & 0xff).toByte)

  test("multipart boundaries: empty, sub-part, exact multiple, multiple+tail") {
    withFs { (srv, fs) =>
      val cases = Seq(
        "empty" -> 0,
        "small" -> (partSize - 1), // stays under one part -> single PUT
        "exact1" -> partSize, // exactly one part -> multipart with 1 part
        "exact3" -> (3 * partSize), // exact multiple: no tail part
        "tail" -> (2 * partSize + 17)) // straddles: 2 full parts + tail
      val before = (srv.multipartCreates.get, srv.partsUploaded.get, srv.singlePuts.get)
      cases.foreach { case (name, n) =>
        val p = new Path(s"gs3://127.0.0.1:${srv.port}/data/mp/$name.bin")
        val data = pattern(n)
        writeBytes(fs, p, data)
        val back = readBytes(fs, p)
        assert(back.length == n, s"$name: length ${back.length} != $n")
        assert(java.util.Arrays.equals(back, data), s"$name: bytes differ")
        assert(fs.getFileStatus(p).getLen == n)
      }
      val creates = srv.multipartCreates.get - before._1
      val parts = srv.partsUploaded.get - before._2
      val puts = srv.singlePuts.get - before._3
      // empty + small -> single PUTs; exact1 (1 part), exact3 (3), tail (3)
      assert(puts == 2, s"single PUTs: $puts")
      assert(creates == 3, s"multipart creates: $creates")
      assert(parts == 1 + 3 + 3, s"parts uploaded: $parts")
      assert(srv.multipartCompletes.get >= 3)
    }
  }

  test("ranged reads: seek + positioned read never re-fetch the object") {
    withFs { (srv, fs) =>
      val p = new Path(s"gs3://127.0.0.1:${srv.port}/data/ranged.bin")
      val data = pattern(3 * partSize + 123)
      writeBytes(fs, p, data)
      val in = fs.open(p)
      try {
        // tail read (parquet footer shape)
        val tail = new Array[Byte](64)
        in.readFully(data.length - 64L, tail)
        assert(java.util.Arrays.equals(tail,
          java.util.Arrays.copyOfRange(data, data.length - 64, data.length)))
        // mid-object seek + sequential read
        in.seek(partSize.toLong + 11)
        val mid = new Array[Byte](1000)
        in.readFully(mid)
        assert(java.util.Arrays.equals(mid,
          java.util.Arrays.copyOfRange(data, partSize + 11, partSize + 11 + 1000)))
        // the ranged protocol moved far fewer bytes than 3 whole objects
        assert(srv.bytesOut.get < 3L * data.length)
      } finally in.close()
    }
  }

  test("rename is server-side copy (no client bytes) and delete prunes the tree") {
    withFs { (srv, fs) =>
      val base = s"gs3://127.0.0.1:${srv.port}/data"
      val srcDir = new Path(s"$base/stage")
      fs.mkdirs(srcDir)
      val names = Seq("a.bin", "sub/b.bin", "sub/c.bin")
      names.foreach(n => writeBytes(fs, new Path(srcDir, n), pattern(1000 + n.length)))
      val sent = srv.bytesIn.get
      assert(fs.rename(srcDir, new Path(s"$base/final")))
      // server-side COPY: renaming moved zero object bytes through the client
      assert(srv.bytesIn.get == sent, "rename pushed data through the client")
      names.foreach { n =>
        val p = new Path(s"$base/final/$n")
        assert(fs.getFileStatus(p).getLen == 1000 + n.length)
        assert(java.util.Arrays.equals(readBytes(fs, p), pattern(1000 + n.length)))
      }
      intercept[java.io.FileNotFoundException](fs.getFileStatus(new Path(s"$base/stage/a.bin")))
      // listStatus sees files and the sub-directory
      val ls = fs.listStatus(new Path(s"$base/final")).map(_.getPath.getName).sorted
      assert(ls.toSeq == Seq("a.bin", "sub"))
      // recursive delete clears everything
      assert(fs.delete(new Path(s"$base/final"), true))
      intercept[java.io.FileNotFoundException](fs.getFileStatus(new Path(s"$base/final")))
    }
  }

  test("paginated ListObjectsV2: multi-page walks are complete and page " +
    "boundaries never split a CommonPrefixes run") {
    val backing = Files.createTempDirectory("graft-s3-page").toFile
    val srv = new S3Server(backing)
    try {
      val conf = new org.apache.hadoop.conf.Configuration(false)
      conf.set("fs.gs3.impl", "graft.pipes.S3FileSystem")
      conf.setBoolean("fs.gs3.impl.disable.cache", true)
      conf.setInt("fs.gs3.list.page", 3) // force many pages over the fixture
      val fs = FileSystem.get(new java.net.URI(s"gs3://127.0.0.1:${srv.port}/"), conf)
      try {
        val base = s"gs3://127.0.0.1:${srv.port}/data/paged"
        // 11 files + 4 subdirs of 3 files each = 23 keys, page size 3:
        // listStatus must roll each subdir into ONE dir entry even when
        // its keys straddle page boundaries, and report every file
        val files = (0 until 11).map(i => f"f$i%02d.bin")
        files.foreach(n => writeBytes(fs, new Path(s"$base/$n"), pattern(64)))
        val dirs = Seq("d0", "d1", "d2", "d3")
        for (d <- dirs; i <- 0 until 3)
          writeBytes(fs, new Path(s"$base/$d/part$i.bin"), pattern(32))
        val ls = fs.listStatus(new Path(base))
        val (dirSt, fileSt) = ls.partition(_.isDirectory)
        assert(fileSt.map(_.getPath.getName).sorted.toSeq == files,
          "paginated list dropped or duplicated files")
        assert(dirSt.map(_.getPath.getName).sorted.toSeq == dirs,
          "delimiter rollup broke across a page boundary")
        // recursive delete must enumerate ALL pages, not just the first,
        // and sweep them in ONE batched DeleteObjects request (23 keys
        // ≤ the 1000-key cap), not 23 per-key round-trips
        val batchesBefore = srv.batchDeletes.get
        assert(fs.delete(new Path(base), true))
        assert(srv.batchDeletes.get == batchesBefore + 1,
          s"expected one DeleteObjects batch, got ${srv.batchDeletes.get - batchesBefore}")
        intercept[java.io.FileNotFoundException](fs.getFileStatus(new Path(base)))
        assert(fs.listStatus(new Path(s"gs3://127.0.0.1:${srv.port}/data")).isEmpty)
      } finally fs.close()
    } finally srv.close()
  }

  test("keys with literal '%', '+', and spaces round-trip (Spark partition escaping)") {
    withFs { (srv, fs) =>
      val base = s"gs3://127.0.0.1:${srv.port}/data/esc"
      // Spark writes partition values percent-escaped INTO the path:
      // ts=2020-01-01 00%3A00%3A00 has a literal '%' and a space;
      // lang=C++ has literal '+'
      val names = Seq(
        "ts=2020-01-01 00%3A00%3A00/part-0.bin",
        "lang=C++/part-0.bin",
        "a+b %c/mixed +%2B.bin")
      names.zipWithIndex.foreach { case (n, i) =>
        writeBytes(fs, new Path(s"$base/$n"), pattern(100 + i))
      }
      names.zipWithIndex.foreach { case (n, i) =>
        val p = new Path(s"$base/$n")
        assert(fs.getFileStatus(p).getLen == 100 + i, s"HEAD $n")
        assert(java.util.Arrays.equals(readBytes(fs, p), pattern(100 + i)),
          s"GET $n returned wrong bytes")
      }
      // rename crosses the copy-source header with the same encoding
      assert(fs.rename(new Path(base), new Path(s"$base-moved")))
      names.zipWithIndex.foreach { case (n, i) =>
        assert(java.util.Arrays.equals(
          readBytes(fs, new Path(s"$base-moved/$n")), pattern(100 + i)),
          s"post-rename $n")
      }
      assert(fs.delete(new Path(s"$base-moved"), true))
    }
  }

  test("spark parquet round-trip over gs3:// (committer rename path)") {
    withFs { (srv, fs) =>
      val conf = spark.sparkContext.hadoopConfiguration
      conf.set("fs.gs3.impl", "graft.pipes.S3FileSystem")
      conf.setInt("fs.gs3.multipart.size", partSize)
      conf.setBoolean("fs.gs3.impl.disable.cache", true)
      val out = s"gs3://127.0.0.1:${srv.port}/data/pq"
      val df = spark.range(0, 5000).selectExpr("id", "id * 3 AS v")
      df.write.mode("overwrite").parquet(out)
      val back = spark.read.parquet(out)
      assert(back.count() == 5000)
      assert(back.selectExpr("sum(v)").collect()(0).getLong(0) == 3L * (4999L * 5000 / 2))
    }
  }
}
