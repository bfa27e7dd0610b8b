package graft

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._

import graft.pipes.{FileSink, WebHdfsServer}

/** K3 over a REAL socket: Hadoop's own `WebHdfsFileSystem` client
  * (resolved from the `webhdfs://` scheme, exactly as a production
  * cluster resolves `hdfs://`) against the loopback [[WebHdfsServer]]
  * speaking the public WebHDFS REST protocol. Every byte of the sink —
  * data files, `_DONE` manifest, the rename-commit — crosses HTTP,
  * through the hadoop-client request/redirect/retry machinery the
  * config-registered local FS of SchemeFsSpec never touched.
  */
class WebHdfsSpec extends SparkSuite {

  private def withServer[A](f: WebHdfsServer => A): A = {
    val backing = java.nio.file.Files.createTempDirectory("graft-webhdfs").toFile
    val srv = new WebHdfsServer(backing)
    val conf = spark.sparkContext.hadoopConfiguration
    // FS instances cache by (scheme, authority); each test's server has a
    // fresh ephemeral port, so a cached instance would dial a dead one
    conf.set("fs.webhdfs.impl.disable.cache", "true")
    try f(srv)
    finally {
      srv.close()
      graft.core.Tmp.deleteRecursively(backing.toPath)
    }
  }

  test("file sink + _DONE manifest end-to-end through the webhdfs client") {
    withServer { srv =>
      val out = s"${srv.uri}/sink"
      val df = spark.range(0, 1000).select(col("id"), (col("id") % 7).as("grp"))
      val manifest = FileSink.write(df.toDF(), out, format = "json", maxRecordsPerFile = 300)
      assert(manifest.nonEmpty && manifest.map(_.numRecs).sum == 1000L)
      val p = new HPath(s"$out/_DONE")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.getClass.getName.contains("WebHdfsFileSystem"),
        s"must resolve to the real hadoop webhdfs client, got ${fs.getClass}")
      assert(fs.exists(p))
      val done = new String(
        { val in = fs.open(p); try in.readAllBytes() finally in.close() }, "UTF-8")
      manifest.foreach(m => assert(done.contains(m.fileName)))
      // read back through Spark over the wire (executor-side opens)
      assert(spark.read.json(out).count() === 1000L)
    }
  }

  test("a transient retriable namenode 500 is retried by the hadoop client, not surfaced") {
    withServer { srv =>
      val conf = new org.apache.hadoop.conf.Configuration(
        spark.sparkContext.hadoopConfiguration)
      // the retry policy is an explicit opt-in on the webhdfs client —
      // same posture as the reference's retry-on-Standby wrapper
      // (/root/reference/pipe/hdfs.go:37-180)
      conf.setBoolean("dfs.http.client.retry.policy.enabled", true)
      val fs = new HPath(srv.uri).getFileSystem(conf)
      srv.failNextCreates(1)
      val p = new HPath(s"${srv.uri}/retry/one.txt")
      val out = fs.create(p, true)
      out.write("payload-survives-retry".getBytes("UTF-8"))
      out.close()
      val got = new String(
        { val in = fs.open(p); try in.readAllBytes() finally in.close() }, "UTF-8")
      assert(got == "payload-survives-retry")
    }
  }

  test("positioned reads: parquet round trip (footer seek + column chunk ranges)") {
    withServer { srv =>
      val out = s"${srv.uri}/pq"
      // parquet readers SEEK: footer at the tail, then per-column ranges —
      // this drives the OPEN offset= path for real
      spark.range(0, 5000).select(col("id"), (col("id") % 13).as("m"))
        .write.mode("overwrite").parquet(out)
      val back = spark.read.parquet(out)
      assert(back.count() === 5000L)
      assert(back.agg(sum("m")).head().getLong(0) ===
        (0L until 5000L).map(_ % 13).sum)
      // and an explicit mid-file seek through the client API
      val fs = new HPath(srv.uri).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val p = new HPath(s"${srv.uri}/seek.bin")
      val os = fs.create(p, true)
      os.write(Array.tabulate[Byte](10000)(i => (i % 251).toByte))
      os.close()
      val in = fs.open(p)
      try {
        in.seek(7777L)
        val got = new Array[Byte](16)
        in.readFully(got)
        assert(got.sameElements(Array.tabulate[Byte](16)(i => ((7777 + i) % 251).toByte)))
      } finally in.close()
    }
  }

  test("missing paths surface as FileNotFoundException through RemoteException JSON") {
    withServer { srv =>
      val fs = new HPath(srv.uri).getFileSystem(spark.sparkContext.hadoopConfiguration)
      intercept[java.io.FileNotFoundException](fs.getFileStatus(new HPath(s"${srv.uri}/nope")))
      assert(!fs.exists(new HPath(s"${srv.uri}/nope")))
    }
  }
}
