package graft

import java.net.URI

import org.apache.hadoop.fs.{Path => HPath, RawLocalFileSystem}
import org.apache.spark.sql.functions._

import graft.pipes.{CryptoStage, FileSink}

/** A scheme-addressed Hadoop FileSystem that is NOT `file:` — locally
  * backed but resolved purely through `fs.graftfs.impl` configuration,
  * the same mechanism `hdfs://` and `s3a://` use. Registered on the
  * session conf and shipped to executors via [[graft.core.HadoopConf]];
  * if config shipping dropped the impl key, every task below would fail
  * with "No FileSystem for scheme: graftfs".
  */
class GraftFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("graftfs:///")
  override def getScheme: String = "graftfs"
}

/** K3/K4 smoke: the file sink, `_DONE` manifest pass and both crypto
  * stages run against a scheme URI resolved via configuration, proving
  * the path from sink to executors carries scheme + conf the way an
  * HDFS/S3 deployment needs (the reference's hdfs/s3 pipes reuse its
  * file producer the same way — pipe/hdfs.go:37-180, pipe/s3.go:44-268).
  */
class SchemeFsSpec extends SparkSuite {

  private def withScheme[A](f: String => A): A = {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftfs.impl", classOf[GraftFs].getName)
    conf.set("fs.graftfs.impl.disable.cache", "true")
    val dir = java.nio.file.Files.createTempDirectory("graft-schemefs").toString
    f(s"graftfs://$dir")
  }

  test("file sink + _DONE manifest over a config-registered scheme URI") {
    withScheme { base =>
      val out = s"$base/sink"
      val df = spark.range(0, 1000)
        .select(col("id"), (col("id") % 7).as("grp"))
      val manifest = FileSink.write(df.toDF(), out, format = "json", maxRecordsPerFile = 300)
      assert(manifest.nonEmpty)
      assert(manifest.map(_.numRecs).sum === 1000L)
      // _DONE must exist ON THE SCHEME FS and list every data file
      val p = new HPath(s"$out/_DONE")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.getScheme === "graftfs")
      assert(fs.exists(p))
      val done = new String(
        { val in = fs.open(p); try in.readAllBytes() finally in.close() }, "UTF-8")
      manifest.foreach(m => assert(done.contains(m.fileName)))
      // read back through Spark over the scheme URI
      assert(spark.read.json(out).count() === 1000L)
    }
  }

  test("PGP crypto stage round-trips over the scheme URI (task-side conf rebuild)") {
    withScheme { base =>
      val out = s"$base/enc"
      spark.range(0, 50).select(to_json(struct(col("id"))).as("value"))
        .write.mode("overwrite").text(out)
      assert(CryptoStage.encryptDirPgp(spark, out, "pw") > 0)
      val fs = new HPath(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val names = fs.listStatus(new HPath(out)).map(_.getPath.getName)
      assert(names.exists(_.endsWith(".gpg")))
      assert(!names.exists(n => n.startsWith("part-") && n.endsWith(".txt")))
      assert(CryptoStage.decryptDirPgp(spark, out, "pw") > 0)
      assert(spark.read.text(out).count() === 50L)
    }
  }

  test("JCA crypto stage (sign+encrypt) also runs over the scheme URI") {
    withScheme { base =>
      val out = s"$base/enc2"
      spark.range(0, 20).select(to_json(struct(col("id"))).as("value"))
        .write.mode("overwrite").text(out)
      val producer = CryptoStage.generateKeyPair()
      val consumer = CryptoStage.generateKeyPair()
      assert(CryptoStage.encryptDir(spark, out, consumer.getPublic, producer.getPrivate) > 0)
      assert(CryptoStage.decryptDir(spark, out, consumer.getPrivate, producer.getPublic) > 0)
      assert(spark.read.text(out).count() === 20L)
    }
  }
}
