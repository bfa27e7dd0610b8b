package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipes.{CryptoStage, FileSink}

/** Encrypt+sign → decrypt+verify chain through the file sink — the
  * round-trip shape of the reference's PGP pipe tests.
  */
class CryptoStageSpec extends SparkSuite {
  import spark.implicits._

  private val producer = CryptoStage.generateKeyPair() // signs
  private val consumer = CryptoStage.generateKeyPair() // decrypts

  test("payload round-trips; wrong signer key fails verification") {
    val payload = """{"seqno":1,"f1":"hello"}""".getBytes("UTF-8")
    val blob = CryptoStage.encrypt(payload, consumer.getPublic, producer.getPrivate)
    assert(!java.util.Arrays.equals(blob, payload))
    val back = CryptoStage.decrypt(blob, consumer.getPrivate, producer.getPublic)
    assert(java.util.Arrays.equals(back, payload))

    val mallory = CryptoStage.generateKeyPair()
    intercept[Exception] {
      CryptoStage.decrypt(blob, consumer.getPrivate, mallory.getPublic)
    }
  }

  test("tampered ciphertext fails GCM authentication") {
    val payload = "sensitive".getBytes("UTF-8")
    val blob = CryptoStage.encrypt(payload, consumer.getPublic, producer.getPrivate)
    blob(blob.length - 3) = (blob(blob.length - 3) ^ 0x01).toByte
    intercept[Exception] {
      CryptoStage.decrypt(blob, consumer.getPrivate, producer.getPublic)
    }
  }

  test("double encryptDir is idempotent: second pass finds nothing") {
    val dir = Files.createTempDirectory("graft-crypto-idem").toString + "/out"
    FileSink.write(spark.range(0, 10).selectExpr("CAST(id AS STRING) AS value"),
      dir, format = "text")
    val n1 = CryptoStage.encryptDir(spark, dir, consumer.getPublic, producer.getPrivate)
    assert(n1 > 0)
    val n2 = CryptoStage.encryptDir(spark, dir, consumer.getPublic, producer.getPrivate)
    assert(n2 == 0, s"re-encrypted $n2 already-encrypted files")
    assert(CryptoStage.decryptDir(spark, dir, consumer.getPrivate, producer.getPublic) == n1)
    assert(spark.read.text(dir).count() == 10)
  }

  test("resumes a partially-completed prior run: stale destination overwritten, source removed") {
    val dir = Files.createTempDirectory("graft-crypto-resume").toString + "/out"
    FileSink.write(spark.range(0, 5).selectExpr("CAST(id AS STRING) AS value"),
      dir, format = "text")
    // Simulate a run that died between the transform and delete phases:
    // one source already has a (stale, garbage) destination beside it.
    val plain = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(plain.nonEmpty)
    Files.write(java.nio.file.Paths.get(dir, plain.head.getName + ".grfe"),
      "stale-partial-output".getBytes("UTF-8"))

    val n = CryptoStage.encryptDir(spark, dir, consumer.getPublic, producer.getPrivate)
    assert(n == plain.length) // re-transforms everything still listed as source
    // stale destination was overwritten with a valid envelope; sources gone
    assert(CryptoStage.decryptDir(spark, dir, consumer.getPrivate, producer.getPublic) == n)
    assert(spark.read.text(dir).count() == 5)
  }

  test("file sink output encrypts and decrypts task-side, content intact") {
    val dir = Files.createTempDirectory("graft-crypto").toString + "/out"
    val df = spark.range(0, 200).select(col("id"), (col("id") % 7).as("k"))
    FileSink.write(df.select(to_json(struct(col("id"), col("k"))).as("value")),
      dir, format = "text")

    val nEnc = CryptoStage.encryptDir(spark, dir, consumer.getPublic, producer.getPrivate)
    assert(nEnc > 0)
    // every data file is now an envelope; none parse as text
    val encrypted = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(encrypted.nonEmpty && encrypted.forall(_.getName.endsWith(".grfe")))

    val nDec = CryptoStage.decryptDir(spark, dir, consumer.getPrivate, producer.getPublic)
    assert(nDec == nEnc)
    val back = spark.read.text(dir)
      .select(get_json_object(col("value"), "$.id").cast("long").as("id"))
    assert(back.count() == 200)
    assert(back.agg(sum(col("id"))).head().getLong(0) == (0L until 200L).sum)
  }
}
