package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.pipes.LoopbackPipe

/** Kafka-shaped pipe round-trip (K1 producer / S3 consumer): source →
  * loopback pipe → sink with offsets resumed after restart — the test
  * shape of /root/reference/pipe/kafka_test.go.
  */
class KafkaPipeSpec extends SparkSuite {
  import spark.implicits._

  private val conf = new Configuration()

  private def messages(n: Int, from: Int = 0) =
    (from until from + n).map(i => (i.toLong, s"key${i % 5}", s"""{"seq":$i}"""))
      .toDF("ord", "key", "value")

  test("fnv1a partitioner: sarama test vectors and stability") {
    // FNV-1a 32-bit reference values (public FNV spec): "" -> 0x811c9dc5,
    // "a" -> 0xe40c292c, "foobar" -> 0xbf9cf968
    assert(LoopbackPipe.fnv1a32(Array.empty[Byte]) == 0x811c9dc5)
    assert(LoopbackPipe.fnv1a32("a".getBytes("UTF-8")) == 0xe40c292c)
    assert(LoopbackPipe.fnv1a32("foobar".getBytes("UTF-8")) == 0xbf9cf968)
    // same key always lands on the same partition, in range
    val p = LoopbackPipe.partitionFor("key1", 8)
    assert(p >= 0 && p < 8)
    assert(LoopbackPipe.partitionFor("key1", 8) == p)
  }

  test("produce assigns consecutive per-partition offsets across batches") {
    val dir = Files.createTempDirectory("graft-kafka-topic").toString
    val n1 = LoopbackPipe.produce(messages(20), dir, 4, col("ord"))
    assert(n1 == 20)
    val ends1 = LoopbackPipe.endOffsets(dir, conf)
    assert(ends1.values.sum == 20)
    // second batch continues where the first ended — no gaps, no overlap
    val n2 = LoopbackPipe.produce(messages(10, from = 20), dir, 4, col("ord"))
    assert(n2 == 10)
    val ends2 = LoopbackPipe.endOffsets(dir, conf)
    assert(ends2.values.sum == 30)
    ends2.foreach { case (p, e) =>
      val recs = LoopbackPipe.readPartition(dir, p, 0, e, conf).toVector
      assert(recs.map(_.offset) == (0L until e).toVector, s"partition $p offsets")
      // same key stays on one partition
      recs.groupBy(_.key).foreach { case (_, rs) =>
        assert(rs.map(_.partition).distinct.size == 1)
      }
    }
  }

  test("streaming consumer round-trip with restart: no loss, no dups") {
    val root = Files.createTempDirectory("graft-kafka-rt")
    val topic = root.toString + "/topic"
    val ckpt = root.toString + "/ckpt"
    val outDir = root.toString + "/out"

    LoopbackPipe.produce(messages(30), topic, 4, col("ord"))

    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-kafka")
        .option("path", topic)
        .option("maxOffsetsPerTrigger", "7")
        .load()
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    runOnce()
    assert(spark.read.parquet(outDir).count() == 30)

    // producer kept writing while the consumer was down
    LoopbackPipe.produce(messages(15, from = 30), topic, 4, col("ord"))
    runOnce()

    val all = spark.read.parquet(outDir).collect()
    assert(all.length == 45)
    val seqs = all.map(r => get_json_seq(r.getAs[String]("value"))).sorted
    assert(seqs.toSeq == (0 until 45))
    // per-partition offsets are dense and strictly ordered in arrival order
    all.groupBy(_.getAs[Int]("partition")).foreach { case (_, rows) =>
      val byOffset = rows.sortBy(_.getAs[Long]("offset"))
      assert(byOffset.map(_.getAs[Long]("offset")).toSeq == rows.indices.map(_.toLong))
      val ords = byOffset.map(_.getAs[Long]("ts"))
      assert(ords.sorted.toSeq == ords.toSeq) // producer order preserved
    }
  }

  private def get_json_seq(v: String): Int =
    v.replaceAll(""".*"seq":(\d+).*""", "$1").toInt

  test("empty topic: consumer completes with zero rows; endOffsets empty") {
    val dir = Files.createTempDirectory("graft-kafka-empty").toString + "/topic"
    assert(LoopbackPipe.endOffsets(dir, conf).isEmpty)
    val ckpt = Files.createTempDirectory("graft-kafka-empty-ckpt").toString
    val q = spark.readStream.format("graft-kafka").option("path", dir).load()
      .writeStream.format("memory").queryName("kafka_empty")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("kafka_empty").count() == 0)
  }

  test("null keys partition stably and round-trip") {
    val dir = Files.createTempDirectory("graft-kafka-nullkey").toString
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, null, "v1"), Row(2L, null, "v2")),
      StructType(Seq(StructField("ord", LongType), StructField("key", StringType),
        StructField("value", StringType))))
    // explicit partitioner (null keys cannot FNV-hash)
    val n = LoopbackPipe.produce(df, dir, 2, col("ord"),
      partitionCol = Some(pmod(col("ord"), lit(2))))
    assert(n == 2)
    val recs = (0 until 2).flatMap(p => LoopbackPipe.readPartition(dir, p, 0, 10, conf))
    assert(recs.map(_.value).toSet == Set("v1", "v2"))
  }

  test("epoch replay after a mid-write kill: no duplicate offsets") {
    val dir = Files.createTempDirectory("graft-kafka-epoch").toString
    LoopbackPipe.produceEpoch(messages(20), dir, 4, col("ord"), epoch = 0)
    val ends0 = LoopbackPipe.endOffsets(dir, conf)
    assert(ends0.values.sum == 20)

    // epoch 1's first attempt dies after committing SOME partitions: only
    // the slice of the batch that lands on one partition gets written
    val batch1 = messages(10, from = 20)
    val targetP = LoopbackPipe.partitionFor("key0", 4) // a partition that surely holds rows
    val partialKeys = (0 until 5).map(i => s"key$i")
      .filter(k => LoopbackPipe.partitionFor(k, 4) == targetP)
    LoopbackPipe.produceEpoch(batch1.filter(col("key").isin(partialKeys: _*)),
      dir, 4, col("ord"), epoch = 1)

    // restart: foreachBatch re-delivers the FULL epoch-1 batch. The pinned
    // base makes the replay rewrite the same segment names — the already-
    // committed partition's segment survives, nothing lands twice.
    LoopbackPipe.produceEpoch(batch1, dir, 4, col("ord"), epoch = 1)
    val ends1 = LoopbackPipe.endOffsets(dir, conf)
    assert(ends1.values.sum == 30, ends1)
    ends1.foreach { case (p, e) =>
      val offs = LoopbackPipe.readPartition(dir, p, 0, e, conf).map(_.offset).toVector
      assert(offs == (0L until e).toVector, s"partition $p offsets: $offs")
    }
    // a second replay of the complete epoch is a no-op too
    LoopbackPipe.produceEpoch(batch1, dir, 4, col("ord"), epoch = 1)
    assert(LoopbackPipe.endOffsets(dir, conf) == ends1)
    // distinct (seq) payloads exactly once across the whole log
    val seqs = ends1.keys.toSeq.flatMap(p =>
      LoopbackPipe.readPartition(dir, p, 0, Long.MaxValue, conf)).map(r => get_json_seq(r.value))
    assert(seqs.sorted == (0 until 30))
  }

  test("consumer-group offsets persist and restore (kafka_offsets analogue)") {
    val dir = Files.createTempDirectory("graft-kafka-grp").toString
    LoopbackPipe.produce(messages(12), dir, 3, col("ord"))
    assert(LoopbackPipe.committedGroup(dir, "g1", conf).isEmpty) // InitialOffset
    LoopbackPipe.commitGroup(dir, "g1", Map(0 -> 3L, 1 -> 2L, 2 -> 4L), conf)
    assert(LoopbackPipe.committedGroup(dir, "g1", conf) == Map(0 -> 3L, 1 -> 2L, 2 -> 4L))
    // a later commit replaces (offsets only move forward in the caller)
    LoopbackPipe.commitGroup(dir, "g1", Map(0 -> 5L, 1 -> 2L, 2 -> 4L), conf)
    assert(LoopbackPipe.committedGroup(dir, "g1", conf)(0) == 5L)
    assert(LoopbackPipe.committedGroup(dir, "g2", conf).isEmpty) // groups isolated
  }
}
