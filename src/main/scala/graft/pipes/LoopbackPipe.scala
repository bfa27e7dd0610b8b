package graft.pipes

import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.Partitioner
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Loopback Kafka-shaped pipe: the reference's producer/consumer contract
  * (/root/reference/pipe/kafka.go) over a file-backed segmented topic log,
  * so the Kafka pipe stops being a paper claim in an environment with no
  * broker or connector jar.
  *
  * Contract parity:
  *  - message = (key, value); the producer partitions by key
  *    (`PartitionKey` is identity on the row key — kafka.go:626-629; the
  *    default partitioner is sarama's FNV-1a hash of the key bytes)
  *  - per-partition append-only offsets, strictly ordered within a
  *    partition, no order across partitions (Kafka's model)
  *  - consumer-group offsets persist out-of-band (`kafka_offsets` table,
  *    kafka.go:152-156) → `commitGroup`/`committedGroup` JSON beside the
  *    log; the Spark streaming consumer uses its own checkpoint instead
  *  - `InitialOffset = oldest` for partitions with no committed offset
  *    (kafka.go:51-53 configurable; the loopback always replays from 0)
  *
  * Layout: `<topicDir>/p<k>/segment-<startOffset>-<count>.jsonl`, one JSON
  * record per line `{"o":offset,"k":key,"v":value,"ts":ms}`. Batches write
  * NEW segment files (never append), so the log works on object stores;
  * offset arithmetic needs only file names — a listing, not a scan.
  *
  * Scale notes: one producer task per partition (the real pipe has one
  * in-flight batch per partition too — kafka.go:535-536); a task buffers
  * and sorts only its own batch-partition slice, the analogue of the
  * producer's batch buffer. Consumers read partitions in parallel — see
  * [[graft.sources.KafkaPipeSourceProvider]]. Single producer per topic at
  * a time (the reference's topology as well); brokers arbitrate concurrent
  * producers, a shared log cannot.
  */
object LoopbackPipe {

  /** sarama default-partitioner parity: FNV-1a 32-bit over the key bytes,
    * absolute value mod numPartitions.
    */
  def fnv1a32(bytes: Array[Byte]): Int = {
    var h = 0x811c9dc5
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xff)) * 0x01000193; i += 1 }
    h
  }

  def partitionFor(key: String, numPartitions: Int): Int = {
    val h = fnv1a32(key.getBytes(StandardCharsets.UTF_8)) % numPartitions
    if (h < 0) -h else h
  }

  private val mapper = new ObjectMapper()

  private val SegmentRe = "segment-(\\d+)-(\\d+)\\.jsonl".r

  /** Next offset to be written, per partition (from file names only). */
  def endOffsets(topicDir: String, conf: Configuration): Map[Int, Long] = {
    val dir = new HPath(topicDir)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return Map.empty
    fs.listStatus(dir).toSeq.filter(s => s.isDirectory && s.getPath.getName.startsWith("p"))
      .map { pd =>
        val p = pd.getPath.getName.drop(1).toInt
        val end = fs.listStatus(pd.getPath).toSeq.map(_.getPath.getName).collect {
          case SegmentRe(start, count) => start.toLong + count.toLong
        }.foldLeft(0L)(math.max)
        p -> end
      }.toMap
  }

  /** Produce a batch: `df` must have string columns `key` and `value`.
    * Partition = `partitionCol` if given (e.g. pmod of a numeric key),
    * else FNV-1a of the key. Records land in per-partition segments with
    * consecutive offsets continuing from the current end; within a
    * partition records are ordered by `orderCol` (the producer send
    * order). Returns records written.
    */
  def produce(df: DataFrame, topicDir: String, numPartitions: Int,
              orderCol: Column, partitionCol: Option[Column] = None): Long =
    produceFrom(df, topicDir, numPartitions, orderCol, partitionCol,
      endOffsets(topicDir, df.sparkSession.sparkContext.hadoopConfiguration))

  /** Epoch-pinned produce for streaming `foreachBatch` sinks: the
    * per-partition base offsets for `epoch` are recorded in
    * `_epochs/<epoch>.json` BEFORE any segment is written and REUSED on
    * replay, so a retried epoch rewrites the SAME segment names (the
    * rename commit keeps the first complete writer) instead of appending
    * a duplicate batch at fresh offsets. This is the loopback analogue of
    * the reference's at-least-once + offset-rewind recovery
    * (/root/reference/pipe/kafka.go:370-418): re-delivery lands on the
    * offsets the failed attempt owned, never past them. Assumes what
    * foreachBatch guarantees — a replayed epoch carries the same rows.
    */
  def produceEpoch(df: DataFrame, topicDir: String, numPartitions: Int,
                   orderCol: Column, epoch: Long,
                   partitionCol: Option[Column] = None): Long = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    produceFrom(df, topicDir, numPartitions, orderCol, partitionCol,
      epochBase(topicDir, epoch, conf))
  }

  /** Pin (or recover) the base offsets for an epoch, atomically: first
    * attempt records current end offsets via create-then-rename; a loser
    * of the rename race (or a retry) reads the winner's pin.
    */
  private def epochBase(topicDir: String, epoch: Long,
                        conf: Configuration): Map[Int, Long] = {
    val p = new HPath(s"$topicDir/_epochs/$epoch.json")
    val fs = p.getFileSystem(conf)
    def readPin(): Map[Int, Long] = {
      val in = fs.open(p)
      val bytes = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in) finally in.close()
      val n = mapper.readTree(new String(bytes, StandardCharsets.UTF_8))
      val it = n.properties().iterator()
      val b = Map.newBuilder[Int, Long]
      while (it.hasNext) { val e = it.next(); b += (e.getKey.toInt -> e.getValue.asLong) }
      b.result()
    }
    if (fs.exists(p)) readPin()
    else {
      val base = endOffsets(topicDir, conf)
      val n = mapper.createObjectNode()
      base.toSeq.sortBy(_._1).foreach { case (k, v) => n.put(k.toString, v) }
      val tmp = new HPath(s"$topicDir/_epochs/.$epoch-${java.util.UUID.randomUUID()}.tmp")
      val out = fs.create(tmp, true)
      try out.write(mapper.writeValueAsString(n).getBytes(StandardCharsets.UTF_8))
      finally out.close()
      if (fs.rename(tmp, p)) base
      else { fs.delete(tmp, false); readPin() }
    }
  }

  private def produceFrom(df: DataFrame, topicDir: String, numPartitions: Int,
                          orderCol: Column, partitionCol: Option[Column],
                          base: Map[Int, Long]): Long = {
    val spark = df.sparkSession
    val confEntries = graft.core.HadoopConf.ship(spark)
    val nParts = numPartitions
    val withPart = df.select(
      partitionCol.getOrElse(lit(-1)).cast("int").as("_p"),
      orderCol.cast("long").as("_ord"), col("key"), col("value"))
    val counts = withPart.rdd
      .map { r =>
        val explicit = r.getInt(0)
        val p = if (explicit >= 0) explicit else partitionFor(r.getString(2), nParts)
        (p, (r.getLong(1), r.getString(2), r.getString(3)))
      }
      .partitionBy(new IdentityPartitioner(nParts))
      .mapPartitionsWithIndex { (pid, it) =>
        // producer batch buffer: this partition's slice of ONE send batch
        val rows = it.map(_._2).toArray.sortBy(_._1)
        if (rows.isEmpty) Iterator.empty
        else {
          val pdir = new HPath(s"$topicDir/p$pid")
          val fs = pdir.getFileSystem(graft.core.HadoopConf.rebuild(confEntries))
          val start = base.getOrElse(pid, 0L)
          val tmp = new HPath(pdir, s".segment-$start.tmp")
          val out = new java.io.BufferedOutputStream(fs.create(tmp, true), 1 << 16)
          // stream one JSON object per line straight into the (buffered)
          // output — no per-record tree or intermediate string
          val gen = new com.fasterxml.jackson.core.JsonFactory()
            .createGenerator(out, com.fasterxml.jackson.core.JsonEncoding.UTF8)
          gen.setRootValueSeparator(null)
          try {
            var i = 0
            while (i < rows.length) {
              val (ord, k, v) = rows(i)
              gen.writeStartObject()
              gen.writeNumberField("o", start + i)
              gen.writeStringField("k", k)
              gen.writeStringField("v", v)
              gen.writeNumberField("ts", ord)
              gen.writeEndObject()
              gen.writeRaw('\n')
              i += 1
            }
          } finally gen.close()
          // rename returns false (not an exception) on several
          // FileSystems, e.g. when a task retry's first attempt already
          // committed the segment — losing the batch silently is the one
          // unacceptable outcome for a pipe
          val dest = new HPath(pdir, s"segment-$start-${rows.length}.jsonl")
          if (!fs.rename(tmp, dest)) {
            if (!fs.exists(dest))
              throw new java.io.IOException(s"segment commit failed: $tmp -> $dest")
            fs.delete(tmp, false) // earlier attempt already committed it
          }
          Iterator.single(rows.length.toLong)
        }
      }.sum().toLong
    counts
  }

  /** Identity partitioner: the record's computed topic-partition IS the
    * Spark shuffle partition — one producer task per topic-partition.
    */
  private final class IdentityPartitioner(n: Int) extends Partitioner {
    override def numPartitions: Int = n
    override def getPartition(key: Any): Int = key.asInstanceOf[Int]
  }

  final case class Record(partition: Int, offset: Long, key: String, value: String, ts: Long)

  def parseRecord(partition: Int, line: String): Record = {
    val n = mapper.readTree(line)
    Record(partition, n.get("o").asLong, n.get("k").asText, n.get("v").asText,
      n.get("ts").asLong)
  }

  /** Read one partition's records in [from, until) in offset order. */
  def readPartition(topicDir: String, partition: Int, from: Long, until: Long,
                    conf: Configuration): Iterator[Record] = {
    val pdir = new HPath(s"$topicDir/p$partition")
    val fs = pdir.getFileSystem(conf)
    if (!fs.exists(pdir)) return Iterator.empty
    val segs = fs.listStatus(pdir).toSeq.map(_.getPath).flatMap { p =>
      p.getName match {
        case SegmentRe(start, count) =>
          val s = start.toLong; val c = count.toLong
          if (s + c <= from || s >= until) None else Some((s, c, p))
        case _ => None
      }
    }.sortBy(_._1)
    segs.iterator.flatMap { case (segStart, segCount, p) =>
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        fs.open(p), StandardCharsets.UTF_8), 1 << 16)
      // offsets within a segment are consecutive from segStart (the
      // producer writes o = segStart + lineIdx), so the [from, until)
      // slice is positional: skip lines without parsing, stop at the
      // slice end instead of draining the file — a micro-batch reading
      // the middle of a large segment parses only its own rows
      val skip = math.max(0L, from - segStart)
      val take = math.min(segStart + segCount, until) - math.max(segStart, from)
      var skipped = 0L
      while (skipped < skip && in.readLine() != null) skipped += 1
      val lines = Iterator.continually(in.readLine()).takeWhile(_ != null)
        .filter(_.nonEmpty)
        .take(if (take > Int.MaxValue) Int.MaxValue else take.toInt)
        .map(parseRecord(partition, _))
      // close at EOF or on a parse failure, never leak the descriptor
      new Iterator[Record] {
        private var closed = false
        private def close(): Unit = if (!closed) { closed = true; in.close() }
        override def hasNext: Boolean = {
          val h = try lines.hasNext catch { case t: Throwable => close(); throw t }
          if (!h) close()
          h
        }
        override def next(): Record =
          try lines.next() catch { case t: Throwable => close(); throw t }
      }
    }
  }

  // ------- consumer-group offsets (kafka_offsets analogue, kafka.go:152) --

  def commitGroup(topicDir: String, group: String, offsets: Map[Int, Long],
                  conf: Configuration): Unit = {
    val p = new HPath(s"$topicDir/_groups/$group.json")
    val fs = p.getFileSystem(conf)
    val n = mapper.createObjectNode()
    offsets.toSeq.sortBy(_._1).foreach { case (k, v) => n.put(k.toString, v) }
    val out = fs.create(p, true)
    try out.write(mapper.writeValueAsString(n).getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def committedGroup(topicDir: String, group: String,
                     conf: Configuration): Map[Int, Long] = {
    val p = new HPath(s"$topicDir/_groups/$group.json")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val bytes = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in) finally in.close()
      val n = mapper.readTree(new String(bytes, StandardCharsets.UTF_8))
      val it = n.properties().iterator()
      val b = Map.newBuilder[Int, Long]
      while (it.hasNext) { val e = it.next(); b += (e.getKey.toInt -> e.getValue.asLong) }
      b.result()
    }
  }
}
