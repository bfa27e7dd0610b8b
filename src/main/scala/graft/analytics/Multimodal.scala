package graft.analytics

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in distributed batches.
  *
  * The Spark-side architecture is real and tested — schema, partitioning,
  * batch shape (`mapPartitions` over row iterators ≙ `mapInPandas` batch
  * UDFs in PySpark) — while the codec step itself is a clearly-marked
  * deterministic STUB (`decodeStub`): no image/audio libraries ship in this
  * container. Swapping in a real decoder changes ONE function; everything
  * around it (columnar transport, per-partition batching, metadata struct)
  * stays.
  *
  * Scale design: media bytes stay columnar (never `collect`ed), partitions
  * are sized by `spark.sql.files.maxPartitionBytes` at the scan, and
  * feature extraction is embarrassingly parallel — at 100 TB the only knob
  * is partition count.
  */
object Multimodal {

  /** Metadata struct carried alongside every media blob. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType), // image | audio | video
    StructField("n_bytes", LongType),
    StructField("sha", StringType)))

  /** Wrap a text/binary column as an opaque media blob + typed metadata. */
  def asMediaColumn(df: DataFrame, src: String, mediaType: String): DataFrame =
    df.withColumn("media", col(src).cast("binary"))
      .withColumn("media_meta", struct(
        lit(mediaType).as("media_type"),
        octet_length(col(src)).cast("long").as("n_bytes"),
        sha2(col(src).cast("binary"), 256).as("sha")))

  /** STUB decode: deterministic fake "decoded frame" features derived from
    * the bytes (first/last byte, length, byte-sum mod). A real decoder
    * (JPEG/PNG/PCM) replaces exactly this function.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Long) = {
    if (bytes == null || bytes.isEmpty) (0, 0, 0L)
    else {
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
      (bytes.length % 1024, (bytes.length / 1024) + 1, sum)
    }
  }

  /** STUB resize: deterministic fake — a real implementation decodes,
    * scales, re-encodes. The contract (bytes in → bytes out + new dims)
    * and the distributed call shape are what downstream code depends on.
    */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
    if (bytes == null) Array.emptyByteArray
    else {
      // keep a deterministic, size-proportional sketch of the payload
      val n = math.max(1, math.min(bytes.length, (w.toLong * h / 64).toInt))
      java.util.Arrays.copyOf(bytes, n)
    }

  /** STUB frame sampling: split a "video" payload into `n` evenly-spaced
    * fake frames (byte slices). Real impl: container demux + keyframe
    * index. Emitted as one row per frame — downstream image ops apply
    * unchanged.
    */
  def frameSampleStub(bytes: Array[Byte], n: Int): Seq[(Int, Array[Byte])] =
    if (bytes == null || bytes.isEmpty || n <= 0) Seq.empty
    else {
      val stride = math.max(1, bytes.length / n)
      (0 until math.min(n, bytes.length)).map { i =>
        val start = i * stride
        (i, java.util.Arrays.copyOfRange(bytes, start,
          math.min(start + stride, bytes.length)))
      }
    }

  /** Distributed resize over media blobs (narrow, per-partition batches). */
  def resize(df: DataFrame, w: Int, h: Int): DataFrame = {
    val mediaIdx = df.schema.fieldIndex("media")
    implicit val enc = org.apache.spark.sql.Encoders.row(df.schema)
    df.mapPartitions { it =>
      it.map { row =>
        val resized = resizeStub(row.getAs[Array[Byte]](mediaIdx), w, h)
        Row.fromSeq(row.toSeq.updated(mediaIdx, resized))
      }
    }(enc)
  }

  /** Distributed frame sampling: one output row per sampled frame, media
    * column replaced by the frame bytes plus a `frame_idx` column. Fan-out
    * is bounded by `n` — partition sizing accounts for the multiplier.
    */
  def frameSample(df: DataFrame, n: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(StructField("frame_idx", IntegerType)))
    val mediaIdx = df.schema.fieldIndex("media")
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.flatMap { row =>
        frameSampleStub(row.getAs[Array[Byte]](mediaIdx), n).map { case (i, frame) =>
          Row.fromSeq(row.toSeq.updated(mediaIdx, frame) :+ i)
        }
      }
    }(enc)
  }

  /** Distributed feature extraction over media blobs: mapPartitions with
    * per-partition batch processing (the Scala analogue of `mapInPandas` —
    * one iterator per partition, amortized setup).
    */
  def extractFeatures(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields.filterNot(_.name == "media") ++ Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("byte_sum", LongType)))
    val mediaIdx = df.schema.fieldIndex("media")
    val keepIdx = df.schema.fields.indices.filterNot(_ == mediaIdx)
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      // per-partition decoder setup would happen here (codec init, model load)
      it.map { row =>
        val (w, h, s) = decodeStub(row.getAs[Array[Byte]](mediaIdx))
        Row.fromSeq(keepIdx.map(row.get) ++ Seq[Any](w, h, s))
      }
    }(enc)
  }
}
