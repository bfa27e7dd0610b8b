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
