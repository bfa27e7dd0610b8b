package graft.analytics

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in distributed batches.
  *
  * Image decode and resize are REAL — `javax.imageio` ships with the JDK
  * (PNG/JPEG/GIF/BMP), so [[extractFeatures]] reads actual image headers
  * (width/height/channels/format, header-only — pixels are not
  * materialized) and [[resize]] does a full decode → scale → PNG
  * re-encode. Audio header decode is REAL too — `javax.sound.sampled`
  * (WAV/AIFF/AU) backs [[extractAudioFeatures]]. Video frame sampling is
  * REAL as well ([[sampleContainerFrames]]): multi-frame container demux
  * via ImageIO (animated GIF in pure JDK; the call shape serves any
  * format a reader plugin provides — an MP4 plugin would slot in
  * unchanged). No stubs remain in this module.
  *
  * Scale design: media bytes stay columnar (never `collect`ed), partitions
  * are sized by `spark.sql.files.maxPartitionBytes` at the scan, decode
  * is embarrassingly parallel in `mapPartitions` batches (the Scala
  * analogue of `mapInPandas`), and header-only feature extraction never
  * allocates pixel buffers — at 100 TB the only knob is partition count.
  */
object Multimodal {

  // JVM-wide, once: ImageIO's DEFAULT stream cache backs every
  // ImageIO.read/write call with a temp FILE in java.io.tmpdir — in a
  // codec pipeline that is one disk file created+deleted PER ROW, and
  // the resize/video rows' wall time was observed swinging 0.7-5.9 s at
  // sf0.1 purely with ambient /tmp pressure. Media blobs here are
  // bounded (bytes already in memory), so memory-cached streams are
  // strictly better; decodeImage/sampleContainerFrames already
  // construct MemoryCacheImageInputStream explicitly, this closes the
  // ImageIO.read/write-created ones.
  //
  // This IS a JVM-global side effect visible to any other ImageIO user
  // sharing the process (also documented in SCALE.md): an embedder that
  // needs the disk cache (e.g. images larger than heap elsewhere in the
  // JVM) can opt out with -Dgraft.imageio.keepDiskCache=true before
  // this class loads.
  if (!sys.props.get("graft.imageio.keepDiskCache").contains("true"))
    javax.imageio.ImageIO.setUseCache(false)

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

  /** Decoded image header info (no pixel data). */
  final case class ImageInfo(width: Int, height: Int, channels: Int, format: String)

  /** REAL header-only image decode via `javax.imageio` (pure JDK: PNG,
    * JPEG, GIF, BMP). Reads width/height/channels/format from the stream
    * header without materializing a pixel buffer — O(header) per blob, so
    * feature extraction over 100 TB of media never pays full-decode cost.
    * Returns None for bytes no installed reader recognizes.
    */
  def decodeImage(bytes: Array[Byte]): Option[ImageInfo] = {
    if (bytes == null || bytes.isEmpty) return None
    // MemoryCacheImageInputStream directly: the ImageIO.createImageInputStream
    // default writes a temp FILE per call (disk churn per row)
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          val channels = r.getImageTypes(0).next().getNumComponents
          Some(ImageInfo(r.getWidth(0), r.getHeight(0), channels,
            r.getFormatName.toLowerCase))
        } catch { case scala.util.control.NonFatal(_) => None }
        finally r.dispose()
      }
    } finally iis.close()
  }

  /** Encode a BufferedImage to PNG bytes (pure JDK, in-memory). */
  def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic tiny real PNG for fixtures: dimensions and channel
    * count are pure functions of `id` (w = id%16+1, h = id%12+1, RGBA
    * when id%3=0 else RGB), pixel values a fixed arithmetic pattern — so
    * an oracle can recompute expected decode output from the id alone.
    */
  def syntheticImage(id: Long): Array[Byte] = {
    val w = (id % 16).toInt + 1
    val h = (id % 12).toInt + 1
    val typ = if (id % 3 == 0) java.awt.image.BufferedImage.TYPE_INT_ARGB
              else java.awt.image.BufferedImage.TYPE_INT_RGB
    val img = new java.awt.image.BufferedImage(w, h, typ)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (((id + x * 31 + y * 17) & 0xffffff) | 0xff000000L).toInt)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  /** Decoded audio header info (no sample data). */
  final case class AudioInfo(sampleRate: Int, channels: Int,
                             bitsPerSample: Int, frames: Long)

  /** REAL header-only audio decode via `javax.sound.sampled` (pure JDK:
    * WAV, AIFF, AU). Parses the container header without reading sample
    * data. Returns None for bytes no installed provider recognizes.
    */
  def decodeAudio(bytes: Array[Byte]): Option[AudioInfo] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val f = aff.getFormat
      Some(AudioInfo(f.getSampleRate.toInt, f.getChannels,
        f.getSampleSizeInBits, aff.getFrameLength.toLong))
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Deterministic real PCM WAV for fixtures: sample rate, channel count
    * and frame count are pure functions of `id` (rate = 8000 + id%4*4000,
    * channels = 1 + id%2, frames = 100 + id%50, 16-bit), sample values a
    * fixed arithmetic pattern — an oracle recomputes expected decode
    * output from the id alone.
    */
  def syntheticWav(id: Long): Array[Byte] = {
    val sampleRate = 8000 + (id % 4).toInt * 4000
    val channels = 1 + (id % 2).toInt
    val frames = 100 + (id % 50).toInt
    val bits = 16
    val blockAlign = channels * bits / 8
    val dataLen = frames * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(channels.toShort)
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * blockAlign)
    bb.putShort(blockAlign.toShort)
    bb.putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    var i = 0
    while (i < dataLen / 2) {
      bb.putShort((((id + i * 37) % 65536) - 32768).toShort)
      i += 1
    }
    bb.array()
  }

  /** Distributed audio feature extraction: mapPartitions header decode,
    * nulls for undecodable blobs (same batch shape as [[extractFeatures]]).
    */
  def extractAudioFeatures(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields.filterNot(_.name == "media") ++ Seq(
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("bits_per_sample", IntegerType),
      StructField("frames", LongType)))
    val mediaIdx = df.schema.fieldIndex("media")
    val keepIdx = df.schema.fields.indices.filterNot(_ == mediaIdx)
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.map { row =>
        val info = decodeAudio(row.getAs[Array[Byte]](mediaIdx))
        Row.fromSeq(keepIdx.map(row.get) ++ Seq[Any](
          info.map(_.sampleRate).orNull, info.map(_.channels).orNull,
          info.map(_.bitsPerSample).orNull, info.map(_.frames).orNull))
      }
    }(enc)
  }

  /** REAL resize: full decode → scaled redraw → PNG re-encode (alpha
    * preserved). Returns None for undecodable bytes.
    */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    if (bytes == null || bytes.isEmpty) return None
    val src = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              catch { case scala.util.control.NonFatal(_) => null }
    if (src == null) None
    else {
      val typ = if (src.getColorModel.hasAlpha) java.awt.image.BufferedImage.TYPE_INT_ARGB
                else java.awt.image.BufferedImage.TYPE_INT_RGB
      val dst = new java.awt.image.BufferedImage(w, h, typ)
      val g = dst.createGraphics()
      try g.drawImage(src, 0, 0, w, h, null) finally g.dispose()
      Some(encodePng(dst))
    }
  }

  /** Deterministic multi-frame "video" fixture: a REAL animated GIF
    * (n_frames = 2 + id%3 frames of (8 + id%5) × (6 + id%4), fixed
    * arithmetic pixel pattern varying per frame) — a genuine multi-frame
    * container that pure-JDK ImageIO can both WRITE and DEMUX, so the
    * video path needs no stub: dimensions and frame count are pure
    * functions of `id` for the oracle to recompute.
    */
  def syntheticGif(id: Long): Array[Byte] = {
    val w = 8 + (id % 5).toInt
    val h = 6 + (id % 4).toInt
    val n = 2 + (id % 3).toInt
    val out = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < n) {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, (((id + f * 101 + x * 31 + y * 17) & 0xffffff) | 0xff000000L).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** REAL video-container demux: count + decode frames of a multi-frame
    * container via ImageIO (GIF in pure JDK; the same call shape serves
    * any format a reader plugin provides). Samples `n` evenly-strided
    * frames (stride = total/n, floored, min 1), re-encoding each sampled
    * frame as PNG so every downstream image operator applies unchanged.
    */
  def sampleContainerFrames(bytes: Array[Byte], n: Int): Seq[(Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.isEmpty || n <= 0) return Seq.empty
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return Seq.empty
      val r = readers.next()
      try {
        r.setInput(iis)
        val total = r.getNumImages(true)
        val stride = math.max(1, total / n)
        (0 until math.min(n, total))
          .map(_ * stride)
          .filter(_ < total)
          .map(i => (i, total, encodePng(r.read(i))))
      } catch { case scala.util.control.NonFatal(_) => Seq.empty }
      finally r.dispose()
    } finally iis.close()
  }

  /** Distributed resize over media blobs (narrow, per-partition batches).
    * Undecodable blobs surface as null media — fail-visible, not dropped.
    */
  def resize(df: DataFrame, w: Int, h: Int): DataFrame = {
    val mediaIdx = df.schema.fieldIndex("media")
    implicit val enc = org.apache.spark.sql.Encoders.row(df.schema)
    df.mapPartitions { it =>
      it.map { row =>
        val resized = resizeImage(row.getAs[Array[Byte]](mediaIdx), w, h).orNull
        Row.fromSeq(row.toSeq.updated(mediaIdx, resized))
      }
    }(enc)
  }

  /** Distributed frame sampling: REAL container demux per blob
    * ([[sampleContainerFrames]]), one output row per sampled frame — the
    * media column replaced by the frame's PNG bytes plus `frame_idx` and
    * `n_frames` columns. Fan-out is bounded by `n` — partition sizing
    * accounts for the multiplier.
    */
  def frameSample(df: DataFrame, n: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType), StructField("n_frames", IntegerType)))
    val mediaIdx = df.schema.fieldIndex("media")
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.flatMap { row =>
        sampleContainerFrames(row.getAs[Array[Byte]](mediaIdx), n).map {
          case (i, total, frame) =>
            Row.fromSeq(row.toSeq.updated(mediaIdx, frame) :+ i :+ total)
        }
      }
    }(enc)
  }

  /** Distributed feature extraction over media blobs: mapPartitions with
    * per-partition batch processing (the Scala analogue of `mapInPandas` —
    * one iterator per partition, amortized setup). REAL header-only
    * decode: width/height/channels/format from `javax.imageio`;
    * undecodable blobs yield nulls (fail-visible, not dropped).
    */
  def extractFeatures(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields.filterNot(_.name == "media") ++ Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("format", StringType)))
    val mediaIdx = df.schema.fieldIndex("media")
    val keepIdx = df.schema.fields.indices.filterNot(_ == mediaIdx)
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      // per-partition decoder setup would happen here (codec init, model load)
      it.map { row =>
        val info = decodeImage(row.getAs[Array[Byte]](mediaIdx))
        Row.fromSeq(keepIdx.map(row.get) ++ Seq[Any](
          info.map(_.width).orNull, info.map(_.height).orNull,
          info.map(_.channels).orNull, info.map(_.format).orNull))
      }
    }(enc)
  }
}
