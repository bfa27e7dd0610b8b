package graft.pipes

import java.io.{InputStream, OutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Length-delimited binary record framing for the file pipe — the
  * reference's binary-format file layout
  * (/root/reference/pipe/file.go:574-584 write, :1013-1033 read):
  * each record is a 4-byte LITTLE-ENDIAN length prefix followed by the
  * raw bytes. Text formats use newline delimiting instead (FileSink);
  * this is the transport for MsgPack/Avro CF events on files.
  *
  * Scale: one framed file per Spark partition, written and read in
  * executor tasks over the Hadoop FileSystem; a consumer split is one
  * file (framing has no sync markers — the reference's consumer also
  * reads a file start-to-end, sequential by construction).
  */
object Framing {

  def writeFrame(out: OutputStream, record: Array[Byte]): Unit = {
    val n = record.length
    out.write(n & 0xff); out.write((n >> 8) & 0xff)
    out.write((n >> 16) & 0xff); out.write((n >> 24) & 0xff)
    out.write(record)
  }

  /** Iterator over frames; stops cleanly at EOF, throws on a truncated
    * record (integrity violation, like io.ReadFull in the reference).
    */
  def readFrames(in: InputStream): Iterator[Array[Byte]] = new Iterator[Array[Byte]] {
    private var nextRec: Array[Byte] = _
    private var eof = false

    private def advance(): Unit = {
      if (nextRec != null || eof) return
      val b0 = in.read()
      if (b0 < 0) { eof = true; return }
      val b1 = in.read(); val b2 = in.read(); val b3 = in.read()
      require(b1 >= 0 && b2 >= 0 && b3 >= 0, "truncated frame length")
      val n = (b0 & 0xff) | ((b1 & 0xff) << 8) | ((b2 & 0xff) << 16) | ((b3 & 0xff) << 24)
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(buf, off, n - off)
        require(r >= 0, s"truncated frame: expected $n bytes, got $off")
        off += r
      }
      nextRec = buf
    }

    override def hasNext: Boolean = { advance(); nextRec != null }
    override def next(): Array[Byte] = {
      advance()
      val r = nextRec; nextRec = null
      if (r == null) throw new NoSuchElementException
      r
    }
  }

  /** Wrap a frame iterator so the underlying stream closes at EOF and on
    * any read failure (a truncated-frame require mid-file must not leak
    * the descriptor). Early abandonment without exhaustion still leaks —
    * our consumers always drain their range.
    */
  private[pipes] def closeOnEnd(frames: Iterator[Array[Byte]],
                                stream: java.io.Closeable): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var closed = false
      private def close(): Unit = if (!closed) { closed = true; stream.close() }
      override def hasNext: Boolean = {
        val h = try frames.hasNext catch { case t: Throwable => close(); throw t }
        if (!h) close()
        h
      }
      override def next(): Array[Byte] =
        try frames.next() catch { case t: Throwable => close(); throw t }
    }

  /** Write `binCol` (binary) as framed files, one per partition; `.gz`
    * compression optional (the framing is inside the gzip stream, like
    * the reference's compression chain — file.go:494-497).
    */
  def write(df: DataFrame, path: String, binCol: String, gzip: Boolean = false): Long = {
    val spark = df.sparkSession
    val entries = graft.core.HadoopConf.ship(spark)
    val suffix = if (gzip) ".bin.gz" else ".bin"
    df.select(col(binCol)).rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val dir = new HPath(path)
        val fs = dir.getFileSystem(graft.core.HadoopConf.rebuild(entries))
        val file = new HPath(dir, f"part-$pid%05d$suffix")
        val raw = fs.create(file, true)
        val out: OutputStream = if (gzip) new GZIPOutputStream(raw) else raw
        var n = 0L
        try it.foreach { r => writeFrame(out, r.getAs[Array[Byte]](0)); n += 1 }
        finally out.close()
        Iterator.single(n)
      }
    }.sum().toLong
  }

  /** Read framed files back as a binary `value` column (with the source
    * file path for ordering/debugging). Distributed: one task per file.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val entries = graft.core.HadoopConf.ship(spark)
    val dir = new HPath(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(dir).toSeq.filter(_.isFile).map(_.getPath.getName)
      .filter(n => n.endsWith(".bin") || n.endsWith(".bin.gz")).sorted
    spark.createDataset(files).repartition(math.max(1, files.size))
      .mapPartitions { it =>
        val d = new HPath(path)
        val taskFs = d.getFileSystem(graft.core.HadoopConf.rebuild(entries))
        it.flatMap { name =>
          val raw = taskFs.open(new HPath(d, name))
          val in: InputStream =
            if (name.endsWith(".gz")) new GZIPInputStream(raw) else raw
          closeOnEnd(readFrames(in), raw).map(b => (name, b))
        }
      }.toDF("file", "value")
  }
}
