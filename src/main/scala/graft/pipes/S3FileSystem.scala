package graft.pipes

import java.io.{ByteArrayOutputStream, IOException, InputStream, OutputStream}
import java.net.{HttpURLConnection, URI, URL}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, FSDataInputStream, FSDataOutputStream, FSInputStream, FileStatus, FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Thin Hadoop `FileSystem` over the S3 REST wire (scheme `gs3://`) —
  * the client half of K4, mirroring the reference's S3 pipe semantics
  * (`pipe/s3.go:44-268`) on the Spark side:
  *
  *  - [[create]] is the reference's STREAMING MULTIPART upload
  *    (io.Pipe → s3manager.Uploader): bytes buffer up to one part size
  *    and ship as `UploadPart` as soon as a part fills — the object is
  *    never materialized whole on the writer, which is the property that
  *    lets a 100 TB sink stream through executor memory. Objects smaller
  *    than one part degrade to a single PUT (s3manager does the same).
  *    The stream is NON-SEEKABLE, exactly like the reference's writer.
  *  - [[open]] reads with ranged GETs (positioned reads = `Range`
  *    headers — parquet footer seeks don't re-read the object).
  *  - The reference's pipe-level `rename`/`remove` are NO-OPS because it
  *    writes direct to the final key (s3.go:227-247); a Hadoop
  *    FileSystem cannot skip rename — Spark's committer protocol commits
  *    BY renaming — so rename is implemented the way the real
  *    S3AFileSystem does it: server-side COPY per object + delete, no
  *    data through the client.
  *
  * URI shape: `gs3://host:port/bucket/key...` — the authority is the
  * loopback endpoint, the first path segment the bucket. Registered via
  * `fs.gs3.impl` (SchemeFsSpec precedent); no signing, loopback only.
  */
final class S3FileSystem extends FileSystem {

  private var fsUri: URI = _
  private var endpoint: String = _
  private var partSize: Int = _
  private var listPage: Int = _
  private var workDir: Path = _

  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    setConf(conf)
    fsUri = URI.create(s"gs3://${uri.getAuthority}")
    endpoint = s"http://${uri.getAuthority}"
    // real S3 enforces a 5 MB minimum; specs shrink it to drive many
    // parts through small fixtures
    partSize = conf.getInt("fs.gs3.multipart.size", 8 * 1024 * 1024)
    // ListObjectsV2 page size (specs shrink it to force pagination)
    listPage = conf.getInt("fs.gs3.list.page", 1000)
    workDir = new Path(fsUri.toString + "/")
  }

  override def getScheme: String = "gs3"
  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(dir: Path): Unit = { workDir = dir }

  /** /bucket/key for a qualified path. */
  private def bucketKey(p: Path): String = {
    val abs = makeQualified(p).toUri.getPath.stripPrefix("/")
    require(abs.nonEmpty, s"path needs a bucket: $p")
    abs
  }

  // ---------------------------------------------------------------- read

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val st = getFileStatus(f) // throws FileNotFoundException
    new FSDataInputStream(new S3Input(bucketKey(f), st.getLen))
  }

  /** Ranged-GET input: sequential reads consume one open ranged stream;
    * seek closes and re-opens from the new position (an S3 read IS a
    * ranged GET — there is no server-side cursor).
    */
  private final class S3Input(bk: String, len: Long) extends FSInputStream {
    private var pos = 0L
    private var in: InputStream = _
    private var inPos = -1L

    private def ensure(): Unit = {
      if (in == null || inPos != pos) {
        if (in != null) in.close()
        if (pos >= len) { in = InputStream.nullInputStream(); inPos = pos }
        else {
          val c = connect("GET", s"/${encPath(bk)}", Map("Range" -> s"bytes=$pos-"))
          val code = c.getResponseCode
          if (code != 200 && code != 206) throw new IOException(s"GET $bk: $code")
          in = c.getInputStream
          inPos = pos
        }
      }
    }

    override def read(): Int = {
      ensure()
      val b = in.read()
      if (b >= 0) { pos += 1; inPos += 1 }
      b
    }

    override def read(buf: Array[Byte], off: Int, n: Int): Int = {
      ensure()
      val r = in.read(buf, off, n)
      if (r > 0) { pos += r; inPos += r }
      r
    }

    override def seek(newPos: Long): Unit = {
      if (newPos < 0 || newPos > len) throw new IOException(s"seek $newPos out of [0,$len]")
      pos = newPos
    }
    override def getPos: Long = pos
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def close(): Unit = if (in != null) in.close()
  }

  // --------------------------------------------------------------- write

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    if (!overwrite && exists(f))
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
    new FSDataOutputStream(new S3Output(bucketKey(f)), statistics)
  }

  /** The streaming multipart writer (see class doc). */
  private final class S3Output(bk: String) extends OutputStream {
    private val buf = new ByteArrayOutputStream(math.min(partSize, 1 << 20))
    private var uploadId: Option[String] = None
    private var partNumber = 1
    private var closed = false

    override def write(b: Int): Unit = { buf.write(b); maybeShip() }
    override def write(b: Array[Byte], off: Int, n: Int): Unit = {
      // ship in part-size slices so the buffer never exceeds one part
      var o = off
      var left = n
      while (left > 0) {
        val take = math.min(left, partSize - buf.size())
        buf.write(b, o, take)
        o += take; left -= take
        maybeShip()
      }
    }

    private def maybeShip(): Unit = if (buf.size() >= partSize) shipPart()

    private def shipPart(): Unit = {
      val id = uploadId.getOrElse {
        val resp = request("POST", s"/${encPath(bk)}?uploads", Array.emptyByteArray)
        val found = xmlField(resp, "UploadId").getOrElse(
          throw new IOException(s"no UploadId for $bk"))
        uploadId = Some(found)
        found
      }
      val body = buf.toByteArray
      buf.reset()
      val code = requestCode("PUT", s"/${encPath(bk)}?partNumber=$partNumber&uploadId=$id", body)
      if (code != 200) throw new IOException(s"UploadPart $partNumber of $bk: $code")
      partNumber += 1
    }

    override def close(): Unit = {
      if (closed) return
      closed = true
      uploadId match {
        case None =>
          // never crossed one part: single-shot PUT (s3manager's small-object path)
          val code = requestCode("PUT", s"/${encPath(bk)}", buf.toByteArray)
          if (code != 200) throw new IOException(s"PUT $bk: $code")
        case Some(id) =>
          if (buf.size() > 0) shipPart()
          val code = requestCode("POST", s"/${encPath(bk)}?uploadId=$id", Array.emptyByteArray)
          if (code != 200) throw new IOException(s"CompleteMultipartUpload $bk: $code")
      }
    }
  }

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("S3 objects are immutable; no append")

  // ------------------------------------------------------------ metadata

  override def getFileStatus(f: Path): FileStatus = {
    val bk = bucketKey(f)
    if (!bk.contains("/")) return dirStatus(f) // bucket root
    val head = connect("HEAD", s"/${encPath(bk)}", Map.empty)
    if (head.getResponseCode == 200) {
      val len = head.getHeaderField("Content-Length").toLong
      new FileStatus(len, false, 1, blockSizeOf, 0L, makeQualified(f))
    } else {
      // a "directory" exists iff anything lives under key/ (incl. marker)
      if (prefixNonEmpty(bk + "/")) dirStatus(f)
      else throw new java.io.FileNotFoundException(f.toString)
    }
  }

  private def blockSizeOf: Long = 128L * 1024 * 1024
  private def dirStatus(f: Path): FileStatus =
    new FileStatus(0, true, 1, blockSizeOf, 0L, makeQualified(f))

  override def listStatus(f: Path): Array[FileStatus] = {
    val st = getFileStatus(f)
    if (st.isFile) return Array(st)
    val bk = bucketKey(f)
    val prefix = if (bk.contains("/")) bk.substring(bk.indexOf('/') + 1) + "/" else ""
    val bucket = bk.takeWhile(_ != '/')
    val (contents, prefixes) = listRaw(bk + "/", delimiter = Some("/"))
    val base = makeQualified(f)
    val files = contents.collect {
      case (k, size) if k != prefix => // skip the dir marker itself
        new FileStatus(size, false, 1, blockSizeOf, 0L,
          new Path(s"$fsUri/$bucket/$k"))
    }
    val dirs = prefixes.map { p =>
      new Path(s"$fsUri/$bucket/${p.stripSuffix("/")}")
    }.map(d => new FileStatus(0, true, 1, blockSizeOf, 0L, d))
    (files ++ dirs).toArray
  }

  /** Existence probe: one max-keys=1 request, no pagination walk. */
  private def prefixNonEmpty(bkPrefix: String): Boolean = {
    val bucket = bkPrefix.takeWhile(_ != '/')
    val keyPrefix = bkPrefix.substring(bkPrefix.indexOf('/') + 1)
    val resp = new String(
      requestBytes("GET",
        s"/$bucket?list-type=2&prefix=${enc(keyPrefix)}&max-keys=1"),
      java.nio.charset.StandardCharsets.UTF_8)
    resp.contains("<Contents>") || resp.contains("<CommonPrefixes>")
  }

  /** (Contents(key,size), CommonPrefixes) for `/bucket/key...` prefix.
    *
    * Follows `NextContinuationToken` until `IsTruncated=false`, so a
    * directory with more keys than one ListObjectsV2 page (a parquet
    * table with tens of thousands of part files at 100 TB scale) is
    * enumerated completely — a single-shot list with a large max-keys
    * would silently truncate and corrupt listStatus/rename/delete.
    * Page size comes from `fs.gs3.list.page` (specs shrink it to force
    * multi-page walks over small fixtures).
    */
  private def listRaw(bkPrefix: String, delimiter: Option[String])
      : (Vector[(String, Long)], Vector[String]) = {
    val bucket = bkPrefix.takeWhile(_ != '/')
    val keyPrefix = bkPrefix.substring(bkPrefix.indexOf('/') + 1)
    val d = delimiter.map(x => s"&delimiter=${enc(x)}").getOrElse("")
    val contents = Vector.newBuilder[(String, Long)]
    val prefixes = Vector.newBuilder[String]
    var token: Option[String] = None
    var more = true
    while (more) {
      val t = token.map(x => s"&continuation-token=${enc(x)}").getOrElse("")
      val resp = new String(
        requestBytes("GET",
          s"/$bucket?list-type=2&prefix=${enc(keyPrefix)}$d&max-keys=$listPage$t"),
        java.nio.charset.StandardCharsets.UTF_8)
      "<Contents>.*?</Contents>".r.findAllIn(resp).foreach { c =>
        val k = xmlField(c, "Key").getOrElse(throw new IOException("list: no Key"))
        val size = xmlField(c, "Size").getOrElse("0").toLong
        contents += ((xmlUnesc(k), size))
      }
      "<CommonPrefixes>.*?</CommonPrefixes>".r.findAllIn(resp)
        .flatMap(p => xmlField(p, "Prefix")).foreach(p => prefixes += xmlUnesc(p))
      more = xmlField(resp, "IsTruncated").contains("true")
      token = xmlField(resp, "NextContinuationToken").map(xmlUnesc)
      if (more && token.isEmpty)
        throw new IOException("list: truncated response without continuation token")
    }
    (contents.result(), prefixes.result())
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    val bk = bucketKey(f)
    if (!bk.contains("/")) return true // bucket root
    // leaf marker only — S3 has no directories; parents are implied
    requestCode("PUT", s"/${encPath(bk)}/", Array.emptyByteArray) == 200
  }

  // -------------------------------------------------------- rename/delete

  override def rename(src: Path, dst: Path): Boolean = {
    val srcSt =
      try getFileStatus(src)
      catch { case _: java.io.FileNotFoundException => return false }
    val target =
      try {
        val d = getFileStatus(dst)
        if (d.isFile) return false // cannot clobber a file
        new Path(dst, src.getName) // HDFS semantics: move INTO existing dir
      } catch { case _: java.io.FileNotFoundException => dst }
    val srcBk = bucketKey(src)
    val dstBk = bucketKey(target)
    if (srcSt.isFile) {
      copyOne(srcBk, dstBk)
      requestCode("DELETE", s"/${encPath(srcBk)}", Array.emptyByteArray)
    } else {
      val (contents, _) = listRaw(srcBk + "/", delimiter = None)
      val bucket = srcBk.takeWhile(_ != '/')
      val srcKey = srcBk.substring(srcBk.indexOf('/') + 1)
      val dstKey = dstBk.substring(dstBk.indexOf('/') + 1)
      // server-side copies are independent — run them on a bounded pool.
      // The committer path renames a task dir with hundreds of part
      // files; serial round-trips would make commit latency linear in
      // file count.
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(16, math.max(1, contents.size)))
      try {
        val futs = contents.map { case (k, _) =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            override def call(): Unit = {
              val suffix = k.stripPrefix(srcKey + "/")
              val to = s"$bucket/$dstKey/$suffix"
              if (k.endsWith("/"))
                requestCode("PUT", s"/${encPath(to)}", Array.emptyByteArray)
              else copyOne(s"$bucket/$k", to)
            }
          })
        }
        futs.foreach(_.get()) // surface the first copy failure
      } finally pool.shutdown()
      // sources go in one batched DeleteObjects sweep, not N round-trips
      deleteBatch(bucket, contents.map(_._1) :+ (srcKey + "/"))
    }
    true
  }

  /** DeleteObjects in chunks of 1000 (the wire cap): one POST per chunk. */
  private def deleteBatch(bucket: String, keys: Seq[String]): Unit =
    keys.grouped(1000).foreach { chunk =>
      val body = new StringBuilder
      body ++= """<?xml version="1.0" encoding="UTF-8"?><Delete>"""
      chunk.foreach(k => body ++= s"<Object><Key>${xmlEsc(k)}</Key></Object>")
      body ++= "</Delete>"
      val resp = request("POST", s"/$bucket?delete",
        body.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val deleted = "<Deleted>".r.findAllIn(resp).size
      if (deleted != chunk.size)
        throw new IOException(
          s"DeleteObjects: ${chunk.size} requested, $deleted confirmed")
    }

  private def copyOne(fromBk: String, toBk: String): Unit = {
    val c = connect("PUT", s"/${encPath(toBk)}", Map("x-amz-copy-source" -> s"/${encPath(fromBk)}"))
    c.setFixedLengthStreamingMode(0)
    c.setDoOutput(true)
    c.getOutputStream.close()
    val code = c.getResponseCode
    consume(c)
    if (code != 200) throw new IOException(s"copy $fromBk -> $toBk: $code")
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val st =
      try getFileStatus(f)
      catch { case _: java.io.FileNotFoundException => return false }
    val bk = bucketKey(f)
    if (st.isFile) requestCode("DELETE", s"/${encPath(bk)}", Array.emptyByteArray) == 204
    else {
      val (contents, _) = listRaw(bk + "/", delimiter = None)
      val real = contents.filterNot(_._1.endsWith("/"))
      if (real.nonEmpty && !recursive)
        throw new IOException(s"directory not empty: $f")
      val bucket = bk.takeWhile(_ != '/')
      val dirKey = bk.substring(bk.indexOf('/') + 1)
      deleteBatch(bucket, contents.map(_._1) :+ (dirKey + "/"))
      true
    }
  }

  // ---------------------------------------------------------------- http

  private def connect(method: String, pathAndQuery: String,
                      headers: Map[String, String]): HttpURLConnection = {
    val c = new URL(endpoint + pathAndQuery).openConnection()
      .asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    c.setConnectTimeout(15000)
    c.setReadTimeout(120000)
    headers.foreach { case (k, v) => c.setRequestProperty(k, v) }
    c
  }

  private def requestCode(method: String, pathAndQuery: String,
                          body: Array[Byte]): Int = {
    val c = connect(method, pathAndQuery, Map.empty)
    if (method == "PUT" || method == "POST") {
      c.setDoOutput(true)
      c.setFixedLengthStreamingMode(body.length)
      val out = c.getOutputStream
      try out.write(body) finally out.close()
    }
    val code = c.getResponseCode
    consume(c)
    code
  }

  private def request(method: String, pathAndQuery: String,
                      body: Array[Byte]): String = {
    val c = connect(method, pathAndQuery, Map.empty)
    if (method == "PUT" || method == "POST") {
      c.setDoOutput(true)
      c.setFixedLengthStreamingMode(body.length)
      val out = c.getOutputStream
      try out.write(body) finally out.close()
    }
    val code = c.getResponseCode
    val resp = new String(readAll(
      if (code >= 400) c.getErrorStream else c.getInputStream),
      java.nio.charset.StandardCharsets.UTF_8)
    if (code != 200) throw new IOException(s"$method $pathAndQuery: $code $resp")
    resp
  }

  private def requestBytes(method: String, pathAndQuery: String): Array[Byte] = {
    val c = connect(method, pathAndQuery, Map.empty)
    val code = c.getResponseCode
    val b = readAll(if (code >= 400) c.getErrorStream else c.getInputStream)
    if (code != 200) throw new IOException(
      s"$method $pathAndQuery: $code ${new String(b, java.nio.charset.StandardCharsets.UTF_8)}")
    b
  }

  private def readAll(in: InputStream): Array[Byte] = {
    if (in == null) return Array.emptyByteArray
    val out = new ByteArrayOutputStream()
    try {
      val buf = new Array[Byte](1 << 16)
      var r = in.read(buf)
      while (r >= 0) { if (r > 0) out.write(buf, 0, r); r = in.read(buf) }
    } finally in.close()
    out.toByteArray
  }

  private def consume(c: HttpURLConnection): Unit = {
    val in = if (c.getResponseCode >= 400) c.getErrorStream else c.getInputStream
    if (in != null) {
      val buf = new Array[Byte](8192)
      try { while (in.read(buf) >= 0) () } finally in.close()
    }
  }

  private def xmlField(xml: String, tag: String): Option[String] =
    s"<$tag>(.*?)</$tag>".r.findFirstMatchIn(xml).map(_.group(1))

  private def xmlUnesc(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")

  private def xmlEsc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  /** Percent-encode a `bucket/key` path for the request line: every
    * byte outside the URI unreserved set (plus '/') becomes %XX. The
    * server decodes exactly once, so literal '%', '+', and spaces in
    * keys round-trip — Spark's partition-dir escaping writes literal
    * '%' routinely (`ts=00%3A00`), and a raw interpolation would be
    * double-decoded server-side.
    */
  private def encPath(bk: String): String = {
    val sb = new StringBuilder(bk.length + 8)
    bk.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      val unreserved = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '/' || c == '-' || c == '.' ||
        c == '_' || c == '~'
      if (unreserved) sb += c else sb ++= f"%%${b & 0xff}%02X"
    }
    sb.toString
  }
}
