package graft.pipes

import java.io.{File, FileInputStream, FileOutputStream, IOException}
import java.net.{InetAddress, InetSocketAddress}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Loopback S3 REST server — the wire half of the S3 sink (K4), the
  * [[WebHdfsServer]] pattern applied to the S3 protocol: the sandbox has
  * no aws jars, so instead of a client-side mock this implements the
  * PUBLIC S3 REST API (AWS docs: REST API reference) in pure JDK over a
  * local backing directory, and a thin [[S3FileSystem]] client speaks it
  * over a real socket. The reference's S3 pipe is `pipe/s3.go:44-268`:
  * a streaming multipart upload (io.Pipe into s3manager.Uploader — the
  * object is NEVER buffered whole), GetObject reads, ListObjectsV2
  * listing, and delete; the operations here are exactly that surface:
  *
  *  - `GET /bucket?list-type=2&prefix=&delimiter=` → ListObjectsV2 XML
  *    (Contents + CommonPrefixes, lexicographic, single page up to
  *    max-keys)
  *  - `GET /bucket/key` (+ `Range: bytes=a-b`) → object bytes / 206
  *  - `HEAD /bucket/key` → metadata probe (200/404)
  *  - `PUT /bucket/key` → single-shot object write
  *  - `PUT /bucket/key` + `x-amz-copy-source` → server-side copy
  *    (no bytes through the client — how a FileSystem shim implements
  *    Hadoop rename on a store with no native rename)
  *  - `POST /bucket/key?uploads` → CreateMultipartUpload → UploadId
  *  - `PUT /bucket/key?uploadId=U&partNumber=N` → stage one part
  *  - `POST /bucket/key?uploadId=U` → CompleteMultipartUpload
  *    (concatenate parts in part order, atomically publish the key)
  *  - `DELETE /bucket/key?uploadId=U` → AbortMultipartUpload
  *  - `DELETE /bucket/key` → DeleteObject
  *  - `POST /bucket?delete` → DeleteObjects (≤1000 keys per request)
  *
  * No request signing: a loopback fixture authenticates nobody, the
  * protocol surface is what is under test. Counters expose the multipart
  * traffic so specs can prove the streaming path was actually taken.
  */
final class S3Server(backing: File) extends AutoCloseable {
  require(backing.isDirectory, s"backing dir missing: $backing")

  private val server = HttpServer.create(
    new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 64)

  // observability for specs: multipart activity + data-plane op counts
  val multipartCreates = new AtomicInteger(0)
  val partsUploaded = new AtomicInteger(0)
  val multipartCompletes = new AtomicInteger(0)
  val singlePuts = new AtomicInteger(0)
  val batchDeletes = new AtomicInteger(0)
  val bytesIn = new AtomicLong(0L)
  val bytesOut = new AtomicLong(0L)

  /** uploadId → (bucket/key, partNumber → staged part file). Parts are
    * staged on disk, not in memory — a 100 TB object's parts must never
    * accumulate in the server heap.
    */
  private final class Upload(val dest: String) {
    val parts = new ConcurrentHashMap[Int, File]
  }
  private val uploads = new ConcurrentHashMap[String, Upload]()
  private val uploadSeq = new AtomicInteger(0)

  def port: Int = server.getAddress.getPort
  def endpoint: String = s"http://127.0.0.1:$port"

  server.createContext("/", (ex: HttpExchange) => {
    try handle(ex)
    catch {
      case e: Exception =>
        try respondXml(ex, 500,
          errorXml("InternalError", e.toString))
        catch { case _: IOException => () }
    } finally ex.close()
  })
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8,
    (r: Runnable) => {
      val t = new Thread(r, "graft-s3-worker")
      t.setDaemon(true)
      t
    }))
  locally {
    // dispatcher inherits daemon-ness from the STARTING thread (the
    // WebHdfsServer lesson): a memoized process-lifetime server must not
    // pin the JVM open after main() returns
    val starter = new Thread(() => server.start(), "graft-s3-start")
    starter.setDaemon(true)
    starter.start()
    starter.join()
  }

  override def close(): Unit = server.stop(0)

  // ------------------------------------------------------------- handler

  private def handle(ex: HttpExchange): Unit = {
    val q = parseQuery(ex.getRequestURI.getRawQuery)
    // RAW path, decoded exactly once in splitBucketKey — getPath is
    // already-decoded, and decoding it again corrupts any key containing
    // a literal '%xx' sequence (double-decode)
    val path = ex.getRequestURI.getRawPath // /bucket/key... or /bucket
    val method = ex.getRequestMethod.toUpperCase
    val (bucket, key) = splitBucketKey(path)

    (method, key.isEmpty) match {
      case ("GET", true) if q.get("list-type").contains("2") =>
        listObjectsV2(ex, bucket, q)
      case ("GET", false) => getObject(ex, bucket, key)
      case ("HEAD", false) => headObject(ex, bucket, key)
      case ("PUT", false) if q.contains("partNumber") && q.contains("uploadId") =>
        uploadPart(ex, q("uploadId"), q("partNumber").toInt)
      case ("PUT", false) =>
        Option(ex.getRequestHeaders.getFirst("x-amz-copy-source")) match {
          case Some(src) => copyObject(ex, bucket, key, src)
          case None => putObject(ex, bucket, key)
        }
      case ("POST", true) if q.contains("delete") =>
        deleteObjects(ex, bucket)
      case ("POST", false) if q.contains("uploads") =>
        createMultipart(ex, bucket, key)
      case ("POST", false) if q.contains("uploadId") =>
        completeMultipart(ex, bucket, key, q("uploadId"))
      case ("DELETE", false) if q.contains("uploadId") =>
        abortMultipart(ex, q("uploadId"))
      case ("DELETE", false) => deleteObject(ex, bucket, key)
      case _ =>
        drain(ex)
        respondXml(ex, 400, errorXml("InvalidRequest", s"$method $path"))
    }
  }

  private def listObjectsV2(ex: HttpExchange, bucket: String,
                            q: Map[String, String]): Unit = {
    val prefix = q.getOrElse("prefix", "")
    val delimiter = q.get("delimiter").filter(_.nonEmpty)
    val maxKeys = math.max(1, q.get("max-keys").map(_.toInt).getOrElse(1000))
    val token = q.get("continuation-token").filter(_.nonEmpty)
    val all = listKeys(bucket).filter(_._1.startsWith(prefix)).sortBy(_._1)
    // One lexicographic entry stream: keys, with delimiter runs rolled up
    // into a single CommonPrefixes entry at the position of the run's
    // first key. Keys + common prefixes TOGETHER count toward max-keys
    // and the continuation token is the last entry's sort key — the real
    // ListObjectsV2 contract, so a page boundary can never split or
    // duplicate a prefix run.
    val entries: Vector[Either[(String, File), String]] = delimiter match {
      case None => all.map(Left(_))
      case Some(d) =>
        val buf = Vector.newBuilder[Either[(String, File), String]]
        var lastCp: String = null
        all.foreach { case (k, f) =>
          val rest = k.drop(prefix.length)
          val i = rest.indexOf(d)
          if (i < 0) buf += Left((k, f))
          else {
            val cp = prefix + rest.take(i + d.length)
            if (cp != lastCp) { buf += Right(cp); lastCp = cp }
          }
        }
        buf.result()
    }
    def sortKey(e: Either[(String, File), String]): String =
      e.fold(_._1, identity)
    val after = token match {
      case Some(t) => entries.dropWhile(e => sortKey(e) <= t)
      case None => entries
    }
    val page = after.take(maxKeys)
    val truncated = after.size > maxKeys
    val contents = page.collect { case Left(kf) => kf }
    val prefixes = page.collect { case Right(cp) => cp }
    val xml = new StringBuilder
    xml ++= s"""<?xml version="1.0" encoding="UTF-8"?>"""
    xml ++= s"""<ListBucketResult><Name>$bucket</Name><Prefix>${xmlEsc(prefix)}</Prefix>"""
    xml ++= s"""<KeyCount>${page.size}</KeyCount>"""
    xml ++= s"""<MaxKeys>$maxKeys</MaxKeys><IsTruncated>$truncated</IsTruncated>"""
    if (truncated)
      xml ++= s"""<NextContinuationToken>${xmlEsc(sortKey(page.last))}</NextContinuationToken>"""
    contents.foreach { case (k, f) =>
      xml ++= s"""<Contents><Key>${xmlEsc(k)}</Key><Size>${f.length()}</Size>"""
      xml ++= s"""<LastModified>${iso(f.lastModified())}</LastModified>"""
      xml ++= s"""<ETag>&quot;${etagOf(f)}&quot;</ETag><StorageClass>STANDARD</StorageClass></Contents>"""
    }
    prefixes.foreach { p =>
      xml ++= s"""<CommonPrefixes><Prefix>${xmlEsc(p)}</Prefix></CommonPrefixes>"""
    }
    xml ++= "</ListBucketResult>"
    respondXml(ex, 200, xml.toString)
  }

  private def getObject(ex: HttpExchange, bucket: String, key: String): Unit = {
    val f = objectFile(bucket, key)
    if (!f.isFile) { respondXml(ex, 404, errorXml("NoSuchKey", key)); return }
    val len = f.length()
    val range = Option(ex.getRequestHeaders.getFirst("Range"))
    val (from, to) = range match {
      case Some(r) if r.startsWith("bytes=") =>
        r.stripPrefix("bytes=").split("-", 2) match {
          case Array(a, "") => (a.toLong, len - 1)
          case Array("", b) => (math.max(0L, len - b.toLong), len - 1)
          case Array(a, b) => (a.toLong, math.min(b.toLong, len - 1))
        }
      case _ => (0L, len - 1)
    }
    val n = math.max(0L, to - from + 1)
    ex.getResponseHeaders.add("Content-Type", "application/octet-stream")
    ex.getResponseHeaders.add("Accept-Ranges", "bytes")
    if (range.isDefined)
      ex.getResponseHeaders.add("Content-Range", s"bytes $from-$to/$len")
    ex.sendResponseHeaders(if (range.isDefined) 206 else 200, if (n == 0) -1 else n)
    if (n > 0) {
      val in = new FileInputStream(f)
      val out = ex.getResponseBody
      try {
        var toSkip = from
        while (toSkip > 0) {
          val s = in.skip(toSkip)
          if (s <= 0) throw new IOException(s"cannot seek to $from in $key")
          toSkip -= s
        }
        val buf = new Array[Byte](1 << 16)
        var left = n
        while (left > 0) {
          val r = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
          if (r < 0) left = 0
          else { out.write(buf, 0, r); bytesOut.addAndGet(r.toLong); left -= r }
        }
      } finally { in.close(); out.close() }
    }
  }

  private def headObject(ex: HttpExchange, bucket: String, key: String): Unit = {
    val f = objectFile(bucket, key)
    if (f.isFile) {
      ex.getResponseHeaders.add("Content-Type", "application/octet-stream")
      ex.getResponseHeaders.add("Last-Modified", iso(f.lastModified()))
      // HEAD: Content-Length header without a body
      ex.getResponseHeaders.add("Content-Length", f.length().toString)
      ex.sendResponseHeaders(200, -1)
    } else ex.sendResponseHeaders(404, -1)
  }

  private def putObject(ex: HttpExchange, bucket: String, key: String): Unit = {
    val f = objectFile(bucket, key)
    f.getParentFile.mkdirs()
    val tmp = File.createTempFile("s3put", ".tmp", backing)
    writeBody(ex, tmp)
    commitTmp(tmp, f)
    singlePuts.incrementAndGet()
    ex.getResponseHeaders.add("ETag", s""""${etagOf(f)}"""")
    ex.sendResponseHeaders(200, -1)
  }

  private def copyObject(ex: HttpExchange, bucket: String, key: String,
                         rawSrc: String): Unit = {
    drain(ex)
    // copy-source arrives percent-encoded (same encoder as request
    // paths); splitBucketKey performs the single decode
    val (sb, sk) = splitBucketKey("/" + rawSrc.stripPrefix("/"))
    val from = objectFile(sb, sk)
    if (!from.isFile) { respondXml(ex, 404, errorXml("NoSuchKey", sk)); return }
    val to = objectFile(bucket, key)
    to.getParentFile.mkdirs()
    val tmp = File.createTempFile("s3copy", ".tmp", backing)
    val in = new FileInputStream(from)
    val out = new FileOutputStream(tmp)
    try {
      val buf = new Array[Byte](1 << 16)
      var r = in.read(buf)
      while (r >= 0) { if (r > 0) out.write(buf, 0, r); r = in.read(buf) }
    } finally { out.close(); in.close() }
    commitTmp(tmp, to)
    respondXml(ex, 200,
      s"""<?xml version="1.0" encoding="UTF-8"?><CopyObjectResult>""" +
        s"""<LastModified>${iso(to.lastModified())}</LastModified>""" +
        s"""<ETag>&quot;${etagOf(to)}&quot;</ETag></CopyObjectResult>""")
  }

  private def createMultipart(ex: HttpExchange, bucket: String, key: String): Unit = {
    drain(ex)
    val id = s"upload-${uploadSeq.incrementAndGet()}"
    uploads.put(id, new Upload(s"$bucket/$key"))
    multipartCreates.incrementAndGet()
    respondXml(ex, 200,
      s"""<?xml version="1.0" encoding="UTF-8"?><InitiateMultipartUploadResult>""" +
        s"""<Bucket>$bucket</Bucket><Key>${xmlEsc(key)}</Key>""" +
        s"""<UploadId>$id</UploadId></InitiateMultipartUploadResult>""")
  }

  private def uploadPart(ex: HttpExchange, uploadId: String, partNumber: Int): Unit = {
    val up = uploads.get(uploadId)
    if (up == null) { drain(ex); respondXml(ex, 404, errorXml("NoSuchUpload", uploadId)); return }
    val part = File.createTempFile(s"s3part-$uploadId-$partNumber", ".tmp", backing)
    writeBody(ex, part)
    val prev = up.parts.put(partNumber, part)
    if (prev != null) prev.delete() // retried part: last write wins
    partsUploaded.incrementAndGet()
    ex.getResponseHeaders.add("ETag", s""""${etagOf(part)}"""")
    ex.sendResponseHeaders(200, -1)
  }

  private def completeMultipart(ex: HttpExchange, bucket: String, key: String,
                                uploadId: String): Unit = {
    drain(ex) // the part manifest body; staged parts are the authority
    val up = uploads.remove(uploadId)
    if (up == null) { respondXml(ex, 404, errorXml("NoSuchUpload", uploadId)); return }
    val f = objectFile(bucket, key)
    f.getParentFile.mkdirs()
    val tmp = File.createTempFile("s3complete", ".tmp", backing)
    val out = new FileOutputStream(tmp)
    try {
      import scala.jdk.CollectionConverters._
      up.parts.asScala.toSeq.sortBy(_._1).foreach { case (_, part) =>
        val in = new FileInputStream(part)
        try {
          val buf = new Array[Byte](1 << 16)
          var r = in.read(buf)
          while (r >= 0) { if (r > 0) out.write(buf, 0, r); r = in.read(buf) }
        } finally in.close()
        part.delete()
      }
    } finally out.close()
    commitTmp(tmp, f) // the publish is atomic: the key appears complete or not at all
    multipartCompletes.incrementAndGet()
    respondXml(ex, 200,
      s"""<?xml version="1.0" encoding="UTF-8"?><CompleteMultipartUploadResult>""" +
        s"""<Bucket>$bucket</Bucket><Key>${xmlEsc(key)}</Key>""" +
        s"""<ETag>&quot;${etagOf(f)}&quot;</ETag></CompleteMultipartUploadResult>""")
  }

  private def abortMultipart(ex: HttpExchange, uploadId: String): Unit = {
    drain(ex)
    val up = uploads.remove(uploadId)
    if (up != null) {
      import scala.jdk.CollectionConverters._
      up.parts.asScala.values.foreach(_.delete())
    }
    ex.sendResponseHeaders(204, -1)
  }

  private def deleteObject(ex: HttpExchange, bucket: String, key: String): Unit = {
    drain(ex)
    val f = objectFile(bucket, key)
    if (f.isFile) f.delete()
    pruneEmptyDirs(f.getParentFile)
    ex.sendResponseHeaders(204, -1) // S3 delete is idempotent: 204 either way
  }

  /** `POST /bucket?delete` — DeleteObjects: up to 1000 keys per request
    * (the documented S3 cap), one round-trip instead of N. This is the
    * op that makes committer cleanup viable at scale: a temporary dir
    * with 10k task files is 10 requests, not 10k.
    */
  private def deleteObjects(ex: HttpExchange, bucket: String): Unit = {
    val body = new String(readBodyBytes(ex), StandardCharsets.UTF_8)
    val keys = "<Key>(.*?)</Key>".r.findAllMatchIn(body)
      .map(m => xmlUnesc(m.group(1))).toVector
    if (keys.size > 1000) {
      respondXml(ex, 400, errorXml("MalformedXML",
        s"${keys.size} keys exceeds the 1000-key DeleteObjects cap"))
      return
    }
    batchDeletes.incrementAndGet()
    val out = new StringBuilder
    out ++= """<?xml version="1.0" encoding="UTF-8"?><DeleteResult>"""
    keys.foreach { k =>
      val f = objectFile(bucket, k)
      if (f.isFile) f.delete()
      pruneEmptyDirs(f.getParentFile)
      // S3 delete is idempotent: a missing key still reports Deleted
      out ++= s"<Deleted><Key>${xmlEsc(k)}</Key></Deleted>"
    }
    out ++= "</DeleteResult>"
    respondXml(ex, 200, out.toString)
  }

  private def readBodyBytes(ex: HttpExchange): Array[Byte] = {
    val in = ex.getRequestBody
    val buf = new java.io.ByteArrayOutputStream()
    val b = new Array[Byte](1 << 16)
    var r = in.read(b)
    while (r >= 0) { if (r > 0) buf.write(b, 0, r); r = in.read(b) }
    buf.toByteArray
  }

  // ------------------------------------------------------------- helpers

  /** Objects live as files under backing/bucket/<key-with-slashes>.
    * A trailing-slash key (directory marker) is stored with a sentinel
    * suffix so it can coexist with children on a real filesystem.
    */
  private[pipes] def objectFile(bucket: String, key: String): File = {
    val safe = if (key.endsWith("/")) key + ".s3dir" else key
    // separator-anchored confinement to THIS bucket's canonical root: a
    // bare startsWith(backing) would admit '..' hops into sibling buckets
    // and sibling dirs sharing the backing path as a string prefix
    // (/tmp/back vs /tmp/backup)
    val bucketRoot = new File(backing, bucket).getCanonicalFile
    require(bucketRoot.getParentFile != null &&
      bucketRoot.getParentFile.getCanonicalPath == backing.getCanonicalPath,
      s"bucket escapes backing dir: $bucket")
    val f = new File(bucketRoot, safe).getCanonicalFile
    require(f.getPath.startsWith(bucketRoot.getPath + File.separator),
      s"key escapes bucket: $key")
    f
  }

  /** All keys in a bucket (marker files mapped back to `prefix/`). */
  private def listKeys(bucket: String): Vector[(String, File)] = {
    val root = new File(backing, bucket)
    val out = Vector.newBuilder[(String, File)]
    def walk(f: File, rel: String): Unit = {
      val kids = Option(f.listFiles()).getOrElse(Array.empty[File])
      kids.foreach { k =>
        val kr = if (rel.isEmpty) k.getName else s"$rel/${k.getName}"
        if (k.isDirectory) walk(k, kr)
        else if (k.getName == ".s3dir") out += ((rel + "/", k))
        else if (!k.getName.startsWith("s3part-") && !k.getName.startsWith("s3put") &&
                 !k.getName.startsWith("s3copy") && !k.getName.startsWith("s3complete"))
          out += ((kr, k))
      }
    }
    if (root.isDirectory) walk(root, "")
    out.result()
  }

  private def commitTmp(tmp: File, dst: File): Unit = {
    if (dst.exists()) dst.delete()
    if (!tmp.renameTo(dst))
      throw new IOException(s"cannot publish ${dst.getPath}")
  }

  private def pruneEmptyDirs(d: File): Unit = {
    var cur = d
    val stop = backing.getCanonicalPath
    while (cur != null && cur.getCanonicalPath != stop &&
           cur.getCanonicalPath.startsWith(stop) &&
           Option(cur.listFiles()).exists(_.isEmpty)) {
      val parent = cur.getParentFile
      cur.delete()
      cur = parent
    }
  }

  private def writeBody(ex: HttpExchange, f: File): Unit = {
    val in = ex.getRequestBody
    val out = new FileOutputStream(f)
    try {
      val buf = new Array[Byte](1 << 16)
      var r = in.read(buf)
      while (r >= 0) {
        if (r > 0) { out.write(buf, 0, r); bytesIn.addAndGet(r.toLong) }
        r = in.read(buf)
      }
    } finally { out.close(); in.close() }
  }

  /** Content ETag: md5 head sample + length — cheap and stable; nothing
    * client-side validates the exact S3 md5-of-parts convention here.
    */
  private def etagOf(f: File): String = f.length().toHexString + "-1"

  private def iso(ms: Long): String =
    java.time.format.DateTimeFormatter.ISO_INSTANT.format(
      java.time.Instant.ofEpochMilli(ms))

  private def xmlEsc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def xmlUnesc(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")

  private def errorXml(code: String, message: String): String =
    s"""<?xml version="1.0" encoding="UTF-8"?><Error><Code>$code</Code>""" +
      s"""<Message>${xmlEsc(message)}</Message></Error>"""

  private def respondXml(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/xml")
    ex.sendResponseHeaders(code, b.length)
    val out = ex.getResponseBody
    try out.write(b) finally out.close()
  }

  private def drain(ex: HttpExchange): Unit = {
    val in = ex.getRequestBody
    val buf = new Array[Byte](8192)
    while (in.read(buf) >= 0) ()
  }

  /** Decode one percent-encoded URI component WITHOUT form semantics:
    * URLDecoder alone maps a literal '+' to space, but '+' is a legal
    * raw character in a URI path and S3 keys routinely contain it
    * (e.g. `lang=C++`). Escape it first so only %xx sequences decode.
    */
  private def pctDecode(s: String): String =
    java.net.URLDecoder.decode(s.replace("+", "%2B"), "UTF-8")

  private def splitBucketKey(path: String): (String, String) = {
    val p = path.stripPrefix("/")
    p.indexOf('/') match {
      case -1 => (pctDecode(p), "")
      case i => (pctDecode(p.take(i)), pctDecode(p.drop(i + 1)))
    }
  }

  private def parseQuery(raw: String): Map[String, String] =
    Option(raw).map(_.split("&").iterator.filter(_.nonEmpty).map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => k -> java.net.URLDecoder.decode(v, "UTF-8")
        case Array(k) => k -> ""
      }
    }.toMap).getOrElse(Map.empty)
}
