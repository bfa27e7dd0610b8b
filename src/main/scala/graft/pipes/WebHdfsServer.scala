package graft.pipes

import java.io.{File, FileInputStream, FileOutputStream, IOException}
import java.net.{InetAddress, InetSocketAddress}
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Loopback WebHDFS REST server — the socket half of the HDFS sink
  * (K3), closing the gap SchemeFsSpec's config-registered local
  * FileSystem left: there, no byte crossed a wire. Here the client is
  * Hadoop's OWN `WebHdfsFileSystem` (`webhdfs://` — the same
  * hadoop-client code path a production `hdfs://` sink shares for
  * FileSystem semantics: create/rename/listStatus/open/delete + the
  * HTTP retry policy), and this server implements the public WebHDFS
  * REST protocol (Hadoop docs: WebHDFS REST API) over a local backing
  * directory:
  *
  *  - namenode ops return JSON (`FileStatus(es)`, `boolean`) on
  *    `/webhdfs/v1{path}?op=...`
  *  - CREATE/OPEN/APPEND are TWO-STEP: the namenode answers
  *    307 Temporary Redirect with a datanode Location, and the client
  *    re-issues the request with data to that location — both roles are
  *    played by this one server (`datanode=true` marks the second hop)
  *  - errors are `RemoteException` JSON with the proper HTTP status, so
  *    the client surfaces real `FileNotFoundException`s
  *  - `failNextCreates(n)` injects transient retriable 500s on the
  *    namenode hop, so a spec can prove the hadoop-client retry policy
  *    actually retries (the reference wraps every HDFS call in
  *    retry-on-Standby, /root/reference/pipe/hdfs.go:37-180)
  *
  * The reference's HDFS pipe is its file pipe pointed at an HDFS
  * FileSystem (pipe/hdfs.go); mirroring that, [[FileSink]] and the
  * `_DONE` manifest work unchanged over `webhdfs://` — see
  * WebHdfsSpec / q_webhdfs_sink.
  */
final class WebHdfsServer(backing: File) extends AutoCloseable {
  require(backing.isDirectory, s"backing dir missing: $backing")

  private val server = HttpServer.create(
    new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 64)
  private val pendingCreateFailures = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Make the next `n` namenode CREATE requests fail with a retriable
    * 500. The NAMENODE hop is where transient failures are survivable:
    * it is idempotent (no body yet), so the client's retry policy can
    * re-issue it — a mid-stream datanode failure cannot be replayed
    * (the request body is gone) and correctly surfaces instead.
    */
  def failNextCreates(n: Int): Unit = pendingCreateFailures.set(n)

  def port: Int = server.getAddress.getPort
  /** `webhdfs://` URI for Hadoop clients. */
  def uri: String = s"webhdfs://127.0.0.1:$port"

  server.createContext("/webhdfs/v1", (ex: HttpExchange) => {
    try handle(ex)
    catch {
      case e: Exception => // defensive: a handler bug must not wedge the client
        try respondJson(ex, 500, remoteException("IOException", "java.io.IOException", e.toString))
        catch { case _: IOException => () }
    } finally ex.close()
  })
  // daemon workers: a memoized process-lifetime server must never hold
  // the JVM open after main() returns
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8,
    (r: Runnable) => {
      val t = new Thread(r, "graft-webhdfs-worker")
      t.setDaemon(true)
      t
    }))
  locally {
    // the HTTP-Dispatcher thread is spawned inside start() and inherits
    // daemon-ness from the CALLING thread — start from a daemon thread
    // or the dispatcher pins the JVM open (a Verify run hung on exactly
    // this)
    val starter = new Thread(() => server.start(), "graft-webhdfs-start")
    starter.setDaemon(true)
    starter.start()
    starter.join()
  }

  override def close(): Unit = server.stop(0)

  // ------------------------------------------------------------ handler

  private def handle(ex: HttpExchange): Unit = {
    val q = parseQuery(ex.getRequestURI.getRawQuery)
    val op = q.getOrElse("op", "").toUpperCase
    val rel = ex.getRequestURI.getPath.stripPrefix("/webhdfs/v1")
    val f = resolve(rel)
    val isData = q.get("datanode").contains("true")
    val method = ex.getRequestMethod.toUpperCase

    // Atomic check-and-decrement floored at 0: concurrent namenode CREATEs
    // must consume exactly n injected failures, never more (a plain
    // check-then-decrement lets two racers both pass the check).
    if (!isData && method == "PUT" && op == "CREATE" &&
        pendingCreateFailures.getAndUpdate(n => math.max(0, n - 1)) > 0) {
      // injected transient: the retry policy must re-issue, not give up
      drain(ex)
      respondJson(ex, 500, remoteException("RetriableException",
        "org.apache.hadoop.ipc.RetriableException",
        "injected transient namenode failure"))
      return
    }

    (method, op) match {
      case ("GET", "GETFILESTATUS") =>
        if (!f.exists()) respondJson(ex, 404,
          remoteException("FileNotFoundException", "java.io.FileNotFoundException", s"File does not exist: $rel"))
        else respondJson(ex, 200, s"""{"FileStatus":${statusJson(f, withName = false)}}""")

      case ("GET", "LISTSTATUS") =>
        if (!f.exists()) respondJson(ex, 404,
          remoteException("FileNotFoundException", "java.io.FileNotFoundException", s"File does not exist: $rel"))
        else {
          // listing a FILE returns its own status with EMPTY pathSuffix
          // (spec): a name here would make the client double the path
          val arr =
            if (f.isFile) statusJson(f, withName = false)
            else Option(f.listFiles()).getOrElse(Array.empty[File]).sortBy(_.getName)
              .map(k => statusJson(k, withName = true)).mkString(",")
          respondJson(ex, 200, s"""{"FileStatuses":{"FileStatus":[$arr]}}""")
        }

      case ("GET", "LISTSTATUS_BATCH") =>
        if (!f.exists()) respondJson(ex, 404,
          remoteException("FileNotFoundException", "java.io.FileNotFoundException", s"File does not exist: $rel"))
        else {
          // single-batch listing: everything at once, nothing remaining
          // (file case: own status, empty pathSuffix — see LISTSTATUS)
          val arr =
            if (f.isFile) statusJson(f, withName = false)
            else {
              val kids = Option(f.listFiles()).getOrElse(Array.empty[File]).sortBy(_.getName)
              val start = q.get("startAfter")
                .map(a => kids.indexWhere(_.getName == a) + 1).getOrElse(0)
              kids.drop(start).map(k => statusJson(k, withName = true)).mkString(",")
            }
          respondJson(ex, 200,
            s"""{"DirectoryListing":{"partialListing":{"FileStatuses":{"FileStatus":[$arr]}},"remainingEntries":0}}""")
        }

      case ("PUT", "MKDIRS") =>
        f.mkdirs()
        respondJson(ex, 200, s"""{"boolean":${f.isDirectory}}""")

      case ("DELETE", "DELETE") =>
        val recursive = q.get("recursive").contains("true")
        val ok =
          if (!f.exists()) false
          else if (f.isDirectory && recursive) { deleteRec(f); true }
          else f.delete()
        respondJson(ex, 200, s"""{"boolean":$ok}""")

      case ("PUT", "RENAME") =>
        val dst = resolve(q.getOrElse("destination",
          throw new IllegalArgumentException("RENAME needs destination")))
        dst.getParentFile.mkdirs()
        respondJson(ex, 200, s"""{"boolean":${f.renameTo(dst)}}""")

      case ("PUT", "CREATE") if !isData =>
        redirect(ex, rel, q) // namenode hop: send the client to the "datanode"

      case ("PUT", "CREATE") =>
        val overwrite = q.get("overwrite").forall(_ == "true")
        if (f.exists() && !overwrite) {
          drain(ex)
          respondJson(ex, 403, remoteException("FileAlreadyExistsException",
            "org.apache.hadoop.fs.FileAlreadyExistsException", s"File already exists: $rel"))
        } else {
          f.getParentFile.mkdirs()
          writeBody(ex, f, append = false)
          ex.getResponseHeaders.add("Location", s"$uri/webhdfs/v1$rel")
          respondJson(ex, 201, "{}")
        }

      case ("POST", "APPEND") if !isData =>
        redirect(ex, rel, q)

      case ("POST", "APPEND") =>
        if (!f.exists()) { drain(ex); respondJson(ex, 404,
          remoteException("FileNotFoundException", "java.io.FileNotFoundException", s"File does not exist: $rel")) }
        else { writeBody(ex, f, append = true); respondJson(ex, 200, "{}") }

      case ("GET", "OPEN") if !isData =>
        redirect(ex, rel, q)

      case ("GET", "OPEN") =>
        if (!f.isFile) respondJson(ex, 404,
          remoteException("FileNotFoundException", "java.io.FileNotFoundException", s"File does not exist: $rel"))
        else {
          val offset = q.get("offset").map(_.toLong).getOrElse(0L)
          val length = q.get("length").map(_.toLong)
            .getOrElse(f.length() - offset)
          val n = math.max(0L, math.min(length, f.length() - offset))
          ex.getResponseHeaders.add("Content-Type", "application/octet-stream")
          ex.sendResponseHeaders(200, if (n == 0) -1 else n)
          if (n > 0) {
            val in = new FileInputStream(f)
            val out = ex.getResponseBody
            try {
              // skip() may short-skip; a partial seek would serve wrong
              // bytes to a range read (parquet footer reads, seeks)
              var toSkip = offset
              while (toSkip > 0) {
                val s = in.skip(toSkip)
                if (s <= 0) throw new IOException(s"cannot seek to $offset in $rel")
                toSkip -= s
              }
              val buf = new Array[Byte](1 << 16)
              var left = n
              while (left > 0) {
                val r = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
                if (r < 0) left = 0 else { out.write(buf, 0, r); left -= r }
              }
            } finally { in.close(); out.close() }
          }
        }

      case ("GET", "GETFILEBLOCKLOCATIONS") =>
        if (!f.isFile) respondJson(ex, 404,
          remoteException("FileNotFoundException", "java.io.FileNotFoundException", s"File does not exist: $rel"))
        else {
          // one local "block" spanning the file — enough for locality
          // scheduling, which a loopback server cannot meaningfully give
          respondJson(ex, 200,
            s"""{"BlockLocations":{"BlockLocation":[{"cachedHosts":[],"corrupt":false,""" +
              s""""hosts":["127.0.0.1"],"length":${f.length()},"names":["127.0.0.1:$port"],""" +
              s""""offset":0,"storageTypes":["DISK"],"topologyPaths":["/default-rack/127.0.0.1:$port"]}]}}""")
        }

      case ("GET", "GETSERVERDEFAULTS") =>
        // checksum fields per FsServerDefaults JSON shape
        respondJson(ex, 200,
          """{"FsServerDefaults":{"blockSize":134217728,"bytesPerChecksum":512,
            |"writePacketSize":65536,"replication":1,"fileBufferSize":4096,
            |"encryptDataTransfer":false,"trashInterval":0,"checksumType":2,
            |"keyProviderUri":"","defaultStoragePolicyId":7}}""".stripMargin.replace("\n", ""))

      case ("GET", "GETTRASHROOT") =>
        respondJson(ex, 200, s"""{"Path":"/user/graft/.Trash"}""")

      case _ =>
        drain(ex)
        respondJson(ex, 400, remoteException("UnsupportedOperationException",
          "java.lang.UnsupportedOperationException", s"unsupported: $method op=$op"))
    }
  }

  // ------------------------------------------------------------ helpers

  /** The datanode redirect: same server, `datanode=true` marker added —
    * the client follows `Location` blindly, exactly as it would to a
    * real datanode's http address.
    */
  private def redirect(ex: HttpExchange, rel: String, q: Map[String, String]): Unit = {
    drain(ex)
    val keep = q.filterNot { case (k, _) => k == "datanode" }
      .map { case (k, v) => s"$k=${urlEnc(v)}" }.mkString("&")
    val loc = s"http://127.0.0.1:$port/webhdfs/v1${urlEncPath(rel)}?$keep&datanode=true"
    ex.getResponseHeaders.add("Location", loc)
    ex.sendResponseHeaders(307, -1)
  }

  private def writeBody(ex: HttpExchange, f: File, append: Boolean): Unit = {
    val in = ex.getRequestBody
    val out = new FileOutputStream(f, append)
    try {
      val buf = new Array[Byte](1 << 16)
      var r = in.read(buf)
      while (r >= 0) { if (r > 0) out.write(buf, 0, r); r = in.read(buf) }
    } finally { out.close(); in.close() }
  }

  private def statusJson(f: File, withName: Boolean): String = {
    val tpe = if (f.isDirectory) "DIRECTORY" else "FILE"
    val suffix = if (withName) f.getName else ""
    s"""{"accessTime":${f.lastModified()},"blockSize":134217728,""" +
      s""""childrenNum":0,"fileId":0,"group":"graft","length":${if (f.isFile) f.length() else 0L},""" +
      s""""modificationTime":${f.lastModified()},"owner":"graft","pathSuffix":"$suffix",""" +
      s""""permission":"${if (f.isDirectory) "755" else "644"}","replication":1,""" +
      s""""storagePolicy":0,"type":"$tpe"}"""
  }

  /** The client maps `javaClassName` back to a real exception class, so
    * it must be the actual FQCN (e.g. the retry policy recognizes
    * `org.apache.hadoop.ipc.RetriableException` by name).
    */
  private def remoteException(exception: String, javaClassName: String,
                              message: String): String = {
    val safe = message.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"RemoteException":{"exception":"$exception",""" +
      s""""javaClassName":"$javaClassName","message":"$safe"}}"""
  }

  private def respondJson(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, b.length)
    val out = ex.getResponseBody
    try out.write(b) finally out.close()
  }

  /** Read and discard any request body (required before responding on
    * exchanges whose sender used Expect/continue or chunked bodies).
    */
  private def drain(ex: HttpExchange): Unit = {
    val in = ex.getRequestBody
    val buf = new Array[Byte](8192)
    while (in.read(buf) >= 0) ()
  }

  private def deleteRec(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[File]).foreach(deleteRec)
    f.delete(); ()
  }

  private def resolve(rel: String): File = {
    val dec = java.net.URLDecoder.decode(rel, "UTF-8")
    val f = new File(backing, dec).getCanonicalFile
    require(f.getPath.startsWith(backing.getCanonicalPath),
      s"path escapes backing dir: $rel")
    f
  }

  private def parseQuery(raw: String): Map[String, String] =
    Option(raw).map(_.split("&").iterator.filter(_.nonEmpty).map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => k -> java.net.URLDecoder.decode(v, "UTF-8")
        case Array(k) => k -> ""
      }
    }.toMap).getOrElse(Map.empty)

  private def urlEnc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  private def urlEncPath(p: String): String =
    p.split("/", -1).map(urlEnc).mkString("/").replace("+", "%20")
}
