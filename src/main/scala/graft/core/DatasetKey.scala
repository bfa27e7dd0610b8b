package graft.core

/** Cheap content key for a dataset directory: the dir path plus a short
  * hash of every file's (relative path, size, mtime) PLUS an 8 KB
  * head+tail content sample per file. The sample closes the two listing-
  * only gaps: a same-size rewrite landing within the filesystem's mtime
  * granularity (1 ms locally, 1 s on some filesystems) and a fixture
  * whose metadata is stable by construction — either would otherwise
  * serve a stale memoized model/fixture (the classic stale-model hazard:
  * a bench JVM outliving a dataset refresh). Head+tail is positioned
  * reads only, independent of file size, and for the formats fixtures
  * use it is discriminating: parquet carries its footer metadata at the
  * tail, logs/CSV change at the tail by construction. A single FILE path
  * is keyed the same way (size, mtime, sample) instead of falling back
  * to the raw string. Only nonexistent/remote paths fall back to the raw
  * dir string — those datasets are not memoized by this process.
  */
object DatasetKey {

  private val SampleBytes = 4096

  def of(dir: String): String = {
    val root = new java.io.File(dir)
    if (!root.exists()) return dir
    val md = java.security.MessageDigest.getInstance("MD5")
    def hashFile(k: java.io.File): Unit = {
      md.update(
        s"${k.getPath.stripPrefix(root.getPath)}|${k.length()}|${k.lastModified()}\n"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      sample(k, md)
    }
    def walk(f: java.io.File): Unit = {
      val kids = Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      kids.sortBy(_.getName).foreach { k =>
        if (k.isDirectory) walk(k) else hashFile(k)
      }
    }
    if (root.isDirectory) walk(root) else hashFile(root)
    dir + "@" + md.digest().take(8).map("%02x".format(_)).mkString
  }

  /** First and last [[SampleBytes]] of the file — two positioned reads,
    * cost independent of file size.
    */
  private def sample(f: java.io.File, md: java.security.MessageDigest): Unit = {
    val len = f.length()
    if (len <= 0) return
    // The whole read is best-effort: a file deleted OR truncated between
    // length() and readFully (the raced-rewrite scenario the sampling
    // exists to catch) degrades to a metadata-only key instead of
    // crashing the memo path. EOFException extends IOException.
    try {
      val in = new java.io.RandomAccessFile(f, "r")
      try {
        val head = new Array[Byte](math.min(len, SampleBytes.toLong).toInt)
        in.readFully(head)
        md.update(head)
        if (len > SampleBytes) {
          val tail = new Array[Byte](math.min(len - SampleBytes, SampleBytes.toLong).toInt)
          in.seek(len - tail.length)
          in.readFully(tail)
          md.update(tail)
        }
      } finally in.close()
    } catch { case _: java.io.IOException => () }
  }

  /** Just the hex hash — for identifiers (catalog table names) where the
    * raw path can't appear. Returns "nodir" for nonexistent paths.
    */
  def hashOf(dir: String): String =
    of(dir).split('@') match {
      case Array(_, h) => h
      case _ => "nodir"
    }
}
