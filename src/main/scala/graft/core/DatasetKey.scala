package graft.core

/** Cheap content key for a dataset directory: the dir path plus a short
  * hash of every file's (relative path, size, mtime). Listing-only — no
  * data is read; any rewrite bumps size or mtime, so a process-lifetime
  * memo keyed by this cannot serve a model/fixture built from data that
  * changed under the same path (the classic stale-model hazard: a bench
  * JVM outliving a dataset refresh). Non-local paths fall back to the
  * raw dir string — remote datasets are not memoized by this process.
  */
object DatasetKey {

  def of(dir: String): String = {
    val root = new java.io.File(dir)
    if (!root.isDirectory) return dir
    val md = java.security.MessageDigest.getInstance("MD5")
    def walk(f: java.io.File): Unit = {
      val kids = Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      kids.sortBy(_.getName).foreach { k =>
        if (k.isDirectory) walk(k)
        else md.update(
          s"${k.getPath.stripPrefix(root.getPath)}|${k.length()}|${k.lastModified()}\n"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    walk(root)
    dir + "@" + md.digest().take(8).map("%02x".format(_)).mkString
  }

  /** Just the hex hash — for identifiers (catalog table names) where the
    * raw path can't appear. Returns "nodir" for non-directories.
    */
  def hashOf(dir: String): String =
    of(dir).split('@') match {
      case Array(_, h) => h
      case _ => "nodir"
    }
}
