package graft.pipes

import java.io.FileInputStream
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame

/** File/HDFS/S3 sink with the reference's integrity protocol.
  *
  * Reference behavior (/root/reference/pipe/file.go):
  *  - size-based rotation (:598-602)            → `maxRecordsPerFile`
  *  - `.open` → rename commit protocol (:545-572) → Spark task-commit
  *    temp-file protocol (free)
  *  - gzip compression chain (:494-497)          → codec option
  *  - SHA-256 per file + `_DONE` manifest
  *    `[{"NumRecs":N,"Hash":"…","FileName":"…"}]` on close (:717-760)
  *    → post-commit manifest pass below
  *
  * PGP encrypt+sign (:384-437) is deliberately out of scope for this
  * round (no crypto provider guarantee in-container); the hook is the
  * same post-commit pass.
  */
object FileSink {

  /** Write a DataFrame as JSON-lines (the CF wire format is a string
    * column) or parquet, then write the `_DONE` manifest. Returns the
    * manifest entries.
    */
  def write(df: DataFrame, path: String, format: String = "json",
            maxRecordsPerFile: Long = 0, gzip: Boolean = false): Seq[Manifest] = {
    var w = df.write.mode("overwrite").format(format)
    if (maxRecordsPerFile > 0) w = w.option("maxRecordsPerFile", maxRecordsPerFile)
    if (gzip && format != "parquet") w = w.option("compression", "gzip")
    w.save(path)
    writeDoneManifest(path, format)
  }

  final case class Manifest(fileName: String, numRecs: Long, hash: String)

  /** SHA-256 each data file and write `<dir>/_DONE` (end-of-stream marker,
    * K6). NumRecs counts newline-delimited records for JSON; -1 for
    * binary formats (hash still guards integrity).
    */
  def writeDoneManifest(path: String, format: String): Seq[Manifest] = {
    val dir = Paths.get(path)
    val files = Files.list(dir).iterator()
    val entries = scala.collection.mutable.ArrayBuffer.empty[Manifest]
    files.forEachRemaining { p =>
      val name = p.getFileName.toString
      if (!name.startsWith("_") && !name.startsWith(".")) {
        val md = MessageDigest.getInstance("SHA-256")
        var recs = 0L
        val in = new FileInputStream(p.toFile)
        try {
          val buf = new Array[Byte](1 << 16)
          var n = in.read(buf)
          while (n > 0) {
            md.update(buf, 0, n)
            if (format == "json" || format == "text" || format == "csv") {
              var i = 0
              while (i < n) { if (buf(i) == '\n') recs += 1; i += 1 }
            }
            n = in.read(buf)
          }
        } finally in.close()
        val hash = md.digest().map("%02x".format(_)).mkString
        entries += Manifest(name,
          if (format == "json" || format == "text" || format == "csv") recs else -1L, hash)
      }
    }
    val sorted = entries.sortBy(_.fileName).toSeq
    val json = sorted.map(m =>
      s"""{"NumRecs":${m.numRecs},"Hash":"${m.hash}","FileName":"${m.fileName}"}""")
      .mkString("[", ",", "]")
    Files.write(dir.resolve("_DONE"), json.getBytes)
    sorted
  }
}
