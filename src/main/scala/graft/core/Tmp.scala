package graft.core

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Tiny local-filesystem helpers for scratch dirs the engine creates
  * itself (streaming checkpoints, per-invocation RDD checkpoint scopes).
  * Driver-side only — data paths always go through the Hadoop FS API.
  */
object Tmp {

  /** Best-effort recursive delete; never throws (cleanup must not mask
    * the computation's own result or error).
    */
  def deleteRecursively(p: Path): Unit =
    try {
      if (Files.exists(p)) {
        val walk = Files.walk(p)
        try walk.sorted(Comparator.reverseOrder[Path]())
          .forEach(f => { Files.deleteIfExists(f); () })
        finally walk.close()
      }
    } catch { case _: java.io.IOException => () }
}
