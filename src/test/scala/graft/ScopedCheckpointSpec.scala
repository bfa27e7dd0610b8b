package graft

import org.apache.spark.sql.functions._

import graft.core.Checkpoints

/** The survivability contract of [[Checkpoints.scoped]], stated as tests:
  * the returned frame is PINNED (replicated cache) before the scope's
  * checkpoint files are deleted, so it must (1) stay readable and correct
  * after the files are gone, and (2) fail LOUDLY — never answer wrongly —
  * if every pinned replica is subsequently lost, which is the documented
  * trade of deleting the scope (a multi-executor-loss event fails the
  * consumer instead of recomputing).
  */
class ScopedCheckpointSpec extends SparkSuite {

  test("scoped result survives deletion of its backing checkpoint files") {
    val base = java.nio.file.Files.createTempDirectory("graft-scope-spec")
    spark.sparkContext.setCheckpointDir(base.toString)
    try {
      val out = Checkpoints.scoped(spark) {
        // body checkpoints mid-computation, like the iterative operators do
        val d = spark.range(0, 1000).select(col("id"), (col("id") % 7).as("m"))
          .checkpoint()
        d.groupBy(col("m")).count()
      }
      // every scope subdir (and with it the checkpoint files) is gone...
      val residue = java.nio.file.Files.walk(base).iterator()
      val files = scala.jdk.CollectionConverters.IteratorHasAsScala(residue)
        .asScala.filter(java.nio.file.Files.isRegularFile(_)).toList
      assert(files.isEmpty, s"checkpoint files survived the scope: $files")
      // ...yet the pinned result is still fully readable and correct:
      // 1000 ids over 7 residues -> 6 groups of 143, one of 142
      val counts = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(counts.size == 7 && counts.values.sum == 1000L)
      out.unpersist(blocking = true)
    } finally {
      spark.sparkContext.setCheckpointDir(null)
      graft.core.Tmp.deleteRecursively(base)
    }
  }

  test("total replica loss after the scope fails the consumer loudly, not wrongly") {
    val base = java.nio.file.Files.createTempDirectory("graft-scope-spec2")
    spark.sparkContext.setCheckpointDir(base.toString)
    try {
      val out = Checkpoints.scoped(spark) {
        spark.range(0, 100).select(col("id")).checkpoint().agg(sum("id").as("s"))
      }
      assert(out.head().getLong(0) == 4950L)
      // simulate losing EVERY replica of the pinned result (the
      // beyond-the-guarantee event: checkpoint files already deleted,
      // now the cache entry goes too)
      out.unpersist(blocking = true)
      val ex = intercept[Exception](out.head())
      val chain = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.toString).mkString("; ")
      assert(chain.contains("Checkpoint") || chain.contains("FileNotFound") ||
        chain.contains("does not exist"),
        s"expected a missing-checkpoint failure, got: $chain")
    } finally {
      spark.sparkContext.setCheckpointDir(null)
      graft.core.Tmp.deleteRecursively(base)
    }
  }
}
