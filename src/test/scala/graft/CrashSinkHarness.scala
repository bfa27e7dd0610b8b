package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Shared mid-micro-batch crash harness for the recovery gates
  * (KillRecoverySpec: sinks + state; SourceKillRecoverySpec: the DSv2
  * sources over real wires). The crash lands BETWEEN the offset log and
  * the commit log — the window exactly-once machinery exists for.
  */
trait CrashSinkHarness { self: SparkSuite =>

  /** Canonical result image: rows sorted as strings (column order fixed
    * by the plan; both runs share it).
    */
  protected def image(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("")).sorted.toSeq

  protected def freshDir(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft-kill-$tag")
    p.toFile.deleteOnExit()
    p.toString
  }

  /** Run `plan` through a per-batch-overwrite parquet sink with an
    * optional one-shot crash after writing HALF of batch `crashAt`.
    * Returns the read-back of all batch dirs. A crashed run is resumed
    * once from the same checkpoint.
    */
  protected def runWithSink(s: SparkSession, plan: => DataFrame, out: String,
      ckpt: String, crashAt: Option[Long]): DataFrame = {
    val armed = new java.util.concurrent.atomic.AtomicBoolean(crashAt.isDefined)
    def drain(): Unit =
      plan.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          if (crashAt.contains(id) && armed.getAndSet(false)) {
            // partial sink output: half the batch lands, then the crash.
            // The write ACTION completes first, so a stateful plan has
            // already committed the crashed attempt's state version —
            // recovery must load the prior batch's version, not this one.
            val half = b.count() / 2
            b.limit(half.toInt).write.mode("overwrite").parquet(s"$out/b$id")
            throw new RuntimeException(s"injected crash mid-batch $id")
          }
          b.write.mode("overwrite").parquet(s"$out/b$id")
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    if (crashAt.isDefined) {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](drain())
      assert(e.getMessage.contains("injected crash") ||
        Option(e.getCause).exists(_.getMessage.contains("injected crash")),
        s"expected the injected crash, got: ${e.getMessage}")
      // the crashed batch's offsets are logged but uncommitted; the resume
      // must re-deliver it with state as of the prior batch's end
      drain()
    } else drain()
    s.read.option("recursiveFileLookup", "true").parquet(out)
  }
}
