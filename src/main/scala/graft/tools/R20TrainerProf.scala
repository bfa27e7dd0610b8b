package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** r20 driver-iterative trainer probe (the r19 verdict's task 6): the
  * BPE/WordPiece trainers cost 2-5 s at sf0.1 on vocabulary-bounded
  * data; the claim is the cost is per-round JOB constants (scheduling,
  * codegen, near-empty tasks), not data. Count every Spark job during
  * one invocation — wall, task count, and how task counts distribute —
  * so the fix (fewer tasks per round / fewer rounds' plan growth) aims
  * at the measured constant.
  *
  * Usage: runMain graft.tools.R20TrainerProf [sfDir] [q1,q2,...]
  */
object R20TrainerProf {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val queries = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q_bpe_tokenize", "q_tokenize_apply", "q_wordpiece", "q_optimal_segment")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-r20trainerprof")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Job(id: Int, startMs: Long, var endMs: Long = -1,
      var nTasks: Int = 0, var nStages: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.put(e.jobId, Job(e.jobId, e.time)); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.endMs = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        // attribute stages to the most recent unfinished job (local mode,
        // sequential driver loop — good enough for a profile)
        val j = jobs.values().stream().filter(_.endMs < 0)
          .max((a, b) => a.id.compareTo(b.id))
        if (j.isPresent) {
          j.get().nTasks += e.stageInfo.numTasks
          j.get().nStages += 1
        }
      }
    })

    import scala.jdk.CollectionConverters._
    for (q <- queries; pass <- 1 to 2) {
      jobs.clear()
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(q)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => System.err.println(s"$q failed: $e") }
      val wallS = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      val js = jobs.values().asScala.toSeq.sortBy(_.id)
      val tot = js.map(j => math.max(0L, j.endMs - j.startMs)).sum
      println(f"== $q pass $pass wall $wallS%.2f s, ${js.size} jobs, sum job wall ${tot / 1000.0}%.2f s")
      js.foreach { j =>
        println(f"   job ${j.id}%3d  ${math.max(0L, j.endMs - j.startMs)}%5d ms  stages ${j.nStages}%2d  tasks ${j.nTasks}%4d")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      graft.core.CacheRegistry.releaseAll()
    }
    spark.stop()
  }
}
