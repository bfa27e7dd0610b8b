package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r20 hot-key probe for the two r19 window reshapes (verdict task 4):
  *
  *  - substringDedup's duplicate mark is min/max over
  *    Window.partitionBy(h) — a corpus-wide boilerplate window hash puts
  *    every one of its rows into ONE window task (sort included), and
  *    AQE cannot split window partitions.
  *  - curationE2e's keep-first dedup is row_number over
  *    Window.partitionBy(md5(text)) — but it plans as WindowGroupLimit
  *    (partial top-1 per map task BEFORE the exchange), so a hot content
  *    hash ships ≤ one row per map task, not its whole group. The probe
  *    demonstrates the difference.
  *
  * Synthesizes a corpus (N docs, ~40 tokens each) where a fraction
  * `hotFrac` of docs are the SAME boilerplate text (so one window hash /
  * one content hash covers ~hotFrac of all rows), and times:
  *   A. the shipped window form (substringDedupOn)
  *   B. a salted two-phase mark: partial min/max per (h, salt-bucket),
  *      combined per h, duplicate hashes joined back onto the (pinned)
  *      window rows — AQE skew-join can split the probe side
  *   C. the shipped curation keep-first window (WindowGroupLimit) on the
  *      same corpus
  * plus per-form max-task evidence via a stage listener.
  *
  * Usage: runMain graft.tools.R20SkewProbe [nDocs] [hotFracPct]
  */
object R20SkewProbe {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val hotPct = if (args.length > 1) args(1).toInt else 10
    // 40-token boilerplate spreads over 29 distinct window hashes; 12
    // tokens is the true SINGLE-KEY worst case (one window per hot doc,
    // all identical)
    val boilerTokens = if (args.length > 2) args(2).toInt else 40
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-r20skewprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-stage max/median task time evidence
    val taskMs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.ArrayList[Long]]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        taskMs.computeIfAbsent(e.stageId, _ => new java.util.ArrayList[Long]())
          .add(e.taskInfo.duration); ()
      }
    })
    def maxTask(): (Long, Long) = {
      import scala.jdk.CollectionConverters._
      val all = taskMs.values().asScala.flatMap(_.asScala).toSeq.sorted
      if (all.isEmpty) (0L, 0L)
      else (all(all.size / 2), all.last)
    }

    // synthetic corpus: hot docs share one 40-token boilerplate; cold
    // docs get doc-unique tokens (windows never collide across docs)
    val boiler = (0 until boilerTokens).map(i => s"b$i").mkString(" ")
    val d = spark.range(0, n.toLong, 1, 32)
      .select(col("id").as("doc_id"),
        when(pmod(col("id"), lit(100)) < hotPct, lit(boiler))
          .otherwise(concat_ws(" ", (0 until 40).map(i =>
            concat(lit(s"t${i}_"), col("id"))): _*)).as("text"))
      .persist()
    println(s"corpus: $n docs, $hotPct% hot (one shared $boilerTokens-token boilerplate)")
    d.count()

    def time(tag: String)(df: DataFrame): Unit = {
      taskMs.clear()
      spark.sparkContext.setJobDescription(tag)
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val s = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      val (med, mx) = maxTask()
      println(f"$tag%-34s wall $s%7.2f s   task med ${med}%5d ms  max ${mx}%6d ms")
      spark.catalog.clearCache()
      graft.core.CacheRegistry.releaseAll()
      spark.sparkContext.getPersistentRDDs.values
        .filter(_.id != d.rdd.id).foreach(_.unpersist(blocking = false))
    }

    // A. shipped substring-dedup window form
    for (p <- 1 to 2)
      time(s"A substring window form p$p")(graft.QueriesTraining.substringDedupOn(d, 12))

    // B. salted two-phase mark + join-back (the candidate replacement)
    def saltedForm(): DataFrame = {
      implicit val s2: SparkSession = spark
      val w = 12
      val base = d.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      val windows = graft.core.CacheRegistry.register(
        d.select(col("doc_id"),
            explode(graft.functions.TokenWindowHashes.column(col("text"), w)).as("wp"))
          .select(col("doc_id"), col("wp.pos").as("pos"), col("wp.h").as("h"))
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY))
      val dupH = windows
        .groupBy(col("h"), pmod(col("doc_id"), lit(64)).as("_salt"))
        .agg(min(col("doc_id")).as("_mn"), max(col("doc_id")).as("_mx"))
        .groupBy(col("h"))
        .agg(min(col("_mn")).as("_d0"), max(col("_mx")).as("_d1"))
        .filter(col("_d0") =!= col("_d1"))
        .select(col("h"))
      val hits = windows.join(dupH, Seq("h"))
        .select(col("doc_id"), col("pos"), col("h"))
      val perDoc = hits.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_dup_windows"),
          array_sort(collect_list(col("pos"))).as("ps"))
        .select(col("doc_id"), col("n_dup_windows"),
          aggregate(col("ps"),
            struct(lit(0L).as("covered"), lit(0L).as("last_end")),
            (acc, p) => {
              val start = greatest(p, acc.getField("last_end") + 1)
              val end = p + lit((w - 1).toLong)
              struct(
                (acc.getField("covered") + greatest(end - start + 1, lit(0L)))
                  .as("covered"),
                greatest(acc.getField("last_end"), end).as("last_end"))
            },
            acc => acc.getField("covered")).as("n_covered_tokens"))
      base.withColumn("n_windows", greatest(col("n_tok") - (w - 1), lit(0L)))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tok"), col("n_windows"),
          coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
          coalesce(col("n_covered_tokens"), lit(0L)).as("n_covered_tokens"))
    }
    for (p <- 1 to 2) time(s"B salted two-phase + join p$p")(saltedForm())

    // equivalence spot-check on the synthetic corpus (sorted hashes)
    val ha = graft.QueriesTraining.substringDedupOn(d, 12)
      .orderBy("doc_id").collect().map(_.toString).mkString("\n").hashCode
    val hb = saltedForm().orderBy("doc_id").collect().map(_.toString).mkString("\n").hashCode
    println(s"equivalence A==B on synthetic corpus: ${ha == hb}")
    graft.core.CacheRegistry.releaseAll()

    // C. curation keep-first window (WindowGroupLimit) over the same corpus
    def keepFirst(): DataFrame = {
      val keepW = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      d.withColumn("_rn", row_number().over(keepW))
        .filter(col("_rn") === 1).drop("_rn")
        .groupBy(lit(1)).agg(count(lit(1)).as("n_kept"))
    }
    for (p <- 1 to 2) time(s"C curation keep-first window p$p")(keepFirst())

    spark.stop()
  }
}
