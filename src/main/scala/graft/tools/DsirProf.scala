package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: per-stage wall times for the DSIR / tokenizer-encode rows
  * at a given SF dir (arg 0, default /tmp/graft_sf10). Times the gram
  * checkpoint, the bucket distribution, the weight pass, and the top-N
  * cut separately so a super-linear decade shows WHICH stage bends.
  */
object DsirProf {
  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", "32g")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    val docs = graft.core.Tables.documents(s, dir)
    println(s"[prof] docs=${t("count docs")(docs.count())}")

    // --- dsirSelect stages
    val b = 4096L
    implicit val sp: SparkSession = s
    val gramsPlan = docs
      .select(col("doc_id"), (col("lang") === "en").as("tgt"),
        explode(graft.functions.NgramBuckets.column(col("text"), 2, b)).as("b"))
    val grams = t("gram persist") {
      val g = gramsPlan.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      g.count(); g
    }
    println(s"[prof] grams=${t("count grams")(grams.count())}")
    val buckets = t("bucket distribution")(
      grams.groupBy(col("b"))
        .agg(count(lit(1)).as("raw_n"),
          sum(when(col("tgt"), 1L).otherwise(0L)).as("tgt_n"))
        .localCheckpoint())
    val totals = buckets.agg(sum(col("raw_n")).as("rt"), sum(col("tgt_n")).as("tt"))
    val ratio = buckets.crossJoin(broadcast(totals))
      .select(col("b"),
        round((log((col("tgt_n") + 1).cast("double") / (col("tt") + b).cast("double")) -
               log((col("raw_n") + 1).cast("double") / (col("rt") + b).cast("double"))) * 1e6)
          .cast("long").as("ratio"))
    val w = grams.join(broadcast(ratio), "b")
      .groupBy(col("doc_id")).agg(sum(col("ratio")).as("w_micro"))
    t("weight pass + top-N")(
      w.orderBy(col("w_micro").desc, col("doc_id")).limit(62500).count())

    s.stop()
  }
}
