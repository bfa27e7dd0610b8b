package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level autopsy for q_curation_e2e at scale (r16 verdict task 3):
  * times each composition stage and counts its surviving rows, so the
  * stage-order claim (narrow gate first, gram explosion only after
  * dedup, eval-gram broadcast bounded) is measured rather than asserted.
  * Mirrors QueriesTraining.curationE2e stage for stage.
  */
object CurationStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val s = SparkSession.builder()
      .master("local[32]").appName("graft-curation-stages")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def t(tag: String)(df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"STAGE $tag: rows=$n%d sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    val d = graft.core.Tables.documents(s, dir)
    t("0_docs")(d)
    val gated = d.join(
      graft.QueriesTraining.gopherRulesOn(d).filter(col("pass")).select(col("doc_id")),
      Seq("doc_id"), "left_semi").persist()
    t("1_gopher_gate")(gated)
    val deduped = gated.join(
      gated.groupBy(md5(col("text")).as("_h"))
        .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id")),
      Seq("doc_id"), "left_semi").persist()
    t("2_exact_dedup")(deduped)
    def grams(df: DataFrame) = df
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        explode(array_distinct(graft.QueriesTraining.wordNgrams(col("ws"), 4))).as("gram"))
    val evalGrams = grams(d.filter(col("doc_id") % 29 === 0))
      .select(col("gram")).distinct().persist()
    t("3_eval_grams_broadcast_side")(evalGrams)
    val trainGrams = grams(deduped.filter(col("doc_id") % 29 =!= 0))
    t("4_train_grams_stream_side")(trainGrams)
    val contaminated = trainGrams
      .join(broadcast(evalGrams), "gram")
      .select(col("doc_id")).distinct().persist()
    t("5_contaminated")(contaminated)
    val clean = deduped.filter(col("doc_id") % 29 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti").persist()
    t("6_clean")(clean)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_chars").desc, col("doc_id"))
    t("7_token_budget")(clean
      .select(col("doc_id"), col("source"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .filter(col("cum_tok") <= 800))
    s.stop()
  }
}
