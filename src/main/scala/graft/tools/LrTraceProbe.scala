package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: print the LR quality filter's integer loss trace at a
  * given SF dir — the data the early-stop threshold is derived from.
  */
object LrTraceProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]").appName("graft-lrtrace")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val degraded = expr(
      "instr('0123456789abcdef', substring(md5(concat('lrq:', cast(doc_id as string))), 1, 1)) <= 8")
    val junk = expr("repeat(' zz9 xq', cast(doc_id % 5 + 1 as int) * 10)")
    val aug = graft.core.Tables.documents(s, dir).select(col("doc_id"),
      when(degraded, concat(col("text"), junk)).otherwise(col("text")).as("text"),
      (!degraded).cast("int").as("is_clean"))
    val feats = graft.analytics.LogReg.features(aug, "doc_id", col("text"), col("is_clean"))
      .persist()
    val n = feats.count()
    val m = graft.analytics.LogReg.train(
      graft.analytics.LogReg.trainingSample(feats, "doc_id", n, cap = 1000000L))
    println(s"n=$n iters=${m.lossTraceMicros.length}")
    val t = m.lossTraceMicros
    t.zipWithIndex.foreach { case (l, i) =>
      val d = if (i == 0) 0L else t(i - 1) - l
      println(f"it=$i%2d loss=$l%12d delta=$d%12d perRow=${d.toDouble / m.nTrain}%10.1f")
    }
    for (k <- Seq(5, 8, 10, 12, 15, 20, 30)) {
      val mk = graft.analytics.LogReg.train(
        graft.analytics.LogReg.trainingSample(feats, "doc_id", n, cap = 1000000L),
        iters = k)
      val sc = graft.analytics.LogReg.score(feats, "doc_id", mk)
      val r = sc.agg(sum(when(col("label") === col("pred"), 1L).otherwise(0L)),
        count(lit(1))).head()
      println(f"iters=$k%2d acc=${r.getLong(0)}/${r.getLong(1)} = ${100.0*r.getLong(0)/r.getLong(1)}%6.2f%%")
    }
    s.stop()
  }
}
