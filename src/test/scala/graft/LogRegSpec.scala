package graft

import org.apache.spark.sql.functions._

import graft.analytics.LogReg

/** The LR quality filter's training contracts: exact-integer-sum
  * determinism (identical trained weights under any partitioning — the
  * property that makes the literal-weight oracle sound), loss descent,
  * and a real separation floor on the degraded-corpus task.
  */
class LogRegSpec extends SparkSuite {

  private def feats = {
    val degraded = expr(
      "instr('0123456789abcdef', substring(md5(concat('lrq:', cast(doc_id as string))), 1, 1)) <= 8")
    val junk = expr("repeat(' zz9 xq', cast(doc_id % 5 + 1 as int) * 10)")
    val aug = graft.core.Tables.documents(spark, sf0001).select(col("doc_id"),
      when(degraded, concat(col("text"), junk)).otherwise(col("text")).as("text"),
      (!degraded).cast("int").as("is_clean"))
    LogReg.features(aug, "doc_id", col("text"), col("is_clean"))
  }

  test("training is bit-deterministic under repartitioning") {
    val f = feats
    val m1 = LogReg.train(f.repartition(1), iters = 8)
    val m2 = LogReg.train(f.repartition(13, col("doc_id")), iters = 8)
    assert(m1.bMicros == m2.bMicros)
    assert(m1.wMicros.toSeq == m2.wMicros.toSeq)
    assert(m1.lossTraceMicros.toSeq == m2.lossTraceMicros.toSeq)
  }

  test("loss descends and the filter separates clean from degraded") {
    val f = feats.persist()
    try {
      val m = LogReg.train(f)
      assert(m.lossTraceMicros.last < m.lossTraceMicros.head,
        s"loss must descend: ${m.lossTraceMicros.head} -> ${m.lossTraceMicros.last}")
      // no catastrophic oscillation either: the worst iteration stays
      // within 2x of the from-zero starting loss
      assert(m.lossTraceMicros.max < 2 * m.lossTraceMicros.head)
      val sc = LogReg.score(f, "doc_id", m)
      val r = sc.agg(
        sum(when(col("label") === col("pred"), 1L).otherwise(0L)),
        count(lit(1))).head()
      val (correct, n) = (r.getLong(0), r.getLong(1))
      assert(correct * 10 >= n * 8, s"accuracy floor 80%: $correct/$n")
    } finally { f.unpersist(); () }
  }

  test("early stop fires on the loss-delta criterion before the iteration ceiling") {
    val f = feats.persist()
    try {
      val m = LogReg.train(f) // default ceiling 30, tol 10000 µnat/row
      val t = m.lossTraceMicros
      assert(t.length < 30, s"expected early stop, ran ${t.length} iterations")
      assert(t.length >= 2)
      // the recorded trace proves the stop: the LAST delta is the first
      // one below threshold, every earlier delta was at or above it
      val tol = 10000L * m.nTrain
      assert(t(t.length - 2) - t.last < tol,
        s"stop criterion did not fire: ${t(t.length - 2) - t.last} >= $tol")
      (1 until t.length - 1).foreach { i =>
        assert(t(i - 1) - t(i) >= tol,
          s"stop was not the FIRST crossing (iteration $i)")
      }
    } finally { f.unpersist(); () }
  }

  test("constant features are neutralized by the std floor, not NaN") {
    val m = LogReg.train(feats, iters = 3)
    // fr/de/es markers never fire on this corpus: their std floors to 1.0
    // and their folded weights must be finite (zero-ish), never NaN
    assert(m.w.forall(x => !x.isNaN && !x.isInfinite))
    assert(m.std.forall(_ > 0))
  }

  test("scoring margin is the exact integer dot of the folded weights") {
    val f = feats
    val m = LogReg.train(f, iters = 5)
    val row = LogReg.score(f, "doc_id", m).orderBy(col("doc_id")).head()
    val frow = f.orderBy(col("doc_id")).head()
    val expected = m.bMicros + (0 until LogReg.D)
      .map(j => m.wMicros(j) * frow.getLong(1 + j)).sum
    assert(row.getAs[Long]("margin_micros") == expected)
  }
}
