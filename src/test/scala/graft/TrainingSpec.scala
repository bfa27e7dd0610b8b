package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Unit checks for the training-curation batch ([[QueriesTraining]]) on
  * hand-constructed corpora where every expected value is computable by
  * inspection — the catalog oracle proves engine parity at sf0.01, these
  * prove the FORMULAS (BM25 weights, Gopher repetition counts, gram
  * overlap, hash-mix determinism, prune set algebra).
  */
class TrainingSpec extends SparkSuite {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Write rows as documents.parquet into a fresh temp dir, return the dir. */
  private def docDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-training").toString
    val data = rows.map { case (id, text) =>
      Row(id, text, "en", s"src${id % 4}", text.length.toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("repetition: counts on a constructed doc match hand computation") {
    val dir = docDir(Seq(
      1L -> "a a a b c",        // top token 'a' x3 of 5 -> repetitious
      2L -> "u v w x y z",      // all distinct -> not repetitious
      3L -> "p q"))             // below trigram length -> zero trigrams
    val out = QueriesTraining.repetition(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap

    val r1 = out(1L)
    assert(r1.getLong(1) == 5L, "n_tok")
    assert(r1.getLong(2) == 3L, "n_distinct_tok")
    assert(r1.getLong(3) == 3L, "top_tok_n")
    assert(r1.getLong(4) == 3L, "n_tri: 'a a a','a a b','a b c'")
    assert(r1.getLong(5) == 3L, "n_distinct_tri")
    assert(r1.getBoolean(6), "3*5 > 5 -> repetitious")

    val r2 = out(2L)
    assert(r2.getLong(3) == 1L && !r2.getBoolean(6))

    val r3 = out(3L)
    assert(r3.getLong(4) == 0L && r3.getLong(5) == 0L, "short doc has no trigrams")
  }

  test("decontaminate: flags exactly the docs sharing a 4-gram with the eval set") {
    val dir = docDir(Seq(
      0L -> "w1 w2 w3 w4 w5",        // doc_id % 29 == 0 -> eval doc
      1L -> "x w1 w2 w3 w4 y",       // shares 'w1 w2 w3 w4' -> 1 hit
      2L -> "w2 w3 w4 w5 w2 w3 w4 w5", // shares 'w2 w3 w4 w5' (distinct once)
      3L -> "a b c d e f"))          // clean
    val out = QueriesTraining.decontaminate(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L),
      s"expected docs 1,2 with one distinct overlapping gram each, got $out")
  }

  test("decontaminate: forced SHUFFLE_HASH verify path is plan-only — identical output") {
    // the broadcast→shuffle switch (evalVerifySide) must pick a physical
    // plan, never change semantics; force the above-cap branch that no
    // fixture-scale gate reaches and prove both claims
    val dir = docDir(Seq(
      0L -> "w1 w2 w3 w4 w5",
      1L -> "x w1 w2 w3 w4 y",
      2L -> "w2 w3 w4 w5 w2 w3 w4 w5",
      3L -> "a b c d e f"))
    val expected = QueriesTraining.decontaminate(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sys.props("graft.decontaminate.broadcastMaxGrams") = "1"
    try {
      val forced = QueriesTraining.decontaminate(spark, dir)
      val plan = forced.queryExecution.executedPlan.toString
      assert(plan.contains("ShuffledHashJoin") && !plan.contains("BroadcastHashJoin"),
        "above the cap the verify must plan as a shuffled hash join:\n" + plan.take(3000))
      val out = forced.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == expected, s"switch changed results: $out vs $expected")
    } finally sys.props.remove("graft.decontaminate.broadcastMaxGrams")
  }

  test("estEvalGrams: bounds the eval gram mass from above and memoizes per (dataset, predicate)") {
    import org.apache.spark.sql.functions._
    val dir = docDir(Seq(
      0L -> "w1 w2 w3 w4 w5 w6",     // eval doc (id % 29 == 0): 3 distinct 4-grams, 6 tokens
      1L -> "x w1 w2 w3 w4 y",
      29L -> "a b c d e",            // eval doc: 2 distinct 4-grams, 5 tokens
      3L -> "p q r s t"))
    val d = graft.core.Tables.documents(spark, dir)
    val pred = col("doc_id") % 29 === 0
    val est = QueriesTraining.estEvalGrams(d, pred, dir, "spec-mod29")
    // the estimate must DOMINATE the true distinct-gram mass (an
    // under-estimate risks an over-ceiling broadcast); true mass = 5
    val actual = d.filter(pred)
      .select(explode(array_distinct(
        QueriesTraining.wordNgrams(split(col("text"), " "), 4))))
      .distinct().count()
    assert(est >= actual, s"estimate $est under the true gram mass $actual")
    // ...but stays a per-doc TOKEN bound, not a wild constant: 2 docs x
    // avg 5.5 tokens x 1.25 margin ≈ 14
    assert(est <= 20, s"estimate $est not token-derived")
    // memoization: the same (dataset, predicate) key must not re-run the
    // estimation jobs — hand the cached path a frame that THROWS if it is
    // ever evaluated
    val poison = spark.range(1)
      .select(col("id").as("doc_id"),
        expr("raise_error('estEvalGrams cache miss: estimation re-ran')").as("text"))
    val cached = QueriesTraining.estEvalGrams(poison, pred, dir, "spec-mod29")
    assert(cached == est, "cache returned a different estimate")
  }

  test("bm25: score matches the formula computed by hand") {
    // 3 docs, query terms {spark, join, window}; doc 10 has spark x2 + join.
    val dir = docDir(Seq(
      10L -> "spark spark join",
      11L -> "spark other words here",
      12L -> "nothing relevant at all"))
    val rows = QueriesTraining.bm25(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(10L, 11L, 12L),
      "rank order: both-terms doc, one-term doc, no-term doc")

    // hand computation for doc 10 with the same constants
    val (k1, b) = (1.2, 0.75)
    val (nDocs, totTok) = (3.0, 3.0 + 4.0 + 4.0)
    def idf(df: Double) = math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
    def term(tf: Double, df: Double, dl: Double) = {
      val norm = k1 * ((1 - b) + b * dl * nDocs / totTok)
      idf(df) * (tf * (k1 + 1)) / (tf + norm)
    }
    val expected = math.round(
      (term(2, 2, 3) + term(1, 1, 3) + 0.0) * 1000)
    val got = rows.find(_.getLong(0) == 10L).get.getAs[Long]("score_milli")
    assert(got == expected, s"doc 10 score_milli: got $got expected $expected")
  }

  test("domain mix: deterministic across reruns and bounded by the rate") {
    val a = QueriesTraining.domainMix(spark, sf0001)
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = QueriesTraining.domainMix(spark, sf0001)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b, "content-hash mixing must be rerun-stable")
    assert(a.nonEmpty && a.size < graft.core.Tables.documents(spark, sf0001).count(),
      "a real mix keeps some and drops some")
  }

  test("repetition: native TokenStats equals the composed HOF form, edges included") {
    val edge = docDir(Seq(
      11L -> "a  b c ",          // empty interior + trailing empty token
      12L -> "日本 語 日本 語 x",  // multi-byte, repeated tokens
      13L -> ""))                 // empty text -> one empty token
    Seq(sf0001, edge).foreach { dir =>
      val n = QueriesTraining.repetition(spark, dir)
      val c = QueriesTraining.repetitionComposed(spark, dir)
      assert(n.exceptAll(c).isEmpty && c.exceptAll(n).isEmpty, s"parity at $dir")
    }
  }

  test("substring dedup: window counts and interval-union coverage by hand") {
    // w=3 windows. doc1 "a b c d e f": windows abc,bcd,cde,def; doc2
    // shares abc (pos 3) and bcd (pos 4); doc3's only window is unique;
    // doc4 is below the window size.
    val dir = docDir(Seq(
      1L -> "a b c d e f",
      2L -> "x x a b c d y",
      3L -> "z z z",
      4L -> "q w"))
    val out = QueriesTraining.substringDedupOn(
        graft.core.Tables.documents(spark, dir), w = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(2) == 4L, "doc1 windows")
    assert(r1.getLong(3) == 2L, "doc1 dup windows: abc,bcd")
    // [1..3] U [2..4] -> tokens 1-4
    assert(r1.getLong(4) == 4L, "doc1 covered tokens")
    val r2 = out(2L)
    assert(r2.getLong(2) == 5L && r2.getLong(3) == 2L, "doc2 windows")
    // [3..5] U [4..6] -> tokens 3-6
    assert(r2.getLong(4) == 4L, "doc2 covered tokens")
    assert(out(3L).getLong(3) == 0L && out(3L).getLong(4) == 0L, "unique doc")
    assert(out(4L).getLong(2) == 0L && out(4L).getLong(4) == 0L, "short doc")
  }

  test("substring dedup: identical docs are fully covered; overlaps never double-count") {
    val dir = docDir(Seq(
      7L -> "m n o p q r s",
      8L -> "m n o p q r s",   // identical twin: every window duplicated
      9L -> "h i j k l"))      // unrelated
    val out = QueriesTraining.substringDedupOn(
        graft.core.Tables.documents(spark, dir), w = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    Seq(7L, 8L).foreach { id =>
      val r = out(id)
      assert(r.getLong(3) == r.getLong(2), s"doc $id: all windows dup")
      // 5 overlapping windows, union = the whole 7-token doc, not 15
      assert(r.getLong(4) == r.getLong(1), s"doc $id fully covered")
    }
    assert(out(9L).getLong(4) == 0L)
  }

  test("cluster keeper: keeps the longest member, ties to the lowest id") {
    val keepers = QueriesAnalytics.clusterKeeper(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(keepers.nonEmpty, "fixture corpus has dup clusters")
    val comp = graft.analytics.Dedup.connectedComponents(
      graft.analytics.Dedup.lshCandidatePairs(
        graft.analytics.Dedup.lshBandKeys(
          graft.core.Tables.documents(spark, sf0001), "doc_id",
          org.apache.spark.sql.functions.col("text"), k = 8, numHashes = 8,
          rowsPerBand = 4), "doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val chars = graft.core.Tables.documents(spark, sf0001)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    comp.groupBy(_._2).foreach { case (component, members) =>
      val ids = members.map(_._1)
      val best = ids.map(id => (chars(id), -id)).max
      val r = keepers(component)
      assert(r.getLong(1) == ids.length.toLong, s"cluster $component size")
      assert(r.getLong(2) == -best._2, s"cluster $component keeper id")
      assert(r.getLong(3) == best._1, s"cluster $component keeper chars")
    }
  }

  test("semdedup prune: drops exactly the non-root cluster members") {
    val pruned = QueriesTraining.semdedupPrune(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    val all = graft.core.Tables.embeddings(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    val pairs = QueriesExtra.embedNeardup(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("vec_a").as("doc_a"),
        org.apache.spark.sql.functions.col("vec_b").as("doc_b"))
    val comp = graft.analytics.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nonRoots = comp.filter { case (id, root) => id != root }.keySet
    assert(pruned == all -- nonRoots,
      "survivors = corpus minus non-root members; roots and unclustered pass through")
    assert(comp.values.toSet.subsetOf(pruned), "every cluster root survives")
  }

  test("mix weights: exact isqrt, ppm shares sum <= 1e6, rates capped") {
    val rows = QueriesTraining.mixWeights(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tokens = r.getAs[Long]("tokens")
      val w = r.getAs[Long]("weight")
      assert(w * w <= tokens && tokens < (w + 1) * (w + 1),
        s"isqrt exact: $w^2 <= $tokens < ${w + 1}^2")
      val rate = r.getAs[Long]("sample_rate_ppm")
      assert(rate >= 0 && rate <= 1000000L, s"rate in [0, 1e6]: $rate")
      val exp = r.getAs[Long]("expected_tokens")
      assert(exp <= 20000L, "no source expects more than the whole budget")
    }
    // integer-floor shares can undershoot, never overshoot the whole
    val ppmSum = rows.map(_.getAs[Long]("mix_ppm")).sum
    assert(ppmSum <= 1000000L && ppmSum > 900000L, s"ppm sum sane: $ppmSum")
    // temperature flattening: the largest source's mix share must be
    // SMALLER than its raw token share (and small sources' larger)
    val totTok = rows.map(_.getAs[Long]("tokens")).sum
    val big = rows.maxBy(_.getAs[Long]("tokens"))
    val rawPpm = big.getAs[Long]("tokens") * 1000000L / totTok
    assert(big.getAs[Long]("mix_ppm") <= rawPpm,
      "sqrt temperature must flatten the head source")
  }

  test("contrastive pairs: one row per anchor, positive dominates, no self-pairs") {
    val df = QueriesTraining.contrastivePairs(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "anchors must broadcast; the corpus side must not cartesian-shuffle")
    val rows = df.collect()
    val nAnchors = graft.core.Tables.embeddings(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("vec_id") % 50 === 0).count()
    assert(rows.length == nAnchors && nAnchors > 0)
    rows.foreach { r =>
      val a = r.getAs[Long]("anchor_id")
      assert(r.getAs[Long]("pos_id") != a && r.getAs[Long]("neg_id") != a, "self excluded")
      assert(r.getAs[Long]("pos_dot") >= r.getAs[Long]("neg_dot"),
        "the argmax positive can never score below any other candidate")
    }
  }
}
