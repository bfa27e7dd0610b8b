package graft

import org.apache.spark.sql.functions._

/** Invariants for the graph/evaluation operators beyond the DuckDB hash
  * match: PageRank mass conservation and determinism, kNN vote
  * integrity, exact stratified-split proportions, and the plan shapes
  * the scale claims rest on.
  */
class GraphSpec extends SparkSuite {

  test("pagerank: positive ranks, one row per node, mass ~conserved") {
    val df = SparkEntry.queries("q_pagerank")(spark, sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) > 0), "every rank positive")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length, "one row per node")
    // truncating fixed-point leaks a bounded number of units per round:
    // total mass stays within 1% of 10^12 and never exceeds it materially
    val mass = rows.map(_.getLong(1)).sum
    assert(mass > 990_000_000_000L && mass < 1_001_000_000_000L, s"mass=$mass")
  }

  test("pagerank: bit-identical across two runs (integer fixed point)") {
    def m() = SparkEntry.queries("q_pagerank")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m() == m())
  }

  test("pagerank with a checkpoint dir: correct result, zero surviving checkpoint files") {
    val ckptPath = java.nio.file.Files.createTempDirectory("graft-pr-ckpt")
    spark.sparkContext.setCheckpointDir(ckptPath.toString)
    try {
      // the no-dir localCheckpoint run is the reference result
      spark.sparkContext.setCheckpointDir(null)
      val want = SparkEntry.queries("q_pagerank")(spark, sf0001)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      spark.sparkContext.setCheckpointDir(ckptPath.toString)
      val df = SparkEntry.queries("q_pagerank")(spark, sf0001)
      val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want)
      // Checkpoints.scoped contract: the ~12 per-invocation rdd trees
      // (edges, nodes, 10 rounds) are deleted before pagerank returns —
      // no scope dir and no FILE of any kind survives under the
      // configured dir (empty setCheckpointDir-internal UUID dirs may)
      val walk = java.nio.file.Files.walk(ckptPath)
      val residue =
        try walk.filter(p => java.nio.file.Files.isRegularFile(p)).findFirst()
        finally walk.close()
      assert(!residue.isPresent,
        s"checkpoint files survived the scoped pagerank call: $residue")
      // and the result stays servable from the pinned cache
      assert(df.count() == want.size)
    } finally {
      spark.sparkContext.setCheckpointDir(null)
      org.apache.commons.io.FileUtils.deleteQuietly(ckptPath.toFile)
    }
  }

  test("pagerank: high-degree nodes outrank the median node") {
    val ranks = SparkEntry.queries("q_pagerank")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = graft.core.Tables.lineitem(spark, sf0001)
      .join(graft.core.Tables.orders(spark, sf0001),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("p"))
      .distinct()
    val deg = pairs.select(col("c").as("n")).unionAll(pairs.select(col("p").as("n")))
      .groupBy("n").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val top = deg.maxBy(_._2)._1
    val med = ranks.values.toSeq.sorted.apply(ranks.size / 2)
    assert(ranks(top) > med, s"hub rank ${ranks(top)} should exceed median $med")
  }

  test("knn classify: one prediction per held-out vector, labels in domain") {
    val labels = graft.core.Tables.embeddings(spark, sf0001)
      .select(col("label")).distinct().collect().map(_.getInt(0)).toSet
    val nTest = graft.core.Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") % 5 === 0).count()
    val out = SparkEntry.queries("q_knn_classify")(spark, sf0001).collect()
    assert(out.length == nTest, s"${out.length} predictions for $nTest held-out vectors")
    assert(out.forall(r => labels.contains(r.getInt(2))), "pred drawn from label domain")
  }

  test("knn classify: broadcast eval set + rank-limit pushdown (no all-pairs shuffle)") {
    val df = SparkEntry.queries("q_knn_classify")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      "eval set must broadcast:\n" + p.take(3000))
    assert(p.contains("WindowGroupLimit"),
      "top-5 must push into map-side partial top-k:\n" + p.take(3000))
  }

  test("stratified split: exact per-stratum proportions by rank modulus") {
    val out = SparkEntry.queries("q_stratified_split")(spark, sf0001)
      .collect().map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3))).toMap
    val totals = graft.core.Tables.documents(spark, sf0001)
      .groupBy(col("source"), col("lang")).count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    totals.foreach { case ((src, lang), n) =>
      def cnt(split: String) = out.getOrElse((src, lang, split), 0L)
      // rn%10==1 → test, ==2 → val: ceil((n-k+10)/10)-style exact counts
      def expect(k: Long) = if (n >= k) (n - k) / 10 + 1 else 0L
      assert(cnt("test") == expect(1), s"($src,$lang) test ${cnt("test")} != ${expect(1)}")
      assert(cnt("val") == expect(2), s"($src,$lang) val ${cnt("val")} != ${expect(2)}")
      assert(cnt("train") + cnt("test") + cnt("val") == n, s"($src,$lang) split total")
    }
  }
}

/** Plan guards + invariants for the round-6 second batch. */
class IndexOpsSpec extends SparkSuite {

  test("inverted index: shard digests merge to global df; singleton segments have gap 0") {
    val rows = SparkEntry.queries("q_inverted_index")(spark, sf0001).collect()
    // df==1 segments must report max_gap 0
    assert(rows.filter(_.getLong(2) == 1L).forall(_.getLong(6) == 0L))
    // sum of segment df over shards == global document frequency per term
    val byTerm = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    val global = graft.core.Tables.documents(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("text"), " ")).as("term"))
      .distinct().groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTerm == global, "segment dfs must partition the global df")
  }

  test("skipgram pairs: one count shuffle, narrow pair construction (no self-join)") {
    val df = SparkEntry.queries("q_skipgram_pairs")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val cut = p.indexOf("== Initial Plan ==") match { case -1 => p; case i => p.substring(0, i) }
    val exchanges = cut.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected one exchange, got $exchanges:\n" + cut.take(3000))
    assert(!cut.contains("Join"), "pair construction must not self-join:\n" + cut.take(3000))
  }

  test("skipgram pairs: total pair mass equals sum over docs of (2n-3) for n>=2") {
    val total = SparkEntry.queries("q_skipgram_pairs")(spark, sf0001)
      .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    val want = graft.core.Tables.documents(spark, sf0001)
      .select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).as("n"))
      .collect().map(_.getInt(0)).filter(_ >= 2).map(n => (n - 1).toLong + math.max(n - 2, 0).toLong).sum
    assert(total == want)
  }
}
