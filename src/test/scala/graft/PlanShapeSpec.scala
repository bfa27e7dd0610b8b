package graft

/** Plan-shape regression guards for the scale claims the engine makes:
  * filters reach the parquet scan, projections prune the read schema,
  * and small join sides broadcast. A refactor that silently loses one of
  * these would still pass the value-level oracle checks — these specs
  * pin the PLAN.
  */
class PlanShapeSpec extends SparkSuite {

  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf0001)
    df.queryExecution.executedPlan.toString
  }

  test("snapshot scan pushes filters and prunes columns") {
    val p = plan("q_snapshot_scan")
    assert(p.contains("PushedFilters: ["), p.take(2000))
    assert(p.contains("GreaterThan(l_quantity") || p.contains("IsNotNull(l_quantity"),
      p.take(2000))
    // projection pruning: the read schema names only referenced columns
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && !readSchema.contains("l_comment"),
      readSchema)
  }

  test("row-filter config compiles into pushed scan predicates") {
    val p = plan("q_snapshot_rowfilter")
    assert(p.contains("PushedFilters: ["), p.take(2000))
    // the plan string may truncate long filter lists mid-token
    assert(p.contains("EqualTo(l_returnflag,A)") || p.contains("GreaterThan(l_quanti"),
      p.take(2000))
  }

  test("dimension joins broadcast the small side") {
    val p = plan("q3_join_topk")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p.take(3000))
  }

  test("registration routing is a broadcast semi join") {
    val p = plan("q_route_registered")
    assert(p.contains("LeftSemi"), p.take(3000))
    assert(p.contains("Broadcast"), p.take(3000))
  }

  test("DSIR selection broadcasts the bucket-ratio table and cuts top-N without a global sort") {
    val p = plan("q_dsir_select")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    // the top-1/8 cut must NOT plan as a global Sort + Limit: the only
    // Sort allowed is none at all (TakeOrderedAndProject replaces it)
    assert(!p.linesIterator.exists(l => l.trim.startsWith("+- Sort") ||
      l.trim.startsWith("Sort ")), p.take(3000))
  }

  test("decontamination joins the corpus against a BROADCAST eval-gram set") {
    // at 100 TB the corpus side must stream; a shuffled join here would
    // move every corpus gram across the wire
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("bm25 corpus stats come back as a broadcast single row, and the scan shuffles nothing but the top-k") {
    val p = plan("q_bm25")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("repetition signals are computed with ZERO shuffles") {
    val p = plan("q_repetition")
    assert(!p.contains("Exchange"),
      "per-doc repetition math must stay narrow (scan -> project):\n" + p.take(3000))
  }

  test("6-way join broadcasts the dims; ASIA filter reaches the region scan") {
    val p = plan("q_multi_join")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    // the filter must be IN the scan's pushed-filter list, not merely
    // mentioned somewhere in the plan string
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("r_name"), "ASIA filter not pushed to the region scan:\n" + pushed)
    // note: whether orders x lineitem broadcasts is SIZE-driven — at
    // sf0.001 everything fits under the broadcast threshold, so the
    // facts-never-broadcast property only manifests at scale and is not
    // assertable here; what IS structural is that the join exists on the
    // order key at all
    assert(p.contains("l_orderkey"), p.take(3000))
  }

  test("EXISTS plans as a semi join — no row duplication then dedup") {
    val p = plan("q_exists_semi")
    assert(p.contains("LeftSemi"), p.take(3000))
  }

  test("boilerplate chunk removal anti-joins against a BROADCAST boiler set") {
    val p = plan("q_line_dedup")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p.take(3000))
  }

  test("gopher rules compute with ZERO shuffles") {
    val p = plan("q_gopher_rules")
    assert(!p.contains("Exchange"),
      "per-doc quality rules must stay narrow (scan -> project):\n" + p.take(3000))
  }

  test("cube computes all grouping sets in ONE aggregate pass (single Expand)") {
    val p = plan("q_cube")
    assert(p.contains("Expand"), p.take(3000))
    assert(p.contains("HashAggregate"), p.take(3000))
    // one shuffle for the aggregate, not one per grouping set
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, s"expected a single aggregate exchange (+AQE read), got $exchanges:\n" + p.take(3000))
  }

  test("unpivot stays narrow (Expand, no shuffle)") {
    val p = plan("q_unpivot")
    assert(p.contains("Expand"), p.take(3000))
    assert(!p.contains("Exchange"), p.take(3000))
  }

  // executed AQE plan, Final Plan section only (the string repeats every
  // node under "== Initial Plan ==", which double-counts exchanges)
  private def finalPlan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf0001)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    s.indexOf("== Initial Plan ==") match {
      case -1 => s
      case i => s.substring(0, i)
    }
  }

  test("substring dedup shuffles window HASHES only — never window text") {
    val p = finalPlan("q_substring_dedup")
    // every exchange keys on the md5 column or doc_id, never a gram/text col
    val badKeys = p.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .filterNot(l => l.contains("h#") || l.contains("doc_id#")).toSeq
    assert(badKeys.isEmpty, "unexpected shuffle keys:\n" + badKeys.mkString("\n"))
    // window rows cross the wire once into the dup-frequency aggregate
    // ((h, doc_id) partial then h); the hit side must reuse or broadcast,
    // never re-shuffle the window stream a second time
    val winExchanges = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning(h#"))
    assert(winExchanges == 1 || (winExchanges <= 2 && p.contains("ReusedExchange")),
      "window rows shuffled more than once per side:\n" + p.take(3000))
  }

  test("snapshot diff: full outer join reuses the rollup partitioning (two exchanges only)") {
    val df = SparkEntry.queries("q_snapshot_diff")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val cut = p.indexOf("== Initial Plan ==") match { case -1 => p; case i => p.substring(0, i) }
    val exchanges = cut.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 2, s"diff must cost only the two rollup shuffles, got $exchanges:\n" + cut.take(3000))
    assert(cut.linesIterator.exists(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")) && l.contains("FullOuter")),
      cut.take(3000))
  }

  test("token budget is ONE keyed shuffle (window by source)") {
    val p = finalPlan("q_token_budget")
    val exchanges = p.linesIterator.count(l =>
      l.trim.startsWith("+- Exchange") || l.trim.startsWith(":- Exchange"))
    assert(exchanges == 1, s"expected exactly one exchange, got $exchanges:\n" + p.take(3000))
  }

  test("cluster keeper aggregates the argmax map-side (no window sort over clusters)") {
    val df = SparkEntry.queries("q_cluster_keeper")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "keeper selection must not sort cluster partitions:\n" + p.take(3000))
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p.take(3000))
  }

  private def fileScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => fileScans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => fileScans(q.plan)
    case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(fileScans) ++
      other.subqueries.flatMap(fileScans)
  }

  test("IVF×PQ probe: index scans stay cell-partition-filtered; ADC scan reads codes, not vectors") {
    val df = SparkEntry.queries("q_ivfpq_topk")(spark, sf0001)
    df.collect()
    val idxScans = fileScans(df.queryExecution.executedPlan)
      .filter(_.relation.partitionSchema.fieldNames.contains("cell"))
    assert(idxScans.nonEmpty, "no scan of the cell-partitioned index found")
    // the composition must keep the probe's cell restriction as a
    // PARTITION filter (planning-time pruning), not a post-scan predicate
    idxScans.foreach { sc =>
      assert(sc.partitionFilters.exists(_.references.exists(_.name == "cell")),
        s"index scan lost its cell partition filter: $sc")
    }
    // ADC candidate generation reads the CODES, never the full vectors —
    // at 100 TB that is 4 bytes/vector vs 256: at least one index scan
    // must project codes without embedding
    assert(idxScans.exists(sc =>
      sc.requiredSchema.fieldNames.contains("codes")
        && !sc.requiredSchema.fieldNames.contains("embedding")),
      idxScans.map(_.requiredSchema.fieldNames.mkString(",")).mkString(" | "))
  }

  test("kNN over the materialized IVF index partition-prunes to the probed cells") {
    // one eval vector at nprobe=2: the index scan may read AT MOST its
    // two probed cell partitions (the catalog row runs nprobe=all for
    // oracle exactness; this pins the pruning the composition exists for)
    val df = QueriesGraph.knnIvfImpl(spark, sf0001, nprobe = 2,
      evalPred = org.apache.spark.sql.functions.col("vec_id") === 0)
    df.collect()
    val idxScans = fileScans(df.queryExecution.executedPlan)
      .filter(_.relation.partitionSchema.fieldNames.contains("cell"))
    assert(idxScans.nonEmpty, "no scan of the cell-partitioned index found")
    idxScans.foreach { sc =>
      val parts = sc.metrics("numPartitions").value
      assert(parts > 0 && parts <= 2,
        s"index scan read $parts cell partitions, expected <= 2")
    }
  }

  test("embed covariance: one imperative aggregate, no row amplification") {
    // the moment sums must come from the fixed-buffer VecOuterSum pass —
    // an Expand/Generate here would be the 2080x row blowup the
    // aggregate exists to avoid
    val p = plan("q_embed_covariance")
    assert(p.contains("ObjectHashAggregate"), p.take(3000))
    assert(!p.contains("Expand"), p.take(3000))
    assert(!p.contains("Generate"), p.take(3000))
  }

  test("chunk windows generate narrowly: zero exchanges, zero shuffles") {
    // chunking must stay embarrassingly parallel scan work — any shuffle
    // here would move the full corpus text at 100 TB
    val p = plan("q_chunk_windows")
    assert(!p.contains("Exchange"), p.take(3000))
  }

  test("approx stats: no Expand, NO percentile value buffer, anchors broadcast back") {
    // the r7 regression shape: countDistinct sharing a groupBy with the
    // sketches forced an Expand (every row replicated per aggregate
    // group). r12 removed the last percentile() call entirely — the
    // exact anchors come from the counting-sort histogram kernel shared
    // with q_percentiles, so exact-anchor state tracks the cents domain,
    // not the row count. Pin both properties.
    val p = plan("q_approx_stats")
    assert(!p.contains("Expand"), p.take(3000))
    assert(!"(?<!approx_)percentile\\(".r.findAllIn(p).hasNext,
      s"q_approx_stats must not use the percentile() buffer aggregate:\n${p.take(3000)}")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("exact percentiles run as a distributed counting sort — no Percentile value buffer") {
    // percentile() buffers every group value on one executor (OOM at
    // 100 TB); the counting-sort form keeps state bounded by the value
    // DOMAIN. A refactor back to percentile() would still pass the
    // value oracle — pin the plan.
    val p = plan("q_percentiles")
    assert(!"(?<!approx_)percentile\\(".r.findAllIn(p).hasNext,
      s"q_percentiles must not use the percentile() buffer aggregate:\n${p.take(3000)}")
    // the histogram aggregation must partial-aggregate before its shuffle
    assert(p.contains("HashAggregate"), p.take(3000))
  }

  test("CMS heavy hitters map-side-combine to sketch cells before the shuffle") {
    // the sketch's whole point: the ONLY shuffle for the counter build
    // carries at most d*w cells per map task, not the vocabulary
    val p = plan("q_heavy_hitters")
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("incr_mv: exactly two exchanges — the keyed window and the MV-group fold") {
    // the incremental-MV promise: per-batch cost is one changelog-keyed
    // window pass (a partitioning the source topic already has) plus a
    // partial-aggregated group fold; any third exchange means a refactor
    // broke the single-pass shape
    val p = plan("q_incr_mv")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n${p.take(3000)}")
    assert(p.contains("partial_sum"), p.take(3000))
    assert(p.contains("PushedFilters: [In(event_type"), p.take(3000))
  }

  test("weighted sample: replica max combines map-side; top-k is TakeOrdered, not a global sort") {
    val p = plan("q_weighted_sample")
    assert(p.contains("partial_max"), p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert(!p.contains("Sort [priority"), "no full global sort:\n" + p.take(3000))
  }

  test("retention: the week-set rides ONE groupBy(user) pass — no countDistinct Expand") {
    val p = plan("q_retention")
    assert(p.contains("collect_set") || p.contains("partial_collect_set"), p.take(3000))
    assert(!p.contains("Expand"), "no distinct-aggregate Expand:\n" + p.take(3000))
  }

  test("pagerank round: static edge table is never re-shuffled or re-sorted") {
    // The distributed loop's per-round cost: with edges pre-partitioned
    // and pre-sorted on src before the checkpoint, each round must
    // exchange ONLY the rank side of the join plus the node aggregation
    // — re-shuffling the (much larger) static edge table every round is
    // the regression this pins out. Broadcast is disabled so the shape
    // under test is the 100 TB one (rank side too big to broadcast).
    import org.apache.spark.sql.functions._
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def aqeOff[T](f: => T): T = { // mirror pagerankBody's trunc
      val k = "spark.sql.adaptive.enabled"
      val prev = spark.conf.get(k)
      spark.conf.set(k, "false")
      try f finally spark.conf.set(k, prev)
    }
    try {
      import spark.implicits._
      val pairs = Seq.tabulate(200)(i => (i.toLong % 20, i.toLong % 7 + 100))
        .toDF("c", "p")
      val edges = pairs.select(col("c").as("src"), col("p").as("dst"))
        .unionAll(pairs.select(col("p").as("src"), col("c").as("dst")))
      // the body's CSR adjacency: (src, chunk) rows with neighbor arrays
      val wSrc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("src")).orderBy(col("dst"))
      val adj = aqeOff {
        edges
          .withColumn("chunk", ((row_number().over(wSrc) - 1) / 65536).cast("int"))
          .groupBy(col("src"), col("chunk"))
          .agg(collect_list(col("dst")).as("dsts"))
          .repartition(col("src")).sortWithinPartitions(col("src"))
          .localCheckpoint()
      }
      // mimic a round's output state: node-keyed agg, checkpointed with
      // its hash(node) partitioning preserved
      val ranks = aqeOff {
        edges.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("deg"))
          .withColumn("base", lit(1000L)).withColumn("r", lit(10000L))
          .select(col("node"), col("deg"), col("base"), col("r"))
          .repartition(col("node"))
          .localCheckpoint()
      }
      val round = QueriesGraph.pagerankRound(ranks, adj)
      val p = round.queryExecution.executedPlan.toString
      // hash(node) = hash(sn) on the rank side and hash(src) on the edge
      // side are co-partitioned: the join runs exchange-free and the
      // round's ONLY shuffle is the node aggregation
      val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(exchanges == 1,
        s"expected exactly 1 exchange (node agg only), got $exchanges:\n${p.take(4000)}")
      // edges arrive sorted: the join must add exactly one Sort (rank side)
      val sorts = p.linesIterator.count(_.contains("Sort ["))
      assert(sorts == 1,
        s"expected exactly 1 sort (rank side only — edges pre-sorted), got $sorts:\n${p.take(4000)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
  }

  test("epoch shuffle: ONE window pass (position + running offset share the sort), one exchange") {
    val p = plan("q_epoch_shuffle")
    // row_number and the running token sum must ride the SAME window spec:
    // a second Window (or a second Sort) would double the per-shard pass
    assert(p.linesIterator.count(_.contains("Window [")) == 1,
      s"expected exactly 1 Window operator:\n${p.take(3000)}")
    assert(p.linesIterator.count(_.contains("Sort [")) == 1,
      s"expected exactly 1 sort:\n${p.take(3000)}")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"expected exactly 1 exchange (by shard):\n${p.take(3000)}")
    // NO global ordering: no SinglePartition exchange anywhere
    assert(!p.contains("Exchange SinglePartition"), p.take(3000))
  }

  test("nb classify: the argmax is a WindowGroupLimit (partial top-1 before the shuffle)") {
    val p = plan("q_nb_classify")
    assert(p.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit pushdown for the rk=1 filter:\n${p.take(3000)}")
    // model join stays a broadcast at fixture scale; the token-keyed
    // shuffle join it becomes at 100 TB is Catalyst's size-based call
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("KMV sketch: bottom-k caps PARTIALLY before the exchange; estimator folds to a constant") {
    // the mergeable-sketch promise: each task ships at most k hashes per
    // group (WindowGroupLimit Partial below the flag exchange), and the
    // (k-1)*2^60 decimal numerator constant-folds at planning time
    val p = plan("q_kmv_distinct")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"expected a Partial WindowGroupLimit stage:\n${p.take(3000)}")
    assert(p.contains("293994983674745978880"),
      s"estimator numerator must constant-fold:\n${p.take(3000)}")
    // the 3-row exact anchor broadcasts back
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("skew join derives its salt factor from the key-skew profiler, computed ONCE") {
    // r14 verdict task: the salt must come from the q_key_skew planner
    // (a broadcast one-row stats table), not a hand-pinned literal — and
    // exchange reuse must keep the profiler to a single pass even though
    // both join sides consume it
    val p = finalPlan("q_skew_join")
    assert(p.contains("_saltf"), "salt factor not data-driven:\n" + p.take(3000))
    assert(p.contains("pmod(hash("), p.take(3000))
    assert(!p.contains("top_salt#76L), 8)") && !"pmod\\(hash\\([^)]*\\), 8\\)".r.findAllIn(p).hasNext,
      "hand-pinned salt literal found:\n" + p.take(3000))
    assert(p.linesIterator.count(_.contains("partial_max(top_salt")) == 1,
      "profiler aggregation must execute once (exchange reuse):\n" + p.take(4000))
    assert(p.contains("ReusedExchange"), p.take(4000))
  }

  test("wordpiece encode: the word->pieces lookup is a BROADCAST join") {
    // the corpus-side cost contract: the second (and last) corpus scan
    // pays one broadcast lookup + a doc-keyed reassembly — no
    // corpus-sized shuffle join against the vocab
    val p = plan("q_wordpiece")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }
}
