package graft.tools

import org.apache.spark.sql.functions._

/** Gate-bypassed decontamination mass probe (r17 verdict task 3).
  *
  * The r17 curation_e2e sf100 run proved the Gopher GATE at scale but fed
  * the downstream decontamination only ~5.6k surviving docs — the
  * ~250M-gram train-side path (what a gate-last pipeline, or a corpus that
  * mostly PASSES quality gates, would push through it) had never run at
  * third-decade mass. This probe runs q_bloom_prune's full shape over the
  * UNGATED documents table and records the autopsy BASELINE.md needs:
  *
  *   - train/eval gram mass (the ~250M-row explode, the eval distinct set)
  *   - the broadcast-side weight model (bytes of gram payload that a
  *     broadcast-hash verify must ship) vs the sketch bytes that replace
  *     it on the prune side — the numbers behind the ~8 GB handoff claim
  *   - bloom survivor count (what fraction of the corpus stream the
  *     sketch admits to the exact verify)
  *   - end-to-end time on BOTH verify paths at the same mass — the
  *     default broadcast verify, then the SHUFFLE_HASH verify forced via
  *     -Dgraft.decontaminate.broadcastMaxGrams=1 — with a hash-equality
  *     check proving the switch picks a plan, never semantics.
  *
  * Usage: runMain graft.tools.DecontScaleProbe [fixtureDir]
  */
object DecontScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf100"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-decont-probe")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val i = kv.indexOf('=')
      if (i > 0) builder.config(kv.take(i).trim, kv.drop(i + 1).trim)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val times = scala.collection.mutable.LinkedHashMap[String, Double]()
    def t[T](tag: String)(b: => T): T = {
      val t0 = System.nanoTime(); val r = b
      val s = (System.nanoTime() - t0) / 1e9
      times(tag) = s; println(f"PROF $tag: $s%.2f s"); r
    }
    spark.range(10).count()

    val d = graft.core.Tables.documents(spark, dir)
    val nDocs = t("docs") { d.count() }
    // same gram derivation as bloomPrune / decontaminate (3-token grams,
    // per-doc dedup before the explode)
    val grams = d
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        explode(array_distinct(graft.QueriesTraining.wordNgrams(col("ws"), 3))).as("gram"))
    val trainGramRows = t("train_gram_rows") {
      grams.filter(col("doc_id") % 17 =!= 0).count()
    }
    val evalGrams = grams.filter(col("doc_id") % 17 === 0)
      .select(col("gram")).distinct()
    val (evalCount, evalPayloadBytes) = t("eval_grams") {
      val r = evalGrams.agg(count(lit(1)), sum(length(col("gram")))).head()
      (r.getLong(0), r.getLong(1))
    }
    // broadcast-weight model: Spark's LongHashedRelation/UnsafeHashedRelation
    // carries ~48-64 bytes/row of structure on top of the string payload;
    // 56 is the midpoint the BASELINE.md boundary arithmetic uses
    val bcastModelBytes = evalPayloadBytes + 56L * evalCount
    val numBits = math.max(1L << 20, evalCount * 10)
    println(s"MODEL eval_grams=$evalCount payload=${evalPayloadBytes / (1 << 20)}MB " +
      s"broadcast_model=${bcastModelBytes / (1 << 20)}MB sketch=${numBits / 8 / (1 << 20)}MB")

    // survivors of the sketch pre-prune: rebuild the same sketch the
    // engine builds (same sizing rule) and count what it admits
    val survivors = t("bloom_survivors") {
      import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      val items = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
      val bits = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
      val (prevI, prevB) = (spark.conf.get(items), spark.conf.get(bits))
      spark.conf.set(items, math.max(prevI.toLong, evalCount).toString)
      spark.conf.set(bits, math.max(prevB.toLong, numBits).toString)
      val reg = spark.sessionState.functionRegistry
      reg.createOrReplaceTempFunction("graft_probe_bloom_agg",
        exprs => new BloomFilterAggregate(exprs.head, Literal(evalCount), Literal(numBits)), "built-in")
      reg.createOrReplaceTempFunction("graft_probe_might_contain",
        exprs => BloomFilterMightContain(exprs.head, exprs(1)), "built-in")
      val sketch =
        try evalGrams.agg(call_function("graft_probe_bloom_agg", xxhash64(col("gram"))))
          .head.getAs[Array[Byte]](0)
        finally { spark.conf.set(items, prevI); spark.conf.set(bits, prevB) }
      grams.filter(col("doc_id") % 17 =!= 0)
        .filter(call_function("graft_probe_might_contain", lit(sketch), xxhash64(col("gram"))))
        .count()
    }
    println(f"MODEL survivors=$survivors (${100.0 * survivors / math.max(1L, trainGramRows)}%.2f%% of train grams reach the exact verify)")

    def runPath(tag: String): (Long, Long) = t(tag) {
      // bit_xor, not sum: a sum of 64-bit hashes overflows LongType under
      // ANSI; xor is overflow-free and order-independent
      val r = graft.QueriesLayout.bloomPrune(spark, dir)
        .agg(count(lit(1)),
          coalesce(expr("bit_xor(xxhash64(doc_id, n_hit_grams))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    val (rowsB, hashB) = runPath("e2e_broadcast_verify")
    sys.props("graft.decontaminate.broadcastMaxGrams") = "1"
    val (rowsS, hashS) = try runPath("e2e_shuffle_verify")
    finally sys.props.remove("graft.decontaminate.broadcastMaxGrams")
    val parity = rowsB == rowsS && hashB == hashS
    println(s"PARITY broadcast=($rowsB,$hashB) shuffle=($rowsS,$hashS) equal=$parity")

    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    println(s"""LADDER {"dir":"$dir","docs":$nDocs,"train_gram_rows":$trainGramRows,""" +
      s""""eval_grams":$evalCount,"broadcast_model_mb":${bcastModelBytes / (1 << 20)},""" +
      s""""sketch_mb":${numBits / 8 / (1 << 20)},"survivors":$survivors,""" +
      times.map { case (k, v) => s""""${k}_s":${f(v)}""" }.mkString(",") +
      s""","parity":$parity}""")
    spark.stop()
    if (!parity) sys.exit(1)
  }
}
