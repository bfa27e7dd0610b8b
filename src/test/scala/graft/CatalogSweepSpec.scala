package graft

/** Catalog-wide anti-pattern sweep: EVERY query's physical plan is
  * checked for the two classes of defect that value-level oracles
  * cannot see — cartesian products (a non-broadcast cross join would
  * be O(n²) shuffle at scale) and Scala/Python UDFs (opaque to
  * codegen; the catalog's contract is zero). Streaming and
  * fixture-side-effect queries execute during construction, so the
  * sweep plans them too — their final (batch) plan is what lands here.
  */
class CatalogSweepSpec extends SparkSuite {

  // Builders that replay streams / write fixtures are slow (seconds
  // each) but still planable; only genuinely interactive ones would be
  // excluded, and there are none.
  private val slow = Set(
    "q_changelog_native", "q_changelog_expand", "q_binlog_binary",
    "q_kafka_roundtrip", "q_stream_window", "q_stream_dedup",
    "q_stream_session", "q_stream_join", "q_stream_enrich",
    "q_stream_retract", "q_stream_neardup", "q_crypto_roundtrip",
    "q_pgp_roundtrip", "q_msgpack_framed")

  private def sweep(pick: String => Boolean): Unit = {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => pick(n) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
        val bad = offenses(plan)
        if (bad.isEmpty) Nil else List(s"$name: ${bad.mkString(",")}")
      }
    assert(offenders.isEmpty, "anti-patterns found:\n" + offenders.mkString("\n"))
  }

  test("no cartesian product and no UDF in any catalog query plan") {
    sweep(n => !slow.contains(n))
  }

  // "ScalaUDF" is the plan node of a real sql.functions.udf; the typed
  // Dataset API (q_topk_agg's Aggregator showcase) renders its lambdas
  // through the internal UDFAdaptors class, which is NOT a UDF — match
  // the node name, not the substring "UDF".
  private def offenses(plan: String): Seq[String] = Seq(
    "CartesianProduct" -> plan.contains("CartesianProduct"),
    "ScalaUDF" -> plan.contains("ScalaUDF"),
    "PythonEval" -> plan.contains("BatchEvalPython"))
    .collect { case (tag, true) => tag }

  test("slow/streaming queries also carry no cartesian product or UDF") {
    sweep(slow.contains)
  }
}
