package graft

import org.apache.spark.sql.functions._

import graft.analytics.Dedup
import graft.core.DriverBudget

/** The memory-aware gate on the hybrid driver paths (CC union-find,
  * PageRank fixed-point): the decision must be BYTES-based, not just
  * edge-count-based, so a wide-key graph below the count cap cannot
  * collect past driver memory — and when the gate refuses, the
  * distributed fallback must produce the identical labels.
  */
class DriverBudgetSpec extends SparkSuite {
  import spark.implicits._

  private def wideKey(i: Int): String = f"doc-$i%05d-" + ("x" * 200)

  test("estimate: wide string keys dominate boxed longs per edge") {
    val longs = Seq.tabulate(100)(i => (i.toLong, (i + 1).toLong))
      .toDF("src", "dst")
    val strs = Seq.tabulate(100)(i => (wideKey(i), wideKey(i + 1)))
      .toDF("src", "dst")
    val bLong = DriverBudget.estimateEdgeBytes(longs, 100)
    val bStr = DriverBudget.estimateEdgeBytes(strs, 100)
    assert(bLong > 0)
    // 210-char UTF-16 key ≈ 468 B boxed vs 24 B for a Long; with the
    // shared per-row overhead the edge ratio lands near 9×
    assert(bStr > 8 * bLong,
      s"wide keys must dominate the estimate: str=$bStr long=$bLong")
  }

  test("gate: same edge count fits with longs, refuses with wide keys under a tight budget") {
    // shrink the budget instead of exhausting real heap: the fraction is
    // the production knob, so exercising it IS the production code path
    val n = 5000L
    val longs = Seq.tabulate(n.toInt)(i => (i.toLong, (i + 1).toLong))
      .toDF("src", "dst")
    val strs = Seq.tabulate(n.toInt)(i => (wideKey(i), wideKey(i + 1)))
      .toDF("src", "dst")
    val free = DriverBudget.freeHeapBytes
    val strNeed = DriverBudget.estimateEdgeBytes(strs, n)
    val longNeed = DriverBudget.estimateEdgeBytes(longs, n)
    // pick a fraction between the two estimates: longs fit, strings don't
    val frac = ((strNeed + longNeed) / 2.0) / free
    sys.props("graft.driverCap.heapFraction") = frac.toString
    try {
      assert(DriverBudget.fitsDriver(longs, n), "long keys should fit")
      assert(!DriverBudget.fitsDriver(strs, n), "wide keys should NOT fit")
    } finally sys.props.remove("graft.driverCap.heapFraction")
  }

  test("CC falls back to the distributed loop on a wide-key graph below the count cap, labels identical") {
    // 60 edges over wide string keys: three chains of 20 — far below the
    // 1M count cap, but the bytes gate (tight budget) must refuse
    val pairs = (0 until 3).flatMap { c =>
      (0 until 20).map(i => (wideKey(c * 100 + i), wideKey(c * 100 + i + 1)))
    }.toDF("doc_a", "doc_b")

    Dedup.lastPathDriver = false
    val viaDriver = Dedup.connectedComponents(pairs, maxIter = 40)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(Dedup.lastPathDriver, "default budget: driver path expected")

    sys.props("graft.driverCap.heapFraction") = "1e-12"
    try {
      val viaDistributed = Dedup.connectedComponents(pairs, maxIter = 40)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(!Dedup.lastPathDriver, "tight budget: distributed path expected")
      assert(viaDistributed == viaDriver, "paths must agree bit-identically")
      assert(viaDriver.values.toSet.size == 3, "three chains → three components")
    } finally sys.props.remove("graft.driverCap.heapFraction")
  }

  test("pagerank: tight budget forces the distributed rounds, ranks identical") {
    val want = SparkEntry.queries("q_pagerank")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sys.props("graft.driverCap.heapFraction") = "1e-12"
    try {
      val got = SparkEntry.queries("q_pagerank")(spark, sf0001)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, "distributed rounds must match the driver loop")
    } finally sys.props.remove("graft.driverCap.heapFraction")
  }
}
