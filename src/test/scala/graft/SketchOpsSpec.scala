package graft

import org.apache.spark.sql.functions._

/** Contracts for the r14 sketch/robust-stats additions: the KMV
  * bottom-k distinct estimator (bit-exact parity with an independent
  * driver-side recompute, plus the estimator-error bound), the
  * median/MAD robust outlier gate (parity with a driver brute force),
  * and the streaming CMS heavy hitters (merged per-batch deltas must
  * equal the one-pass batch report row-for-row).
  */
class SketchOpsSpec extends SparkSuite {

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("KMV sketch equals an independent driver-side recompute, both branches") {
    for (dir <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val rows = QueriesExtra.kmvDistinct(spark, dir)
        .collect().map(r => r.getString(0) ->
          (r.getAs[Long]("exact_distinct"), r.getAs[Long]("kmv_est"))).toMap
      val base = graft.core.Tables.lineitem(spark, dir)
        .select(col("l_returnflag"), col("l_partkey")).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val byFlag = base.groupBy(_._1)
      assert(rows.keySet == byFlag.keySet)
      byFlag.foreach { case (flag, rs) =>
        val distinctVals = rs.map(_._2).distinct
        val hashes = distinctVals
          .map(v => java.lang.Long.parseLong(md5Hex(v.toString).take(15), 16))
          .distinct.sorted
        val expected =
          if (hashes.length < 256) hashes.length.toLong
          else (BigInt(255) * BigInt(2).pow(60) / BigInt(hashes.take(256).last)).toLong
        assert(rows(flag)._1 == distinctVals.length.toLong, s"$dir/$flag exact")
        assert(rows(flag)._2 == expected, s"$dir/$flag kmv_est")
      }
      // estimator-error sanity on whichever groups took the sketch branch:
      // SE of KMV at k=256 is ~6.3%; 25% is ~4 sigma
      rows.values.filter(_._1 > 256).foreach { case (exact, est) =>
        assert(math.abs(est - exact) <= exact / 4.0, s"est $est vs exact $exact")
      }
    }
    // the sf0.01 fixture has >256 distinct parts per flag — the sketch
    // branch (not just the exact small-group branch) must have fired
    val big = QueriesExtra.kmvDistinct(spark, "/root/testdata/sf0.01").collect()
    assert(big.forall(_.getAs[Long]("exact_distinct") > 256))
  }

  test("MAD outlier gate equals a driver-side brute force") {
    val got = QueriesExtra.madOutliers(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    val base = graft.core.Tables.events(spark, sf0001)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    base.groupBy(_._1).foreach { case (et, rs) =>
      val cents = rs.map(_._2).sorted
      def rankFloor(vals: Seq[Long], q: Double): Long =
        vals(math.floor((vals.length - 1) * q).toInt)
      val med = rankFloor(cents, 0.5)
      val adev = cents.map(c => math.abs(c - med)).sorted
      val mad = rankFloor(adev, 0.5)
      val outliers = rs.map(_._2).filter(c => math.abs(c - med) > 3 * mad)
      val r = got(et)
      assert(r.getAs[Long]("med_cents") == med, s"$et median")
      assert(r.getAs[Long]("mad_cents") == mad, s"$et mad")
      assert(r.getAs[Long]("n") == cents.length.toLong, s"$et n")
      assert(r.getAs[Long]("n_outliers") == outliers.length.toLong, s"$et n_outliers")
      assert(r.getAs[Long]("outlier_min_cents") ==
        (if (outliers.isEmpty) 0L else outliers.min), s"$et min")
      assert(r.getAs[Long]("outlier_max_cents") ==
        (if (outliers.isEmpty) 0L else outliers.max), s"$et max")
    }
  }

  test("streaming heavy hitters equals the batch report exactly") {
    val batch = QueriesExtra.heavyHitters(spark, sf0001).collect().toSeq
    val stream = QueriesExtra.streamHitters(spark, sf0001).collect().toSeq
    assert(stream == batch)
  }

  test("CMS cells from term counts equal cells from raw term instances") {
    // r19: the heavy-hitters kernel derives the d*w cell grid from the
    // aggregated (term, exact_n) table instead of re-exploding instances
    // — a cell's instance count must be EXACTLY the count-weighted sum
    // of its terms. Gate the identity on the real fixture corpus.
    val terms = graft.core.Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    def image(df: org.apache.spark.sql.DataFrame): Seq[(Int, Long, Long)] =
      df.collect().map(r => (r.getAs[Int]("seed"), r.getAs[Long]("bucket"),
        r.getAs[Long]("c"))).toSeq.sorted
    val fromInstances = image(QueriesExtra.cmsCells(terms))
    val fromCounts = image(QueriesExtra.cmsCellsFromCounts(
      terms.groupBy(col("term")).agg(count(lit(1)).as("exact_n"))))
    assert(fromCounts == fromInstances)
  }
}
