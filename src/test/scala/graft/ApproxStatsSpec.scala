package graft

import org.apache.spark.sql.functions._

/** Error-bound contract for the sketch-based 100 TB path (q_approx_stats):
  * the exact twins (q_percentiles, exact COUNT DISTINCT) are the sf0.01
  * oracle anchors, and these assertions pin the sketches to them within
  * their published bounds — `approx_percentile(col, p, accuracy)`
  * guarantees rank error <= n/accuracy; HLL++ relative error at default
  * rsd is 5% (we assert a conservative 10%).
  */
class ApproxStatsSpec extends SparkSuite {

  private lazy val li = graft.core.Tables.lineitem(spark, sf0001)

  test("approx_percentile within rank-error bound of the exact percentile") {
    val accuracy = 1000
    val cents = li.select(col("l_returnflag"),
      round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val rows = cents.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        expr(s"approx_percentile(cents, array(0.5, 0.95), $accuracy)").as("approx"),
        expr("percentile(cents, array(0.5, 0.95))").as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val approx = r.getSeq[Long](r.fieldIndex("approx"))
      val exact = r.getSeq[Double](r.fieldIndex("exact"))
      // rank error <= n/accuracy ==> the approx value must fall between
      // the exact (p - eps) and (p + eps) quantiles
      val eps = 1.0 / accuracy
      Seq(0.5, 0.95).zipWithIndex.foreach { case (p, i) =>
        val sorted = cents.filter(col("l_returnflag") === r.getString(0))
          .select("cents").orderBy("cents").collect().map(_.getLong(0))
        val lo = sorted(math.max(0, (math.floor((p - eps) * n).toInt - 1).min(sorted.length - 1)))
        val hi = sorted(math.min(sorted.length - 1, math.ceil((p + eps) * n).toInt))
        assert(approx(i) >= lo && approx(i) <= hi,
          s"flag=${r.getString(0)} p=$p approx=${approx(i)} outside [$lo, $hi] (exact=${exact(i)})")
      }
    }
  }

  test("quantile bins are equi-depth: each bin holds n/4 rows within tie slack") {
    val rows = SparkEntry.queries("q_quantile_bins")(spark, sf0001).collect()
    val byFlag = rows.groupBy(_.getString(0))
    byFlag.foreach { case (flag, bins) =>
      assert(bins.map(_.getAs[Long]("bin")).sorted.toSeq == Seq(0L, 1L, 2L, 3L),
        s"flag=$flag must fill all four bins")
      val n = bins.map(_.getAs[Long]("n")).sum
      bins.foreach { b =>
        // cents ties at sf0.001 are rare; a bin can deviate from n/4 only
        // by the tie mass at its boundary value
        assert(math.abs(b.getAs[Long]("n") - n / 4.0) <= n * 0.05,
          s"flag=$flag bin=${b.getAs[Long]("bin")} n=${b.getAs[Long]("n")} of $n not equi-depth")
      }
      // bins tile the domain: max of bin k < min of bin k+1
      val sorted = bins.sortBy(_.getAs[Long]("bin"))
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a.getAs[Long]("max_cents") < b.getAs[Long]("min_cents"),
          s"flag=$flag bins ${a.getAs[Long]("bin")}/${b.getAs[Long]("bin")} overlap")
      }
    }
  }

  test("containment bounds: inter <= min(n_a, n_b), containment in (0, 1]") {
    val rows = SparkEntry.queries("q_containment")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (inter, na, nb) = (r.getAs[Long]("inter"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(inter >= 1 && inter <= math.min(na, nb), r.toString)
      val ca = r.getAs[Double]("cont_a_in_b"); val cb = r.getAs[Double]("cont_b_in_a")
      assert(ca == inter.toDouble / na && cb == inter.toDouble / nb, r.toString)
      // containment dominates Jaccard: J = inter/uni <= inter/max(n) <= cont
      assert(math.max(ca, cb) >= inter.toDouble / (na + nb - inter), r.toString)
    }
  }

  test("approx_count_distinct within 10% of exact distinct count") {
    val rows = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey")).as("approx"),
        countDistinct(col("l_orderkey")).as("exact"))
      .collect()
    rows.foreach { r =>
      val a = r.getAs[Long]("approx").toDouble
      val e = r.getAs[Long]("exact").toDouble
      assert(math.abs(a - e) / e <= 0.10, s"flag=${r.getString(0)} approx=$a exact=$e")
    }
  }
}
