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
