package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class QueriesIncrementalSpec extends SparkSuite {

  test("incr_mv: delta fold equals last-version-per-key recompute") {
    val s = spark
    val folded = QueriesIncremental.incrMv(s, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    // the expensive path the fold replaces: last row image per key, then agg
    val ops = graft.core.Tables.events(s, sf0001)
      .filter(col("event_type").isin("signup", "click", "error"))
      .select((col("event_id") % 997).cast("long").as("rid"),
        unix_millis(col("ts")).as("tms"), col("event_id"),
        when(col("event_type") === "error", lit(0L))
          .otherwise(round(col("value") * 100).cast("long")).as("cur"),
        when(col("event_type") === "error", lit(0L)).otherwise(lit(1L)).as("live"))
    val w = Window.partitionBy(col("rid")).orderBy(col("tms").desc, col("event_id").desc)
    val recomputed = ops.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy((col("rid") % 10).cast("long").as("mv_group"))
      .agg(sum(col("live")).as("n_live"), sum(col("cur")).as("sum_cents"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    assert(folded == recomputed)
    assert(folded.nonEmpty)
  }

  test("weighted_sample: priorities are the exact replica-max draw, top-20 sorted") {
    val rows = QueriesIncremental.weightedSample(spark, sf0001).collect()
    assert(rows.length == 20)
    val prios = rows.map(_.getLong(2))
    assert(prios.sameElements(prios.sortBy(-_)), "descending by priority")
    rows.foreach { r =>
      val (id, w, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(w >= 1 && w <= 8)
      val expect = (1L to w).map { rep =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$id:$rep".getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(md5.take(15), 16)
      }.max
      assert(p == expect, s"doc $id replica-max mismatch")
    }
  }

  test("incr_mv fold: seeded-fuzz changelogs all telescope to the brute final state") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 5) {
      // random op stream: keys collide heavily, ts ties exercised via
      // coarse tms (event_id breaks them), deletes may precede inserts
      val n = 200 + rnd.nextInt(200)
      val ops = (1 to n).map { i =>
        val rid = rnd.nextInt(13).toLong
        val tms = rnd.nextInt(5).toLong // heavy ts collisions on purpose
        val del = rnd.nextInt(4) == 0
        val cents = if (del) 0L else rnd.nextInt(1000).toLong
        (rid, tms, i.toLong, cents, if (del) 0L else 1L)
      }
      val df = ops.toDF("rid", "tms", "event_id", "cur", "live")
      val folded = QueriesIncremental.foldDeltas(df)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // brute reference: last op per rid by (tms, event_id), aggregated in Scala
      val brute = ops.groupBy(_._1).view.mapValues(_.maxBy(o => (o._2, o._3)))
        .values.toSeq.groupBy(_._1 % 10)
        .view.mapValues(v => (v.map(_._5).sum, v.map(_._4).sum)).toMap
      assert(folded == brute, s"fuzz round $round (n=$n)")
    }
  }

  test("anomaly gate: integer inequality agrees with the double z-score off-boundary") {
    val s = spark
    val rows = QueriesIncremental.anomalyEvents(s, sf0001).collect()
    assert(rows.nonEmpty, "fixture tail must produce anomalies")
    // brute double-precision reference (boundary-safe: no event sits
    // within 1e-6 sigma of the 3-sigma line on this fixture)
    val ev = graft.core.Tables.events(s, sf0001)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = ev.groupBy(_._2).map { case (t, es) =>
      val n = es.length.toDouble
      val mean = es.map(_._3).sum / n
      val varPop = es.map(e => (e._3 - mean) * (e._3 - mean)).sum / n
      val anom = es.filter(e => math.abs(e._3 - mean) > 3 * math.sqrt(varPop))
      t -> (anom.length.toLong,
        if (anom.isEmpty) 0L else anom.map(_._1).min,
        if (anom.isEmpty) 0L else anom.map(_._1).max)
    }.filter(_._2._1 > 0)
    val got = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expect)
  }

  test("retention: offset-0 count is the cohort size, offsets non-negative") {
    val rows = QueriesIncremental.retention(spark, sf0001).collect()
    assert(rows.forall(_.getLong(1) >= 0))
    val byCohort = rows.groupBy(_.getLong(0))
    // every user is by definition active in their cohort week
    val users = graft.core.Tables.events(spark, sf0001)
      .select(col("user_id"),
        floor(unix_millis(col("ts")) / lit(604800000L)).cast("long").as("wk"))
      .groupBy(col("user_id")).agg(min(col("wk")).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byCohort.foreach { case (cohort, rs) =>
      val atZero = rs.find(_.getLong(1) == 0L).map(_.getLong(2))
      assert(atZero.contains(users(cohort)), s"cohort $cohort offset-0 size")
    }
  }
}
