package graft

import java.time.Instant

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.Topics
import graft.core.Topics.TopicParams
import graft.stream.{Schedule, Watchdog}
import graft.stream.Schedule.SnapshotSchedule

class TopicsSpec extends SparkSuite {
  private val p = TopicParams("svc", "cl1", "db1", "t1", version = 2)

  test("changelog and snapshot topic naming") {
    assert(Topics.changelogTopic(p) == "hp.svc.db1.t1.v2")
    assert(Topics.snapshotTopic(p) == "hp.svc.db1.t1.v2")
    val at = Instant.parse("2024-01-15T00:00:00Z")
    assert(Topics.snapshotTopic(p.copy(snapshottedAt = Some(at))) ==
      "hp.svc.db1.t1.v2.20240115000000")
  }

  test("custom template rendering") {
    assert(Topics.render("{{.Cluster}}/{{.Db}}.{{.Table}}-v{{.Version}}", p) ==
      "cl1/db1.t1-v2")
  }
}

class ScheduleSpec extends SparkSuite {
  test("interval-aligned snapshot due times") {
    val s = SnapshotSchedule(intervalMs = 1000)
    // snapshotted at 1500 -> next boundary is 2000
    assert(!Schedule.timeForSnapshot(s, snapshottedAtMs = 1500, nowMs = 1999))
    assert(Schedule.timeForSnapshot(s, snapshottedAtMs = 1500, nowMs = 2000))
    // alignment: two evaluators agree regardless of their own clocks
    assert(Schedule.alignedDue(1000, 1500) == 2000)
    assert(Schedule.alignedDue(1000, 1999) == 2000)
    // need_snapshot forces
    assert(Schedule.timeForSnapshot(s.copy(needSnapshot = true), 1500, 0))
    // interval 0 = never
    assert(!Schedule.timeForSnapshot(SnapshotSchedule(0), 0, Long.MaxValue))
  }
}

class WatchdogSpec extends SparkSuite {
  import spark.implicits._

  test("watchdog tracks progress and flags stalls") {
    val wd = new Watchdog(stallAfterMs = 50)
    spark.streams.addListener(wd)
    try {
      implicit val sqlCtx = spark.sqlContext
      val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
      stream.addData(1L, 2L)
      val q = stream.toDS().toDF("v")
        .writeStream.format("memory").queryName("wd_out")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // progress events may land slightly after termination; poll briefly
      val t0 = System.currentTimeMillis()
      var seen = false
      while (!seen && System.currentTimeMillis() - t0 < 5000) {
        seen = wd.stalled(System.currentTimeMillis() + 60_000).isEmpty
        Thread.sleep(20)
      }
      // terminated queries are evicted -> nothing tracked, nothing stalled
      assert(wd.stalled(System.currentTimeMillis() + 60_000).isEmpty)
    } finally spark.streams.removeListener(wd)
  }
}

class ClusterLimiterSpec extends SparkSuite {
  import graft.stream.ClusterLimiter

  test("caps concurrent tasks per cluster, clusters independent") {
    import java.util.concurrent.atomic.AtomicInteger
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global

    val limiter = new ClusterLimiter(2)
    val maxSeen = new AtomicInteger()
    val cl2Ran = new AtomicInteger()
    val tasks = (1 to 6).map { _ =>
      Future {
        limiter.withSlot(spark, "cl1") {
          val now = limiter.running("cl1")
          maxSeen.updateAndGet(m => math.max(m, now))
          // while cl1 is saturated, cl2 still gets a slot immediately
          limiter.withSlot(spark, "cl2") { cl2Ran.incrementAndGet() }
          Thread.sleep(50)
          spark.range(10).count() // a real job inside the slot
        }
      }
    }
    Await.result(Future.sequence(tasks), 60.seconds)
    assert(maxSeen.get() <= 2, s"cap breached: ${maxSeen.get()}")
    assert(maxSeen.get() == 2) // parallelism actually happened
    assert(cl2Ran.get() == 6)
    assert(limiter.running("cl1") == 0 && limiter.running("cl2") == 0)
  }

  test("scheduler pool property set inside the slot, restored after") {
    val limiter = new ClusterLimiter(1)
    val sc = spark.sparkContext
    sc.setLocalProperty("spark.scheduler.pool", "outer")
    limiter.withSlot(spark, "clX") {
      assert(sc.getLocalProperty("spark.scheduler.pool") == "cluster-clX")
    }
    assert(sc.getLocalProperty("spark.scheduler.pool") == "outer")
    sc.setLocalProperty("spark.scheduler.pool", null)
  }
}
