package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.state.Lease

/** Multi-worker task leases against a live Derby database — the
  * reference's GetTableTask / RefreshTableLock contract
  * (state/lock.go:31-169): first-available claim, no double-claims under
  * contention, heartbeat by holder only, expiry steal, release.
  */
class LeaseSpec extends AnyFunSuite {

  private val url = "jdbc:derby:memory:graftlease;create=true"

  test("claim, contention, heartbeat, expiry steal, release") {
    Lease.ensureTable(url)
    Seq("t1", "t2").foreach(Lease.register(url, _))
    Lease.register(url, "t1") // idempotent

    // two workers claim: each gets a DIFFERENT task
    val a = Lease.acquire(url, "w1", timeoutSec = 60)
    val b = Lease.acquire(url, "w2", timeoutSec = 60)
    assert(a.contains("t1") && b.contains("t2"))
    // everything held: a third worker gets nothing
    assert(Lease.acquire(url, "w3", timeoutSec = 60).isEmpty)

    // heartbeat: holder true, non-holder false (the abandon signal)
    assert(Lease.refresh(url, "t1", "w1"))
    assert(!Lease.refresh(url, "t1", "w2"))

    // expiry steal: with timeout 0 every lease is expired, so w3 takes t1
    val stolen = Lease.acquire(url, "w3", timeoutSec = 0)
    assert(stolen.contains("t1"))
    assert(Lease.holder(url, "t1").map(_._1).contains("w3"))
    // the previous holder's heartbeat now fails -> it must abandon
    assert(!Lease.refresh(url, "t1", "w1"))

    // release frees the task for a normal (non-expired) claim
    Lease.release(url, "t2", "w2")
    assert(Lease.acquire(url, "w4", timeoutSec = 60).contains("t2"))
  }

  test("ticket-sharded shared lock: at most n concurrent holders") {
    val surl = "jdbc:derby:memory:graftlease3;create=true"
    Lease.ensureTable(surl)
    // lock.go TryLockShared semantics: n=2 tickets, third holder refused
    val t1 = Lease.tryLockShared(surl, "snapshots", 2, "wa", 60)
    val t2 = Lease.tryLockShared(surl, "snapshots", 2, "wb", 60)
    assert(t1.isDefined && t2.isDefined && t1 != t2)
    assert(Lease.tryLockShared(surl, "snapshots", 2, "wc", 60).isEmpty)
    // releasing one ticket readmits exactly one holder
    Lease.release(surl, t1.get, "wa")
    assert(Lease.tryLockShared(surl, "snapshots", 2, "wc", 60).isDefined)
  }

  test("no double-claims under concurrent contention") {
    val curl = "jdbc:derby:memory:graftlease2;create=true"
    Lease.ensureTable(curl)
    (1 to 8).foreach(i => Lease.register(curl, f"task$i%02d"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val claims = (1 to 16).map { w =>
        pool.submit(new java.util.concurrent.Callable[Option[String]] {
          override def call(): Option[String] = Lease.acquire(curl, s"w$w", 60)
        })
      }.map(_.get())
      val won = claims.flatten
      assert(won.size == 8, s"all 8 tasks claimed once, got $won")
      assert(won.distinct.size == won.size, s"double-claim detected: $won")
    } finally pool.shutdown()
  }
}
